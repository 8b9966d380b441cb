"""ICAFusion-TPU: a TPU-native (JAX/XLA/Pallas) multispectral object-detection framework.

A from-scratch rebuild of the capabilities of chanchanchan97/ICAFusion (a two-stream
RGB+thermal YOLOv5 fork with iterative dual cross-attention fusion), redesigned for TPU:

- NHWC layouts, bf16 compute on the MXU, static shapes end to end.
- Model graphs assembled from the reference's YAML DSL via an explicit module
  registry (no ``eval``), traced once and jitted.
- Box decode + batched NMS run fully on device with fixed shapes.
- Data parallelism via ``jax.sharding.Mesh`` + XLA collectives (no NCCL/DDP).
- Pallas kernels for the fusion cross-attention hot path.

Reference behavior citations in docstrings point into ``/root/reference`` (read-only
upstream snapshot) as ``file:line``.
"""

__version__ = "0.1.0"

from icafusion_tpu.config import load_model_config, load_data_config, load_hyp_config

__all__ = [
    "load_model_config",
    "load_data_config",
    "load_hyp_config",
    "__version__",
]
