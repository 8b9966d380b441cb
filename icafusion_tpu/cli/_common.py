"""Shared CLI plumbing: config resolution, compile cache, model loading."""

from __future__ import annotations

import os
from pathlib import Path

import jax


def setup_jax():
    repo = Path(__file__).resolve().parents[2]
    jax.config.update("jax_compilation_cache_dir", str(repo / ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)
    if os.environ.get("JAX_PLATFORMS"):
        # the axon TPU plugin ignores the env var; honor it explicitly
        try:
            jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])
        except Exception:
            pass


def resolve_model_config(cfg: str, nc=None):
    """A YAML path, or a zoo spec 'zoo:<fusion>:<scale>' (e.g. zoo:tfb:l),
    'zoo:vgg16:<fusion>', 'zoo:resnet50:<fusion>', 'zoo:tiny[:<fusion>]'.
    Fusions: tfb, nin, add, dmaf."""
    from icafusion_tpu.config import load_model_config
    from icafusion_tpu.models import zoo

    if cfg.startswith("zoo:"):
        parts = cfg.split(":")[1:]
        if parts[0] == "tiny":
            return zoo.tiny_icafusion_config(
                nc=nc or 3, fusion=parts[1] if len(parts) > 1 else "tfb")
        if parts[0] == "vgg16":
            return zoo.vgg16_icafusion_config(nc=nc or 3, fusion=parts[1] if len(parts) > 1 else "tfb")
        if parts[0] == "resnet50":
            return zoo.resnet50_icafusion_config(nc=nc or 3, fusion=parts[1] if len(parts) > 1 else "tfb")
        fusion = parts[0]
        scale = parts[1] if len(parts) > 1 else "l"
        return zoo.icafusion_config(scale, nc=nc or 3, fusion=fusion)
    return load_model_config(cfg, nc=nc)


def load_model_for_inference(cfg, weights: str, nc=None, dtype=None,
                             merge=0):
    """Build the model and load inference variables (EMA-preferred).

    merge=K stream-merges the first K RGB/IR layer pairs (block-diagonal
    kernels, numerically identical outputs — utils/stream_merge.py) for MXU
    lane recovery on the sub-128-channel stages."""
    import jax.numpy as jnp

    from icafusion_tpu.models import build_model
    from icafusion_tpu.utils.checkpoint import load_inference_variables

    mc = resolve_model_config(cfg, nc=nc)
    model = build_model(mc, dtype=dtype or jnp.float32)
    if not Path(weights).exists() and weights.endswith(".pt"):
        # reference attempt_load() fetches missing release weights first
        # (experimental.py:113-117 via google_utils.attempt_download)
        from icafusion_tpu.utils.downloads import attempt_download
        weights = str(attempt_download(weights))
    if weights.endswith(".pt"):
        import numpy as np

        from icafusion_tpu.utils.torch_convert import (convert_state_dict,
                                                       load_torch_checkpoint)
        rng = jax.random.PRNGKey(0)
        s = mc_min_size(mc)
        x = jnp.zeros((1, s, s, 3), jnp.float32)
        variables = jax.jit(model.init, static_argnames=("train", "decode"))(
            {"params": rng}, x, x, train=False, decode=False)
        variables, _ = convert_state_dict(load_torch_checkpoint(weights),
                                          dict(variables), strict=False)
    else:
        variables = load_inference_variables(weights)
    from icafusion_tpu.utils.stream_merge import resolve_merge
    merge = resolve_merge(merge, mc)
    if merge:
        from icafusion_tpu.utils.stream_merge import merge_stream_variables
        # the merged tree is HOST numpy; make it device-resident once or every
        # jitted batch re-uploads the full weight set over the interconnect
        variables = jax.device_put(
            merge_stream_variables(mc, dict(variables), pairs=merge))
        model = build_model(mc, dtype=dtype or jnp.float32, merge_pairs=merge)
    return mc, model, variables


def mc_min_size(mc) -> int:
    """Smallest input size compatible with the config's fusion anchor grids:
    TFB rows appear in P3/P4/P5 order (strides 8/16/32); each needs its level's
    grid >= its anchor grid."""
    grids = [int(l.args[1]) if len(l.args) > 1 else 16
             for l in mc.layers if l.module == "TransformerFusionBlock"]
    if not grids:
        return 64
    strides = (8, 16, 32, 64, 128)
    need = max(g * s for g, s in zip(grids, strides))
    return ((need + 31) // 32) * 32
