from icafusion_tpu.nn import backbones, fusion, layers

__all__ = ["layers", "fusion", "backbones"]
