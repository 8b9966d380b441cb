from icafusion_tpu.kernels.cross_attention import dual_cross_attention

__all__ = ["dual_cross_attention"]
