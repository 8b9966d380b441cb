from icafusion_tpu.utils.general import make_divisible, check_img_size, one_cycle, colorstr

__all__ = ["make_divisible", "check_img_size", "one_cycle", "colorstr"]
