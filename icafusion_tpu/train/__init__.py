from icafusion_tpu.train.loss import YoloLoss

__all__ = ["YoloLoss"]
