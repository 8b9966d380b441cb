from icafusion_tpu.data.datasets import PairedDetectionDataset
from icafusion_tpu.data.loader import PairedLoader

__all__ = ["PairedDetectionDataset", "PairedLoader"]
