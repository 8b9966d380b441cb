from icafusion_tpu.eval.metrics import ap_per_class, compute_ap, fitness
from icafusion_tpu.eval.evaluator import Evaluator

__all__ = ["ap_per_class", "compute_ap", "fitness", "Evaluator"]
