from icafusion_tpu.models.assembler import ICAFusionModel, build_model, resolve_model
from icafusion_tpu.models.detect import Detect

__all__ = ["ICAFusionModel", "build_model", "resolve_model", "Detect"]
