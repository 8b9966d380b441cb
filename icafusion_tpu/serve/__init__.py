from icafusion_tpu.serve.batcher import MicroBatcher
from icafusion_tpu.serve.engine import ServingEngine

__all__ = ["ServingEngine", "MicroBatcher"]
