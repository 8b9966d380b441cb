from icafusion_tpu.serve.engine import ServingEngine

__all__ = ["ServingEngine"]
