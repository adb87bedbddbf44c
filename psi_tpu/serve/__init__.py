from psi_tpu.serve.engine import GenerationEngine

__all__ = ["GenerationEngine"]
