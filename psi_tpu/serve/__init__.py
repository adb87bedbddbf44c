from psi_tpu.serve.engine import GenerationEngine, ServeResult, ServingQueue

__all__ = ["GenerationEngine", "ServeResult", "ServingQueue"]
