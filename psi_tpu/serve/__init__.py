from psi_tpu.serve.engine import GenerationEngine, ServeResult, ServingQueue, ServingRouter

__all__ = ["GenerationEngine", "ServeResult", "ServingQueue", "ServingRouter"]
