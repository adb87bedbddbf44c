from psi_tpu.gen.sample import TestOP, generate_bodies

__all__ = ["TestOP", "generate_bodies"]
