from psi_tpu.losses.terms import (
    l1_loss,
    kl_normal_loss,
    vposer_reg_loss,
    contact_robust_loss,
    collision_loss,
)

__all__ = [
    "l1_loss",
    "kl_normal_loss",
    "vposer_reg_loss",
    "contact_robust_loss",
    "collision_loss",
]
