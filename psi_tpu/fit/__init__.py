from psi_tpu.fit.fitting import (
    FittingOP,
    fit_bodies,
    make_fit_step,
    make_fit_step_carry_opt_state,
)

__all__ = ["FittingOP", "make_fit_step", "fit_bodies", "make_fit_step_carry_opt_state"]
