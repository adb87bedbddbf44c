from psi_tpu.fit.fitting import FittingOP, make_fit_step, fit_bodies

__all__ = ["FittingOP", "make_fit_step", "fit_bodies"]
