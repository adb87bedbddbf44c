"""Quantify the reference's Adam-state-carryover fitting quirk.

The reference shares one Adam optimizer across the per-scene body loop,
resetting only the parameter value per body (fitting_proxe.py:73-74,175)
so moments/step-count leak from body k-1 into body k. Our default fits
every body with fresh state (order-independent, parallel). The
carryover mode (make_fit_step_carry_opt_state) replicates the quirk
exactly; this test measures the final-parameter delta between the two
on the synthetic protocol. The measured numbers are recorded in
PARITY.md.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from psi_tpu.data.synthetic import make_synthetic_assets
from psi_tpu.fit import make_fit_step, make_fit_step_carry_opt_state
from psi_tpu.utils.config import FitConfig


@pytest.fixture(scope="module")
def setup():
    assets, _ = make_synthetic_assets(
        num_verts=256, num_joints=12, num_scenes=2, sdf_dim=16, scene_points=512, n_contact=64
    )
    rng = np.random.default_rng(11)
    n = 8
    x72 = (rng.normal(size=(n, 72)) * 0.3).astype(np.float32)
    x72[:, 2] += 3.0
    cam_ext = np.tile(np.eye(4, dtype=np.float32), (n, 1, 1))
    scene_idx = np.zeros(n, np.int32)
    return assets, jnp.asarray(x72), jnp.asarray(cam_ext), jnp.asarray(scene_idx)


def test_carryover_first_body_identical(setup):
    """Body 0 sees zero-initialized moments in BOTH modes, so its fitted
    parameters must agree (same math, same order).

    The two modes run the same math in different batch layouts, so f32
    rounding differs in the last bits; Adam's g/sqrt(v) normalization
    amplifies near-zero-gradient rounding into +-lr tie-flips over many
    steps (measured: 1 iter agrees to 3e-8; 10 iters drift to ~5e-2 max
    on a handful of coordinates, environment-dependent). Assert the
    clean invariant where it is numerically meaningful — one step,
    before amplification — and bounded Adam drift at 10 steps, the same
    bound the multichip equivalence checks use (__graft_entry__.py)."""
    assets, x72, cam_ext, scene_idx = setup

    cfg1 = FitConfig(num_iter=1)
    x_fresh1, _, _ = make_fit_step(assets, cfg1)(x72, cam_ext, scene_idx)
    x_carry1, _ = make_fit_step_carry_opt_state(assets, cfg1)(x72, cam_ext, scene_idx)
    np.testing.assert_allclose(
        np.asarray(x_carry1)[0], np.asarray(x_fresh1)[0], atol=1e-6, rtol=1e-6
    )

    cfg = FitConfig(num_iter=10)
    x_fresh, m_fresh, _ = make_fit_step(assets, cfg)(x72, cam_ext, scene_idx)
    x_carry, m_carry = make_fit_step_carry_opt_state(assets, cfg)(x72, cam_ext, scene_idx)
    d = np.abs(np.asarray(x_carry)[0] - np.asarray(x_fresh)[0])
    assert d.max() < 2.5 * cfg.init_lr_h, f"body-0 max drift {d.max()}"
    assert d.mean() < 0.05 * cfg.init_lr_h, f"body-0 mean drift {d.mean()}"
    # and the optimized objective itself agrees
    t_fresh = float(np.asarray(m_fresh["total"])[0])
    t_carry = float(np.asarray(m_carry["total"])[0])
    assert abs(t_carry - t_fresh) / max(abs(t_fresh), 1e-9) < 0.02


def test_carryover_delta_measured(setup):
    """Bodies 1+ inherit stale moments in carryover mode; the deviation
    from fresh-state fitting must be finite, small relative to the total
    parameter update, and is printed for PARITY.md."""
    assets, x72, cam_ext, scene_idx = setup
    cfg = FitConfig(num_iter=10)
    x_fresh, m_fresh, _ = make_fit_step(assets, cfg)(x72, cam_ext, scene_idx)
    x_carry, m_carry = make_fit_step_carry_opt_state(assets, cfg)(x72, cam_ext, scene_idx)

    x_fresh = np.asarray(x_fresh)
    x_carry = np.asarray(x_carry)
    assert np.all(np.isfinite(x_carry))

    update_size = np.abs(x_fresh - np.asarray(x72)).mean()
    delta = np.abs(x_carry - x_fresh)
    rel = delta.mean() / max(update_size, 1e-9)
    print(
        f"[carryover] mean|x_carry - x_fresh|={delta.mean():.5f} "
        f"max={delta.max():.5f} mean update size={update_size:.5f} rel={rel:.3f}"
    )
    # Measured (seed 11, 8 bodies, 10 iters): rel ~ 1.4 — the quirk's
    # deviation is of the same order as the optimization update itself,
    # i.e. the reference's results genuinely depend on the order bodies
    # were processed in. That is why the default fits each body with
    # fresh state (order-independent); the bound below only guards
    # against the quirk blowing up, not against it mattering.
    assert rel < 5.0
    # loss quality is equivalent: carryover is not better/worse than fresh
    # by more than 50% on the synthetic protocol
    t_fresh = float(np.asarray(m_fresh["total"]).mean())
    t_carry = float(np.asarray(m_carry["total"]).mean())
    assert abs(t_carry - t_fresh) / max(abs(t_fresh), 1e-9) < 0.5
