"""Selection-refresh fitting (FitConfig.refresh_every > 1).

The refresh mode amortizes the per-iteration full SDF gather and the
contact candidate ranking: cheap iterations evaluate every vertex
against the frozen trilinear patch of the grid cell it occupied at the
last refresh (no gathers, no scatters) and reuse the carried scene-point
subset. Semantics contract:
* refresh_every=1 IS the production every-iter path.
* At a refresh point (zero displacement since the cache was taken), the
  cheap pass's loss AND gradient equal the full pass's exactly — the
  cached patch is the same trilinear function the full lookup evaluates.
* Between refreshes the SDF error is second-order in the displacement;
  aggressive schedules must still fit (scene losses decrease).
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from psi_tpu.data.synthetic import make_synthetic_assets
from psi_tpu.fit import make_fit_step
from psi_tpu.utils.config import FitConfig


@pytest.fixture(scope="module")
def setup():
    rng = np.random.default_rng(3)
    a, reg = make_synthetic_assets(
        num_verts=128, num_joints=12, num_scenes=3, sdf_dim=16, scene_points=300, n_contact=32
    )
    N = 6
    x72 = (rng.normal(size=(N, 72)) * 0.3).astype(np.float32)
    x72[:, 0:3] = (np.asarray(reg.grid_mins[0]) * 0.8)[None, :] + rng.normal(
        0, 0.1, (N, 3)
    ).astype(np.float32)
    cam_ext = jnp.asarray(np.tile(np.eye(4, dtype=np.float32), (N, 1, 1)))
    scene_idx = jnp.zeros(N, jnp.int32)
    return a, jnp.asarray(x72), cam_ext, scene_idx


def _run(a, x72, cam_ext, scene_idx, cfg):
    xf, metrics, hist = make_fit_step(a, cfg)(x72, cam_ext, scene_idx)
    return np.asarray(xf), {k: np.asarray(v) for k, v in metrics.items()}, np.asarray(hist)


def test_cheap_pass_exact_at_refresh_point(setup):
    """With zero displacement, cached-cell collision == full collision,
    value and gradient — the core invariant of the scheme."""
    from psi_tpu.fit.fitting import _per_body_losses
    from psi_tpu.geometry.bodyvec import convert_to_6D_rot

    a, x72, cam_ext, scene_idx = setup
    xhr0 = convert_to_6D_rot(x72)
    cfg = FitConfig(contact_denom_offset=1.0, refresh_every=5)

    def full_loss(xhr):
        return _per_body_losses(a, xhr, xhr0, cam_ext, scene_idx, cfg)

    (l_full, (m_full, sel)), g_full = jax.value_and_grad(full_loss, has_aux=True)(xhr0)
    assert float(np.asarray(m_full["collision"]).sum()) > 0  # setup penetrates

    def cheap_loss(xhr):
        return _per_body_losses(a, xhr, xhr0, cam_ext, scene_idx, cfg, sel)[0]

    l_cheap, g_cheap = jax.value_and_grad(cheap_loss)(xhr0)
    np.testing.assert_allclose(float(l_cheap), float(l_full), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(g_cheap), np.asarray(g_full), rtol=1e-5, atol=1e-6)


def test_cached_patch_tracks_small_displacement(setup):
    """A small parameter perturbation after caching: the frozen-cell SDF
    stays close to the true lookup (second-order error)."""
    from psi_tpu.body.decode import body_vec_to_verts
    from psi_tpu.ops.sdf import (
        sdf_trilinear_from_cache,
        sdf_trilinear_packed,
        sdf_trilinear_packed_cached,
    )

    a, x72, cam_ext, scene_idx = setup
    verts0, _ = body_vec_to_verts(a.smplx, a.vposer_params, x72, cam_ext)
    _, cache = sdf_trilinear_packed_cached(
        a.sdf_packed, scene_idx, verts0, a.grid_mins, a.grid_maxs
    )
    # displace verts by ~2% of a cell (grid extent/16 cells)
    cell = float(np.asarray(a.grid_maxs[0] - a.grid_mins[0]).max()) / 16
    rng = np.random.default_rng(0)
    verts1 = verts0 + jnp.asarray(
        rng.normal(0, 0.02 * cell, np.asarray(verts0).shape).astype(np.float32)
    )
    dims = tuple(a.sdf_packed.shape[1:4])
    approx = sdf_trilinear_from_cache(cache, scene_idx, verts1, a.grid_mins, a.grid_maxs, dims)
    exact = sdf_trilinear_packed(a.sdf_packed, scene_idx, verts1, a.grid_mins, a.grid_maxs)
    # error << the displacement's worst-case linear effect
    err = np.abs(np.asarray(approx) - np.asarray(exact))
    sdf_scale = float(np.abs(np.asarray(exact)).mean()) + 1e-6
    assert err.mean() < 0.05 * sdf_scale


def test_refresh_every_1_matches_production(setup):
    a, x72, cam_ext, scene_idx = setup
    base = FitConfig(num_iter=10, contact_denom_offset=1.0)
    ref = FitConfig(num_iter=10, contact_denom_offset=1.0, refresh_every=1)
    xf0, _, h0 = _run(a, x72, cam_ext, scene_idx, base)
    xf1, _, h1 = _run(a, x72, cam_ext, scene_idx, ref)
    np.testing.assert_array_equal(h0, h1)
    np.testing.assert_array_equal(xf0, xf1)


def test_refresh_still_reduces_collision(setup):
    """Aggressive schedule (T=10) must still fit: scene losses fall."""
    from psi_tpu.fit.fitting import _per_body_losses
    from psi_tpu.geometry.bodyvec import convert_to_6D_rot

    a, x72, cam_ext, scene_idx = setup
    cfg = FitConfig(num_iter=30, contact_denom_offset=1.0, refresh_every=10)
    xhr0 = convert_to_6D_rot(x72)
    _, (m_init, _) = _per_body_losses(a, xhr0, xhr0, cam_ext, scene_idx, cfg)
    assert float(np.asarray(m_init["collision"]).sum()) > 0
    xf, m, _ = _run(a, x72, cam_ext, scene_idx, cfg)
    assert np.all(np.isfinite(xf))
    assert float(m["collision"].sum()) < float(np.asarray(m_init["collision"]).sum())


def test_refresh_final_objective_close(setup):
    """T=5 must land at an equally good objective ON AVERAGE. Per-body
    totals are NOT compared: 20 Adam steps on a loss with near-flat
    directions are chaotic, so any perturbation lands individual bodies
    at different-but-equally-good minima (empirically refresh wins about
    as many bodies as it loses). The population mean is the stable
    quantity; realistic-shape numbers live in PARITY.md via
    scripts/validate_refresh_fit.py."""
    a, x72, cam_ext, scene_idx = setup
    base = FitConfig(num_iter=20, contact_denom_offset=1.0)
    ref = FitConfig(num_iter=20, contact_denom_offset=1.0, refresh_every=5)
    _, m0, _ = _run(a, x72, cam_ext, scene_idx, base)
    _, m1, _ = _run(a, x72, cam_ext, scene_idx, ref)
    np.testing.assert_allclose(m1["total"].mean(), m0["total"].mean(), rtol=0.10)
    np.testing.assert_allclose(
        m1["collision"].mean(), m0["collision"].mean(), rtol=0.15, atol=1e-3
    )


def test_block_scan_matches_periter_schedule(setup):
    """The block-structured scan (warmup fulls + [full + T-1 cheap]
    blocks + partial tail) must reproduce the per-iteration schedule
    "full iff i < w or (i-w) % T == 0" exactly — same loss history,
    same final parameters — here checked against an explicit python
    loop over _per_body_losses with the same Adam updates. num_iter=13,
    w=4, T=5 exercises warmup, one complete block, and a partial tail."""
    import optax
    from psi_tpu.fit.fitting import _per_body_losses
    from psi_tpu.geometry.bodyvec import convert_to_6D_rot, convert_to_3D_rot

    a, x72, cam_ext, scene_idx = setup
    # sdf_warmup_gathers pinned True: this test checks the full-pass
    # warmup schedule; the gather-skipping warmup has its own twin below
    cfg = FitConfig(
        num_iter=13, contact_denom_offset=1.0, refresh_every=5,
        refresh_warmup=4, sdf_warmup_gathers=True,
    )
    xf, _, hist = _run(a, x72, cam_ext, scene_idx, cfg)

    xhr0 = convert_to_6D_rot(x72)
    opt = optax.adam(cfg.init_lr_h)

    @jax.jit
    def full_step(xhr, opt_state):
        def loss(x):
            return _per_body_losses(a, x, xhr0, cam_ext, scene_idx, cfg)
        (_, (m, sel)), g = jax.value_and_grad(loss, has_aux=True)(xhr)
        up, opt_state = opt.update(g, opt_state, xhr)
        return optax.apply_updates(xhr, up), opt_state, sel, m["total"]

    @jax.jit
    def cheap_step(xhr, opt_state, sel):
        def loss(x):
            return _per_body_losses(a, x, xhr0, cam_ext, scene_idx, cfg, sel)
        (_, (m, _)), g = jax.value_and_grad(loss, has_aux=True)(xhr)
        up, opt_state = opt.update(g, opt_state, xhr)
        return optax.apply_updates(xhr, up), opt_state, m["total"]

    xhr, opt_state, sel = xhr0, opt.init(xhr0), None
    ref_hist = []
    for i in range(cfg.num_iter):
        w, T = cfg.refresh_warmup, cfg.refresh_every
        if i < w or (i - w) % T == 0:
            xhr, opt_state, sel, t = full_step(xhr, opt_state)
        else:
            xhr, opt_state, t = cheap_step(xhr, opt_state, sel)
        ref_hist.append(np.asarray(t))

    # rtol 1e-3: schedule errors show up at the 1e-2+ level (full vs
    # cheap losses differ visibly); below that is compile-variant f32
    # rounding (scan body vs standalone jit), which drifts with env
    np.testing.assert_allclose(hist, np.stack(ref_hist), rtol=1e-3, atol=1e-5)
    # final params: scan-compiled vs standalone-compiled steps fuse
    # differently; Adam turns near-zero-grad rounding into +-lr tie
    # flips on flat directions (see tests/test_multichip.py docstring),
    # so bound max drift by a few lr and the mean much tighter
    d = np.abs(xf - np.asarray(convert_to_3D_rot(xhr)))
    assert d.max() < 3 * cfg.init_lr_h, f"max param drift {d.max()}"
    assert d.mean() < 0.05 * cfg.init_lr_h, f"mean param drift {d.mean()}"


def test_sdf_warmup_gathers_off_matches_explicit_schedule(setup):
    """sdf_warmup_gathers=False: iter 0 is a full pass, warmup iters
    1..w-1 are NN-only (fresh correspondences, carried SDF cell cache),
    then the usual [full + T-1 cheap] blocks. Checked against an
    explicit python loop over _per_body_losses with the same Adam
    updates — same loss history, bounded-drift final parameters."""
    import optax
    from psi_tpu.fit.fitting import _per_body_losses
    from psi_tpu.geometry.bodyvec import convert_to_6D_rot, convert_to_3D_rot

    a, x72, cam_ext, scene_idx = setup
    cfg = FitConfig(
        num_iter=13, contact_denom_offset=1.0, refresh_every=5,
        refresh_warmup=4, sdf_warmup_gathers=False,
    )
    xf, _, hist = _run(a, x72, cam_ext, scene_idx, cfg)

    xhr0 = convert_to_6D_rot(x72)
    opt = optax.adam(cfg.init_lr_h)

    @jax.jit
    def full_step(xhr, opt_state):
        def loss(x):
            return _per_body_losses(a, x, xhr0, cam_ext, scene_idx, cfg)
        (_, (m, sel)), g = jax.value_and_grad(loss, has_aux=True)(xhr)
        up, opt_state = opt.update(g, opt_state, xhr)
        return optax.apply_updates(xhr, up), opt_state, sel, m["total"]

    @jax.jit
    def nn_only_step(xhr, opt_state, sel):
        def loss(x):
            return _per_body_losses(
                a, x, xhr0, cam_ext, scene_idx, cfg, sel,
                fresh_nn=True, fresh_sdf=False,
            )
        (_, (m, new_sel)), g = jax.value_and_grad(loss, has_aux=True)(xhr)
        up, opt_state = opt.update(g, opt_state, xhr)
        return optax.apply_updates(xhr, up), opt_state, new_sel, m["total"]

    @jax.jit
    def cheap_step(xhr, opt_state, sel):
        def loss(x):
            return _per_body_losses(a, x, xhr0, cam_ext, scene_idx, cfg, sel)
        (_, (m, _)), g = jax.value_and_grad(loss, has_aux=True)(xhr)
        up, opt_state = opt.update(g, opt_state, xhr)
        return optax.apply_updates(xhr, up), opt_state, m["total"]

    xhr, opt_state, sel = xhr0, opt.init(xhr0), None
    ref_hist = []
    w, T = cfg.refresh_warmup, cfg.refresh_every
    for i in range(cfg.num_iter):
        if i == 0 or (i >= w and (i - w) % T == 0):
            xhr, opt_state, sel, t = full_step(xhr, opt_state)
        elif i < w:
            xhr, opt_state, sel, t = nn_only_step(xhr, opt_state, sel)
        else:
            xhr, opt_state, t = cheap_step(xhr, opt_state, sel)
        ref_hist.append(np.asarray(t))

    # rtol 1e-3: schedule errors show up at the 1e-2+ level (full vs
    # cheap losses differ visibly); below that is compile-variant f32
    # rounding (scan body vs standalone jit), which drifts with env
    np.testing.assert_allclose(hist, np.stack(ref_hist), rtol=1e-3, atol=1e-5)
    d = np.abs(xf - np.asarray(convert_to_3D_rot(xhr)))
    assert d.max() < 3 * cfg.init_lr_h, f"max param drift {d.max()}"
    assert d.mean() < 0.05 * cfg.init_lr_h, f"mean param drift {d.mean()}"


def test_sdf_warmup_gathers_off_objective_close(setup):
    """The gather-skipping warmup must land at an equally good objective
    on average (same stability argument as the refresh tests above)."""
    a, x72, cam_ext, scene_idx = setup
    base = FitConfig(
        num_iter=20, contact_denom_offset=1.0, refresh_every=5,
        sdf_warmup_gathers=True,
    )
    nog = FitConfig(
        num_iter=20, contact_denom_offset=1.0, refresh_every=5,
        sdf_warmup_gathers=False,
    )
    _, m0, _ = _run(a, x72, cam_ext, scene_idx, base)
    _, m1, _ = _run(a, x72, cam_ext, scene_idx, nog)
    assert np.all(np.isfinite(m1["total"]))
    np.testing.assert_allclose(m1["total"].mean(), m0["total"].mean(), rtol=0.10)
    np.testing.assert_allclose(
        m1["collision"].mean(), m0["collision"].mean(), rtol=0.15, atol=1e-3
    )


def test_cheap_collision_verts_objective_close(setup):
    """Vertex-subset cheap iterations (FitConfig.cheap_collision_verts):
    contact rows are identical (contact_vids are always decoded), the
    collision term averages over the stride subset between exact full
    passes. Must run finite and land at an equally good objective on
    average; final metrics come from a FULL pass in both configs, so
    the comparison is apples-to-apples."""
    a, x72, cam_ext, scene_idx = setup
    base = FitConfig(num_iter=20, contact_denom_offset=1.0, refresh_every=5)
    subcfg = FitConfig(
        num_iter=20, contact_denom_offset=1.0, refresh_every=5,
        cheap_collision_verts=48,
    )
    xf0, m0, _ = _run(a, x72, cam_ext, scene_idx, base)
    xf1, m1, h1 = _run(a, x72, cam_ext, scene_idx, subcfg)
    assert np.all(np.isfinite(xf1)) and np.all(np.isfinite(h1))
    np.testing.assert_allclose(m1["total"].mean(), m0["total"].mean(), rtol=0.10)
    np.testing.assert_allclose(
        m1["collision"].mean(), m0["collision"].mean(), rtol=0.15, atol=1e-3
    )


def test_cheap_collision_verts_full_subset_is_exact(setup):
    """cheap_collision_verts >= num_verts selects every vertex: the
    stride subset is then the identity permutation modulo the contact
    rows' duplication, so the collision VALUES at a refresh anchor match
    the unrestricted config's (the mean double-counts contact rows —
    compare the underlying per-vertex SDF path instead via the final
    full-pass metrics, which never use the subset)."""
    a, x72, cam_ext, scene_idx = setup
    base = FitConfig(num_iter=8, contact_denom_offset=1.0, refresh_every=4)
    allv = FitConfig(
        num_iter=8, contact_denom_offset=1.0, refresh_every=4,
        cheap_collision_verts=10**6,
    )
    xf0, m0, _ = _run(a, x72, cam_ext, scene_idx, base)
    xf1, m1, _ = _run(a, x72, cam_ext, scene_idx, allv)
    # trajectories differ only through the contact-row double-count in
    # the cheap collision mean; objectives must stay close
    np.testing.assert_allclose(m1["total"].mean(), m0["total"].mean(), rtol=0.10)


def test_want_metrics_false_identical_params(setup):
    """want_metrics=False must drop ONLY the final metrics pass: fitted
    parameters bitwise-equal to the default, metrics slot None, loss
    history unchanged — in both refresh and exact modes (serving and the
    bench trace with False; FittingOP with True)."""
    a, x72, cam_ext, scene_idx = setup
    for cfg in (
        FitConfig(num_iter=6, contact_denom_offset=1.0, refresh_every=3),
        FitConfig(num_iter=4, contact_denom_offset=1.0),
    ):
        xf0, m0, h0 = make_fit_step(a, cfg)(x72, cam_ext, scene_idx)
        xf1, m1, h1 = make_fit_step(a, cfg, want_metrics=False)(x72, cam_ext, scene_idx)
        assert m1 is None and m0 is not None
        np.testing.assert_array_equal(np.asarray(xf0), np.asarray(xf1))
        np.testing.assert_array_equal(np.asarray(h0), np.asarray(h1))
