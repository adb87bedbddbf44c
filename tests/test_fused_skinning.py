"""Fused Pallas skinning kernel (ops/fused_skinning.py) vs the einsum
LBS path.

The kernel is the 'fused' tier of FitConfig.lbs_precision: same
single-pass-bf16 numerics class as 'fast', so parity tolerances are the
bf16 input-rounding bound (~2^-8 relative on metre-scale vertices), not
exact equality. Gradients flow through a custom VJP (a second kernel);
they are checked against jax.grad of the einsum path.

Runs in Pallas interpret mode off-TPU (tests/conftest.py pins the CPU
backend), same convention as ops/chamfer.py.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from psi_tpu.body.decode import body_vec_to_verts
from psi_tpu.body.smplx_model import (
    make_fused_bundle,
    smplx_forward,
    smplx_forward_fused,
    synthetic_smplx,
)
from psi_tpu.data.synthetic import make_synthetic_assets
from psi_tpu.fit.fitting import make_fit_step
from psi_tpu.geometry.camera import verts_transform
from psi_tpu.utils.config import FitConfig

B = 5
V = 300  # pads to 2 vertex tiles
J = 12


@pytest.fixture(scope="module")
def model():
    return synthetic_smplx(num_verts=V, num_joints=J, seed=0)


@pytest.fixture(scope="module")
def params(model):
    rng = np.random.default_rng(1)
    return dict(
        transl=jnp.asarray(rng.normal(0, 0.5, (B, 3)).astype(np.float32)),
        global_orient=jnp.asarray(rng.normal(0, 0.3, (B, 3)).astype(np.float32)),
        betas=jnp.asarray(rng.normal(0, 1.0, (B, 10)).astype(np.float32)),
        body_pose=jnp.asarray(rng.normal(0, 0.3, (B, (J - 1) * 3)).astype(np.float32)),
    )


def _cam(rng, n):
    cam = np.tile(np.eye(4, dtype=np.float32), (n, 1, 1))
    # small rotation + translation, stays a rigid transform
    th = rng.normal(0, 0.2, n).astype(np.float32)
    cam[:, 0, 0] = np.cos(th)
    cam[:, 0, 1] = -np.sin(th)
    cam[:, 1, 0] = np.sin(th)
    cam[:, 1, 1] = np.cos(th)
    cam[:, :3, 3] = rng.normal(0, 0.5, (n, 3)).astype(np.float32)
    return jnp.asarray(cam)


def test_forward_matches_fast_lbs(model, params):
    rng = np.random.default_rng(2)
    cam = _cam(rng, B)
    v_ref, j_ref = smplx_forward(model, precision="fast", **params)
    v_ref = verts_transform(v_ref, cam)
    j_ref = verts_transform(j_ref, cam)

    v_f, j_f = smplx_forward_fused(model, cam_ext=cam, **params)
    assert v_f.shape == (B, V, 3) and j_f.shape == (B, J, 3)
    # bf16 input rounding (~2^-8 relative) on metre-scale verts
    err = np.abs(np.asarray(v_f) - np.asarray(v_ref))
    assert err.max() < 2.5e-2, f"max vertex err {err.max()}"
    assert err.mean() < 3e-3, f"mean vertex err {err.mean()}"
    # joints use the exact folded regressor — f32-grade agreement
    np.testing.assert_allclose(np.asarray(j_f), np.asarray(j_ref), atol=5e-4)


def test_forward_no_camera(model, params):
    v_ref, _ = smplx_forward(model, precision="fast", **params)
    v_f, _ = smplx_forward_fused(model, cam_ext=None, **params)
    err = np.abs(np.asarray(v_f) - np.asarray(v_ref))
    assert err.max() < 2.5e-2


def test_bundle_reuse_identical(model, params):
    bundle = make_fused_bundle(model)
    v_a, _ = smplx_forward_fused(model, cam_ext=None, bundle=bundle, **params)
    v_b, _ = smplx_forward_fused(model, cam_ext=None, **params)
    np.testing.assert_array_equal(np.asarray(v_a), np.asarray(v_b))


def test_forward_no_posedirs(params):
    """A model loaded with use_posedirs=False gets a C=1+L basis; the
    coefficient vector must match it (no pose block) instead of crashing
    or silently mis-padding (ADVICE round 3, medium)."""
    model_np = synthetic_smplx(num_verts=V, num_joints=J, seed=0, use_posedirs=False)
    assert model_np.posedirs is None
    v_ref, _ = smplx_forward(model_np, precision="fast", **params)
    v_f, _ = smplx_forward_fused(model_np, cam_ext=None, **params)
    err = np.abs(np.asarray(v_f) - np.asarray(v_ref))
    assert err.max() < 2.5e-2, f"max vertex err {err.max()}"


def test_stale_bundle_rejected(model, params):
    """A bundle built from a mismatched model must fail loudly, not
    produce silently wrong vertices (ADVICE round 3)."""
    other = synthetic_smplx(num_verts=V + 8, num_joints=J, seed=1)
    bad_verts = make_fused_bundle(other)
    with pytest.raises(ValueError, match="vertex"):
        smplx_forward_fused(model, cam_ext=None, bundle=bad_verts, **params)

    no_pose = synthetic_smplx(num_verts=V, num_joints=J, seed=0, use_posedirs=False)
    bad_feat = make_fused_bundle(no_pose)
    with pytest.raises(ValueError, match="n_feat"):
        smplx_forward_fused(model, cam_ext=None, bundle=bad_feat, **params)


def test_gradients_match_fast_lbs(model, params):
    rng = np.random.default_rng(3)
    cam = _cam(rng, B)
    probe = jnp.asarray(rng.normal(0, 1, (B, V, 3)).astype(np.float32))

    flat = jnp.concatenate(
        [params["transl"], params["global_orient"], params["betas"], params["body_pose"]],
        axis=1,
    )

    def unpack(x):
        return dict(
            transl=x[:, :3],
            global_orient=x[:, 3:6],
            betas=x[:, 6:16],
            body_pose=x[:, 16:],
        )

    def loss_fused(x):
        v, _ = smplx_forward_fused(model, cam_ext=cam, **unpack(x))
        return jnp.sum(v * probe)

    def loss_ref(x):
        v, _ = smplx_forward(model, precision="fast", **unpack(x))
        return jnp.sum(verts_transform(v, cam) * probe)

    g_f = np.asarray(jax.grad(loss_fused)(flat))
    g_r = np.asarray(jax.grad(loss_ref)(flat))
    scale = np.abs(g_r).max() + 1e-8
    rel = np.abs(g_f - g_r) / scale
    assert rel.max() < 2e-2, f"max rel grad err {rel.max()} (scale {scale})"


def test_decode_fused_branch(model):
    """body_vec_to_verts(precision='fused') routes through the kernel and
    stays close to the 'fast' einsum decode."""
    assets, _ = make_synthetic_assets(
        num_verts=V, num_joints=J, num_scenes=2, sdf_dim=16, scene_points=512,
        n_contact=32,
    )
    rng = np.random.default_rng(4)
    x72 = jnp.asarray((rng.normal(0, 0.3, (B, 72))).astype(np.float32))
    cam = _cam(rng, B)
    v_fast, j_fast = body_vec_to_verts(
        assets.smplx, assets.vposer_params, x72, cam, precision="fast"
    )
    v_fused, j_fused = body_vec_to_verts(
        assets.smplx, assets.vposer_params, x72, cam, precision="fused"
    )
    assert np.abs(np.asarray(v_fused) - np.asarray(v_fast)).max() < 2.5e-2
    np.testing.assert_allclose(np.asarray(j_fused), np.asarray(j_fast), atol=5e-4)


def test_fit_step_fused_close_to_fast():
    """The production refresh fit with lbs_precision='fused' stays close
    to the 'fast' einsum fit (both bf16-tier; Adam can amplify rounding
    flips, so bounds are the bounded-drift kind used by the multichip
    equivalence checks)."""
    assets, _ = make_synthetic_assets(
        num_verts=V, num_joints=J, num_scenes=2, sdf_dim=16, scene_points=512,
        n_contact=32,
    )
    rng = np.random.default_rng(5)
    n = 6
    x72 = (rng.normal(0, 0.3, (n, 72)) * 0.5).astype(np.float32)
    x72[:, 2] += 3.0
    cam = np.tile(np.eye(4, dtype=np.float32), (n, 1, 1))
    sidx = (np.arange(n) % 2).astype(np.int32)

    cfg_fast = FitConfig(num_iter=6, refresh_every=3, refresh_warmup=2, lbs_precision="fast")
    cfg_fused = FitConfig(num_iter=6, refresh_every=3, refresh_warmup=2, lbs_precision="fused")
    x_fast, m_fast, _ = make_fit_step(assets, cfg_fast)(
        jnp.asarray(x72), jnp.asarray(cam), jnp.asarray(sidx)
    )
    x_fused, m_fused, _ = make_fit_step(assets, cfg_fused)(
        jnp.asarray(x72), jnp.asarray(cam), jnp.asarray(sidx)
    )
    assert np.all(np.isfinite(np.asarray(x_fused)))
    d = np.abs(np.asarray(x_fused) - np.asarray(x_fast))
    assert d.max() < 0.25, f"max fitted-param drift {d.max()}"
    assert d.mean() < 0.02, f"mean fitted-param drift {d.mean()}"
    t_a = np.asarray(m_fused["total"], np.float64)
    t_b = np.asarray(m_fast["total"], np.float64)
    rel = np.abs(t_a - t_b) / np.maximum(np.abs(t_b), 1e-6)
    assert rel.max() < 0.1, f"max objective mismatch {rel.max()}"


def test_fused_sharded_matches_unsharded(model, params):
    """shard_map path (ADVICE round 3: pallas_call is unpartitionable to
    GSPMD): the fused decode over a population sharded on 'dp' must
    match the single-device kernel — forward and gradients."""
    from psi_tpu.parallel.mesh import make_mesh

    mesh = make_mesh(8)
    rng = np.random.default_rng(6)
    n = 16  # 2 rows per device
    big = {k: jnp.asarray(np.tile(np.asarray(v), (n // B + 1, 1))[:n]) for k, v in params.items()}
    cam = _cam(rng, n)

    v_1, _ = smplx_forward_fused(model, cam_ext=cam, **big)
    v_m, _ = smplx_forward_fused(model, cam_ext=cam, mesh=mesh, **big)
    np.testing.assert_allclose(np.asarray(v_m), np.asarray(v_1), atol=1e-5)

    probe = jnp.asarray(rng.normal(0, 1, (n, V, 3)).astype(np.float32))

    def loss(betas, mesh_):
        v, _ = smplx_forward_fused(model, cam_ext=cam, mesh=mesh_,
                                   **{**big, "betas": betas})
        return jnp.sum(v * probe)

    g_1 = np.asarray(jax.grad(lambda b: loss(b, None))(big["betas"]))
    g_m = np.asarray(jax.grad(lambda b: loss(b, mesh))(big["betas"]))
    scale = np.abs(g_1).max() + 1e-8
    assert (np.abs(g_m - g_1) / scale).max() < 1e-4


def test_fit_step_fused_sharded():
    """make_fit_step(mesh=...) with 'fused' LBS compiles and runs with a
    'dp'-sharded population on the CPU mesh, matching the unsharded fit."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    from psi_tpu.parallel.mesh import make_mesh, replicate

    assets, _ = make_synthetic_assets(
        num_verts=V, num_joints=J, num_scenes=2, sdf_dim=16, scene_points=512,
        n_contact=32,
    )
    rng = np.random.default_rng(7)
    n = 16
    x72 = (rng.normal(0, 0.3, (n, 72)) * 0.5).astype(np.float32)
    x72[:, 2] += 3.0
    cam = np.tile(np.eye(4, dtype=np.float32), (n, 1, 1))
    sidx = (np.arange(n) % 2).astype(np.int32)
    cfg = FitConfig(num_iter=5, refresh_every=3, refresh_warmup=2, lbs_precision="fused")

    mesh = make_mesh(8)
    sh = NamedSharding(mesh, P("dp"))
    fit_m = make_fit_step(replicate(assets, mesh), cfg, mesh=mesh)
    x_m, _, _ = fit_m(
        jax.device_put(jnp.asarray(x72), sh),
        jax.device_put(jnp.asarray(cam), sh),
        jax.device_put(jnp.asarray(sidx), sh),
    )
    fit_1 = make_fit_step(assets, cfg)
    x_1, _, _ = fit_1(jnp.asarray(x72), jnp.asarray(cam), jnp.asarray(sidx))
    assert np.all(np.isfinite(np.asarray(x_m)))
    d = np.abs(np.asarray(x_m) - np.asarray(x_1))
    assert d.max() < 0.25, f"max fitted-param drift {d.max()}"
    assert d.mean() < 1e-3, f"mean fitted-param drift {d.mean()}"


def test_merged_dot_variant_matches_unmerged(model, params, monkeypatch):
    """The _MERGED formulation (12 blend dots stacked into one MXU dot,
    fwd and bwd) is the same math in a different dot shape — outputs and
    gradients must match the unmerged kernel to float tolerance."""
    from psi_tpu.ops import fused_skinning as fs

    def run():
        verts, _ = smplx_forward_fused(model, cam_ext=None, **params)

        def loss(p):
            v, _ = smplx_forward_fused(model, cam_ext=None, **p)
            return (v * v).mean()

        return verts, jax.grad(loss)(params)

    monkeypatch.setattr(fs, "_MERGED", False)
    v0, g0 = run()
    monkeypatch.setattr(fs, "_MERGED", True)
    v1, g1 = run()
    np.testing.assert_allclose(np.asarray(v0), np.asarray(v1), atol=1e-5)
    for k in g0:
        np.testing.assert_allclose(np.asarray(g0[k]), np.asarray(g1[k]),
                                   atol=1e-5, rtol=1e-4)
