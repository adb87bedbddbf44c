"""Scene-point pruning in the fitting contact loss preserves the result.

FitConfig.prune_scene_points keeps the ~K scene points nearest each
body's contact centroid before the NN kernel, selected tile-granularly
over the Morton-ordered cloud (ops/prune.py). These tests assert (a)
the pruned one-sided chamfer equals the exact one on realistic
geometry, (b) full fitting runs produce the same fitted parameters
with pruning on and off, and (c) the Morton/tile machinery itself.
"""

import jax
import jax.numpy as jnp
import numpy as np

from psi_tpu.data.synthetic import make_synthetic_assets
from psi_tpu.fit import make_fit_step
from psi_tpu.ops.chamfer import chamfer_one_sided
from psi_tpu.ops.prune import morton_argsort, morton_codes, select_near_tiles
from psi_tpu.utils.config import FitConfig


def test_morton_sort_is_permutation_and_local(rng):
    pts = rng.uniform(-3, 3, size=(4096, 3)).astype(np.float32)
    perm = morton_argsort(pts)
    assert sorted(perm.tolist()) == list(range(4096))
    s = pts[perm]
    # spatial locality: consecutive Morton points are far closer than
    # random pairs on average
    step = np.linalg.norm(np.diff(s, axis=0), axis=1).mean()
    rand = np.linalg.norm(s[rng.permutation(4095)] - s[:4095], axis=1).mean()
    assert step < 0.35 * rand


def test_select_near_tiles_contains_true_nn(rng):
    """The NN of every query against the tile-pruned candidates equals
    the NN against the full (Morton-ordered) cloud."""
    B, C, M, K = 4, 64, 2000, 512
    scene = rng.uniform(-4, 4, size=(B, M, 3)).astype(np.float32)
    scene = np.stack([s[morton_argsort(s)] for s in scene])
    centers = rng.uniform(-3, 3, size=(B, 1, 3)).astype(np.float32)
    contact = (centers + rng.normal(0, 0.3, size=(B, C, 3))).astype(np.float32)

    d_exact = chamfer_one_sided(jnp.asarray(contact), jnp.asarray(scene))
    centroid = jnp.mean(jnp.asarray(contact), axis=1)
    pruned = select_near_tiles(jnp.asarray(scene), centroid, K)
    assert pruned.shape == (B, K, 3)
    d_pruned = chamfer_one_sided(jnp.asarray(contact), pruned)
    np.testing.assert_allclose(np.asarray(d_pruned), np.asarray(d_exact), atol=1e-6)


def test_select_near_tiles_methods_identical(rng):
    """All four rank×fetch formulations return the same points. The
    production default is 'topk_matmul' — the only variant that does not
    hard-fault the TPU inside large refresh-block fit programs (the
    others exist as bisection evidence; see ops/prune.py docstring)."""
    pts = rng.uniform(-4, 4, size=(3, 2000, 3)).astype(np.float32)
    pts = np.stack([p[morton_argsort(p)] for p in pts])
    c = jnp.asarray(rng.uniform(-3, 3, size=(3, 3)).astype(np.float32))
    ref = np.asarray(select_near_tiles(jnp.asarray(pts), c, 512, method="topk_gather"))
    for m in ("topk_matmul", "argmin_gather", "argmin_matmul"):
        out = np.asarray(select_near_tiles(jnp.asarray(pts), c, 512, method=m))
        np.testing.assert_array_equal(out, ref, err_msg=m)


def test_select_near_tiles_pads_and_degenerates(rng):
    """Non-multiple-of-128 clouds pad with far points; k >= M returns the
    (padded) full cloud."""
    pts = rng.uniform(-1, 1, size=(2, 300, 3)).astype(np.float32)
    c = jnp.zeros((2, 3))
    out = select_near_tiles(jnp.asarray(pts), c, 128)
    assert out.shape == (2, 128, 3)
    full = select_near_tiles(jnp.asarray(pts), c, 512)
    assert full.shape[1] >= 300  # tile-padded full cloud

    codes = morton_codes(pts[0])
    assert codes.shape == (300,)


def test_fitting_with_pruning_matches_exact():
    """End-to-end: fitted parameters with pruning == without (tiny assets)."""
    assets, _ = make_synthetic_assets(
        num_verts=256, num_joints=12, num_scenes=2, sdf_dim=16, scene_points=512, n_contact=64
    )
    rng = np.random.default_rng(5)
    n = 8
    x72 = (rng.normal(size=(n, 72)) * 0.3).astype(np.float32)
    x72[:, 2] += 3.0
    cam_ext = jnp.asarray(np.tile(np.eye(4, dtype=np.float32), (n, 1, 1)))
    scene_idx = jnp.zeros(n, jnp.int32)
    x72 = jnp.asarray(x72)

    x_exact, m_exact, _ = make_fit_step(assets, FitConfig(num_iter=8, prune_scene_points=0))(
        x72, cam_ext, scene_idx
    )
    x_pruned, m_pruned, _ = make_fit_step(assets, FitConfig(num_iter=8, prune_scene_points=256))(
        x72, cam_ext, scene_idx
    )
    np.testing.assert_allclose(np.asarray(x_pruned), np.asarray(x_exact), atol=2e-5, rtol=1e-5)
    np.testing.assert_allclose(
        np.asarray(m_pruned["total"]), np.asarray(m_exact["total"]), atol=1e-5, rtol=1e-5
    )


def test_remat_decode_equivalence():
    """FitConfig(remat_decode=True) is semantically the same computation —
    remat only changes WHEN the decode runs. XLA refuses the recomputed
    graph slightly differently, and Adam's normalized updates amplify
    ulp-level differences iteration-over-iteration (the documented
    tie-flip bound, see tests/test_multichip.py), so the bound is loose
    float32 equality, not bitwise."""
    from psi_tpu.data.synthetic import make_synthetic_assets
    from psi_tpu.fit import make_fit_step
    from psi_tpu.utils.config import FitConfig
    import jax.numpy as jnp

    assets, _ = make_synthetic_assets(
        num_verts=256, num_joints=12, num_scenes=2, sdf_dim=16, scene_points=512, n_contact=64
    )
    rng = np.random.default_rng(7)
    n = 8
    x72 = (rng.normal(size=(n, 72)) * 0.3).astype(np.float32)
    x72[:, 2] += 3.0
    cam_ext = jnp.asarray(np.tile(np.eye(4, dtype=np.float32), (n, 1, 1)))
    scene_idx = jnp.zeros(n, jnp.int32)
    x72 = jnp.asarray(x72)

    x_plain, m_plain, _ = make_fit_step(assets, FitConfig(num_iter=6))(x72, cam_ext, scene_idx)
    x_remat, m_remat, _ = make_fit_step(assets, FitConfig(num_iter=6, remat_decode=True))(
        x72, cam_ext, scene_idx
    )
    np.testing.assert_allclose(np.asarray(x_remat), np.asarray(x_plain), atol=2e-4, rtol=1e-4)
    np.testing.assert_allclose(
        np.asarray(m_remat["total"]), np.asarray(m_plain["total"]), atol=1e-4, rtol=1e-4
    )
