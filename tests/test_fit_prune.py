"""Scene-point pruning in the fitting contact loss preserves the result.

FitConfig.prune_scene_points keeps only the K scene points nearest each
body's contact centroid before the NN kernel. These tests assert (a)
the pruned one-sided chamfer equals the exact one on realistic
geometry, and (b) full fitting runs produce the same fitted parameters
with pruning on and off.
"""

import jax
import jax.numpy as jnp
import numpy as np

from psi_tpu.data.synthetic import make_synthetic_assets
from psi_tpu.fit import make_fit_step
from psi_tpu.ops.chamfer import chamfer_one_sided
from psi_tpu.utils.config import FitConfig


def test_pruned_chamfer_equals_exact(rng):
    """K=256 of 2000 scene points: the true NN of every contact vert is
    within the pruned candidate set (bodies are small vs the scene)."""
    B, C, M, K = 4, 64, 2000, 256
    scene = rng.uniform(-4, 4, size=(B, M, 3)).astype(np.float32)
    # bodies: tight clusters somewhere in the scene
    centers = rng.uniform(-3, 3, size=(B, 1, 3)).astype(np.float32)
    contact = (centers + rng.normal(0, 0.3, size=(B, C, 3))).astype(np.float32)

    d_exact = chamfer_one_sided(jnp.asarray(contact), jnp.asarray(scene))

    centroid = jnp.mean(jnp.asarray(contact), axis=1)
    cd = jnp.sum((jnp.asarray(scene) - centroid[:, None, :]) ** 2, axis=-1)
    _, sel = jax.lax.approx_min_k(cd, K, recall_target=0.99)
    pruned = jnp.take_along_axis(jnp.asarray(scene), sel[..., None], axis=1)
    d_pruned = chamfer_one_sided(jnp.asarray(contact), pruned)

    np.testing.assert_allclose(np.asarray(d_pruned), np.asarray(d_exact), atol=1e-6)


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
