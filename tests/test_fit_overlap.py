"""Population-chunked fit (FitConfig.overlap_chunks) equivalence.

Chunking splits the body axis into C independent per-chunk chains inside
every fit iteration so the gather-engine traffic of one chunk can
overlap the dense math of another (scripts/probe_overlap.py measures
the gather engine fully concurrent with the MXU). Every loss term is
per-body, so re-grouping the batch dimension must not change any body's
trajectory; these tests pin that equivalence across the schedule
variants (plain, refresh blocks, NN-only warmup, vertex-subset cheap
iters) and the fallback when C does not divide the population.
"""

import dataclasses

import jax.numpy as jnp
import numpy as np
import pytest

from psi_tpu.data.synthetic import make_synthetic_assets, random_body_batch, random_camera_batch
from psi_tpu.fit.fitting import make_fit_step
from psi_tpu.utils.config import FitConfig


@pytest.fixture(scope="module")
def small_world():
    assets, _ = make_synthetic_assets(
        num_verts=128, num_joints=12, num_scenes=2, sdf_dim=16,
        scene_points=256, n_contact=24, seed=0,
    )
    rng = np.random.default_rng(0)
    n = 8
    cam_ext = jnp.asarray(random_camera_batch(rng, n)[0])
    scene_idx = jnp.asarray(rng.integers(0, 2, size=(n,)).astype(np.int32))
    x72 = jnp.asarray(random_body_batch(rng, n, np.full((n,), 5.0, np.float32)))
    return assets, x72, cam_ext, scene_idx


@pytest.mark.parametrize(
    "base",
    [
        FitConfig(num_iter=6),  # exact schedule (full pass every iter)
        FitConfig(num_iter=12, refresh_every=4, refresh_warmup=2),
        FitConfig(num_iter=12, refresh_every=4, refresh_warmup=2,
                  sdf_warmup_gathers=True),
        FitConfig(num_iter=12, refresh_every=4, refresh_warmup=2,
                  cheap_collision_verts=48),
    ],
    ids=["exact", "refresh", "warmup_gathers", "vertex_subset"],
)
def test_chunked_matches_batched(small_world, base):
    assets, x72, cam_ext, scene_idx = small_world
    f1 = make_fit_step(assets, dataclasses.replace(base, overlap_chunks=1))
    f2 = make_fit_step(assets, dataclasses.replace(base, overlap_chunks=2))
    o1, m1, h1 = f1(x72, cam_ext, scene_idx)
    o2, m2, h2 = f2(x72, cam_ext, scene_idx)
    # float-reassociation drift only: regrouping the batch dim changes
    # op tiling, and Adam's g/sqrt(v) amplifies near-zero-grad rounding
    # flips over the iterations (measured ~2e-5..9e-5 at these shapes)
    np.testing.assert_allclose(np.asarray(o1), np.asarray(o2), atol=5e-4, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(h1), np.asarray(h2), atol=1e-3, rtol=1e-3)
    # final metrics run at full-population semantics in both cases
    np.testing.assert_allclose(
        np.asarray(m1["total"]), np.asarray(m2["total"]), atol=5e-4, rtol=1e-3
    )


def test_nondividing_chunks_fall_back(small_world):
    assets, x72, cam_ext, scene_idx = small_world
    base = FitConfig(num_iter=4)
    f1 = make_fit_step(assets, base)
    f3 = make_fit_step(assets, dataclasses.replace(base, overlap_chunks=3))  # 8 % 3 != 0
    o1, _, _ = f1(x72, cam_ext, scene_idx)
    o3, _, _ = f3(x72, cam_ext, scene_idx)
    np.testing.assert_allclose(np.asarray(o1), np.asarray(o3), atol=0, rtol=0)


def test_four_chunks(small_world):
    assets, x72, cam_ext, scene_idx = small_world
    base = FitConfig(num_iter=8, refresh_every=4, refresh_warmup=2)
    f1 = make_fit_step(assets, base)
    f4 = make_fit_step(assets, dataclasses.replace(base, overlap_chunks=4))
    o1, _, _ = f1(x72, cam_ext, scene_idx)
    o4, _, _ = f4(x72, cam_ext, scene_idx)
    np.testing.assert_allclose(np.asarray(o1), np.asarray(o4), atol=1e-5, rtol=1e-5)
