"""Kernel tests: Chamfer (Pallas vs jnp reference vs torch-style check),
SDF trilinear sampling (vs torch F.grid_sample), bilinear resize (vs
torch F.interpolate). Mirrors the reference's dual-implementation test
pattern (chamfer_pytorch/test_chamfer.py)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from psi_tpu.ops import (
    chamfer_distance,
    chamfer_distance_reference,
    chamfer_with_idx,
    sdf_trilinear,
    grid_sample_3d,
    resize_bilinear,
)
from psi_tpu.ops.sdf import sdf_penetration_loss

torch = pytest.importorskip("torch")
import torch.nn.functional as tF


# ---------------------------------------------------------------------------
# Chamfer
# ---------------------------------------------------------------------------


def _brute_force_np(x, y):
    d = ((x[:, :, None, :] - y[:, None, :, :]) ** 2).sum(-1)
    return d.min(2), d.min(1)


def test_chamfer_reference_matches_brute_force(rng):
    x = rng.normal(size=(4, 100, 3)).astype(np.float32)
    y = rng.normal(size=(4, 130, 3)).astype(np.float32)
    d1, d2, i1, i2 = chamfer_distance_reference(jnp.asarray(x), jnp.asarray(y))
    e1, e2 = _brute_force_np(x, y)
    # reference tolerance: sum of squared error < 1e-8 (test_chamfer.py:51-55)
    assert float(((np.asarray(d1) - e1) ** 2).sum()) < 1e-8
    assert float(((np.asarray(d2) - e2) ** 2).sum()) < 1e-8


def test_chamfer_pallas_matches_reference(rng):
    """The split-bf16 argmin may pick a near-tied rival neighbor (d' error
    ~5e-4); the distance is recomputed exactly for whichever index won,
    so any deviation is bounded by the tie gap."""
    x = rng.normal(size=(2, 300, 3)).astype(np.float32)
    y = rng.normal(size=(2, 700, 3)).astype(np.float32)
    d1r, d2r, i1r, i2r = chamfer_with_idx(jnp.asarray(x), jnp.asarray(y), implementation="reference")
    d1p, d2p, i1p, i2p = chamfer_with_idx(jnp.asarray(x), jnp.asarray(y), implementation="pallas")
    np.testing.assert_allclose(np.asarray(d1p), np.asarray(d1r), atol=1e-3)
    np.testing.assert_allclose(np.asarray(d2p), np.asarray(d2r), atol=1e-3)
    # indices agree except possibly at near-ties
    mm1 = np.asarray(i1p) != np.asarray(i1r)
    assert mm1.mean() < 0.01
    if mm1.any():
        np.testing.assert_allclose(np.asarray(d1p)[mm1], np.asarray(d1r)[mm1], atol=1e-3)


def test_chamfer_pallas_ragged_sizes(rng):
    # sizes not multiples of the tile sizes, M < TILE_M
    x = rng.normal(size=(1, 37, 3)).astype(np.float32)
    y = rng.normal(size=(1, 41, 3)).astype(np.float32)
    d1r, d2r, _, _ = chamfer_with_idx(jnp.asarray(x), jnp.asarray(y), implementation="reference")
    d1p, d2p, _, _ = chamfer_with_idx(jnp.asarray(x), jnp.asarray(y), implementation="pallas")
    np.testing.assert_allclose(np.asarray(d1p), np.asarray(d1r), atol=1e-4)
    np.testing.assert_allclose(np.asarray(d2p), np.asarray(d2r), atol=1e-4)


def test_chamfer_gradient_matches_torch(rng):
    """Double-sided gradient parity with autograd through the torch
    brute-force chamfer (the semantics of chamfer.cu:155-185)."""
    x = rng.normal(size=(2, 50, 3)).astype(np.float32)
    y = rng.normal(size=(2, 60, 3)).astype(np.float32)

    xt = torch.tensor(x, requires_grad=True)
    yt = torch.tensor(y, requires_grad=True)
    d = ((xt[:, :, None, :] - yt[:, None, :, :]) ** 2).sum(-1)
    d1t = d.min(2).values
    d2t = d.min(1).values
    loss_t = d1t.sum() + 0.5 * d2t.sum()
    loss_t.backward()

    def loss_fn(xj, yj):
        d1, d2 = chamfer_distance(xj, yj, implementation="reference")
        return jnp.sum(d1) + 0.5 * jnp.sum(d2)

    gx, gy = jax.grad(loss_fn, argnums=(0, 1))(jnp.asarray(x), jnp.asarray(y))
    np.testing.assert_allclose(np.asarray(gx), xt.grad.numpy(), atol=1e-4)
    np.testing.assert_allclose(np.asarray(gy), yt.grad.numpy(), atol=1e-4)


def test_chamfer_identical_clouds_zero(rng):
    x = rng.normal(size=(1, 64, 3)).astype(np.float32)
    d1, d2 = chamfer_distance(jnp.asarray(x), jnp.asarray(x), implementation="reference")
    np.testing.assert_allclose(np.asarray(d1), 0.0, atol=1e-5)
    np.testing.assert_allclose(np.asarray(d2), 0.0, atol=1e-5)


# ---------------------------------------------------------------------------
# SDF trilinear
# ---------------------------------------------------------------------------


def test_grid_sample_3d_matches_torch(rng):
    B, D, H, W, N = 2, 9, 11, 13, 200
    grid = rng.normal(size=(B, D, H, W)).astype(np.float32)
    coords = rng.uniform(-1.4, 1.4, size=(B, N, 3)).astype(np.float32)  # incl. out-of-range

    out = np.asarray(grid_sample_3d(jnp.asarray(grid), jnp.asarray(coords)))

    tg = torch.tensor(grid).unsqueeze(1)  # [B,1,D,H,W]
    tc = torch.tensor(coords).view(B, N, 1, 1, 3)
    ref = tF.grid_sample(tg, tc, padding_mode="border", align_corners=False)
    ref = ref.view(B, N).numpy()
    np.testing.assert_allclose(out, ref, atol=1e-5)


def test_sdf_trilinear_matches_reference_chain(rng):
    """Fused op == the reference's normalize -> zyx flip -> grid_sample chain
    (train_s1.py:180-198)."""
    B, dim, N = 2, 16, 150
    sdf = rng.normal(size=(B, dim, dim, dim)).astype(np.float32)
    gmin = rng.uniform(-3, -1, size=(B, 3)).astype(np.float32)
    gmax = rng.uniform(1, 3, size=(B, 3)).astype(np.float32)
    pts = rng.uniform(-3.5, 3.5, size=(B, N, 3)).astype(np.float32)

    out = np.asarray(sdf_trilinear(jnp.asarray(sdf), jnp.asarray(pts), jnp.asarray(gmin), jnp.asarray(gmax)))

    # torch transcription of the reference chain
    tsdf = torch.tensor(sdf)
    tpts = torch.tensor(pts)
    tmin = torch.tensor(gmin).unsqueeze(1)
    tmax = torch.tensor(gmax).unsqueeze(1)
    norm = (tpts - tmin) / (tmax - tmin) * 2 - 1
    ref = tF.grid_sample(
        tsdf.unsqueeze(1),
        norm[:, :, [2, 1, 0]].view(-1, N, 1, 1, 3),
        padding_mode="border",
        align_corners=False,
    ).view(B, N).numpy()
    np.testing.assert_allclose(out, ref, atol=1e-5)


def test_sdf_trilinear_gradient_finite(rng):
    B, dim, N = 1, 8, 20
    sdf = rng.normal(size=(B, dim, dim, dim)).astype(np.float32)
    gmin = np.full((B, 3), -1.0, np.float32)
    gmax = np.full((B, 3), 1.0, np.float32)
    pts = rng.uniform(-1.5, 1.5, size=(B, N, 3)).astype(np.float32)

    def f(p):
        return jnp.sum(sdf_trilinear(jnp.asarray(sdf), p, jnp.asarray(gmin), jnp.asarray(gmax)))

    g = np.asarray(jax.grad(f)(jnp.asarray(pts)))
    assert np.all(np.isfinite(g))
    # points far outside the grid have zero gradient (border clamp)
    far = jnp.asarray(np.full((B, N, 3), 10.0, np.float32))
    gfar = np.asarray(jax.grad(f)(far))
    np.testing.assert_allclose(gfar, 0.0)


def test_sdf_penetration_loss_semantics(rng):
    # matches body_sdf[body_sdf < 0].abs().mean(), 0-if-none branch
    v = np.array([[-1.0, 2.0, -3.0, 0.5]], np.float32)
    out = float(sdf_penetration_loss(jnp.asarray(v)))
    assert abs(out - 2.0) < 1e-6
    v2 = np.array([[1.0, 2.0]], np.float32)
    assert float(sdf_penetration_loss(jnp.asarray(v2))) == 0.0


# ---------------------------------------------------------------------------
# Bilinear resize
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("shape,target", [((60, 80), (128, 96)), ((100, 50), (64, 128)), ((128, 128), (30, 40))])
def test_resize_bilinear_matches_torch(rng, shape, target):
    img = rng.normal(size=shape).astype(np.float32)
    out = np.asarray(resize_bilinear(jnp.asarray(img), *target))
    ref = tF.interpolate(
        torch.tensor(img).view(1, 1, *shape), size=target, mode="bilinear", align_corners=False
    ).view(*target).numpy()
    np.testing.assert_allclose(out, ref, atol=1e-5)


def test_chamfer_one_sided_nn_matches_one_sided(rng):
    """chamfer_one_sided_nn: same distances and same x-gradient as
    chamfer_one_sided; y_nn is the true NN point and carries no gradient
    (the frozen-correspondence carry for the fit refresh schedule)."""
    from psi_tpu.ops.chamfer import chamfer_one_sided, chamfer_one_sided_nn

    x = jnp.asarray(rng.normal(size=(3, 50, 3)).astype(np.float32))
    y = jnp.asarray(rng.normal(size=(3, 80, 3)).astype(np.float32))

    d_ref = chamfer_one_sided(x, y)
    d_nn, y_nn = chamfer_one_sided_nn(x, y)
    # d_ref comes from the |x|^2+|y|^2-2xy expansion, d_nn from the
    # subtract-square at the winner: equal up to f32 rounding
    np.testing.assert_allclose(np.asarray(d_nn), np.asarray(d_ref), rtol=2e-4, atol=1e-6)
    # y_nn really is the nearest neighbour
    np.testing.assert_allclose(
        np.asarray(jnp.sum((x - y_nn) ** 2, -1)), np.asarray(d_nn), rtol=1e-6, atol=1e-7
    )

    def loss_ref(x_):
        return jnp.sum(jnp.sqrt(chamfer_one_sided(x_, y) + 1e-4))

    def loss_nn(x_):
        return jnp.sum(jnp.sqrt(chamfer_one_sided_nn(x_, y)[0] + 1e-4))

    g_ref = jax.grad(loss_ref)(x)
    g_nn = jax.grad(loss_nn)(x)
    np.testing.assert_allclose(np.asarray(g_nn), np.asarray(g_ref), rtol=1e-4, atol=1e-5)

    # no gradient leaks into y through y_nn (the scene cloud is constant
    # in every PSI objective)
    gy = jax.grad(lambda y_: jnp.sum(chamfer_one_sided_nn(x, y_)[0]))(y)
    # grads flow only via the recomputed distance's y_nn... which is
    # stop_gradient: dL/dy must be exactly zero
    assert float(jnp.abs(gy).max()) == 0.0
