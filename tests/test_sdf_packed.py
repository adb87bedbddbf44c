"""Corner-packed SDF lookup == the 8-gather reference path."""

import numpy as np
import jax
import jax.numpy as jnp

from psi_tpu.ops.sdf import (
    pack_sdf_corners,
    sdf_trilinear_packed,
    sdf_trilinear_stacked,
)


def test_packed_matches_stacked(rng):
    S, D, N, B = 3, 12, 200, 4
    sdf = rng.normal(size=(S, D, D, D)).astype(np.float32)
    mins = np.tile(np.array([-2, -2, 0], np.float32), (S, 1)) + rng.normal(0, 0.1, (S, 3)).astype(np.float32)
    maxs = np.tile(np.array([2, 2, 4], np.float32), (S, 1)) + rng.normal(0, 0.1, (S, 3)).astype(np.float32)
    pts = rng.uniform(-2.5, 4.5, size=(B, N, 3)).astype(np.float32)
    sidx = rng.integers(0, S, B).astype(np.int32)

    ref = sdf_trilinear_stacked(jnp.asarray(sdf), jnp.asarray(sidx), jnp.asarray(pts),
                                jnp.asarray(mins), jnp.asarray(maxs))
    packed = pack_sdf_corners(jnp.asarray(sdf))
    out = sdf_trilinear_packed(packed, jnp.asarray(sidx), jnp.asarray(pts),
                               jnp.asarray(mins), jnp.asarray(maxs))
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)


def test_packed_gradient_matches(rng):
    S, D, N = 1, 8, 50
    sdf = rng.normal(size=(S, D, D, D)).astype(np.float32)
    mins = np.full((S, 3), -1.0, np.float32)
    maxs = np.full((S, 3), 1.0, np.float32)
    pts = rng.uniform(-1.2, 1.2, size=(1, N, 3)).astype(np.float32)
    packed = pack_sdf_corners(jnp.asarray(sdf))
    sidx = jnp.zeros(1, jnp.int32)

    g_ref = jax.grad(lambda p: jnp.sum(sdf_trilinear_stacked(
        jnp.asarray(sdf), sidx, p, jnp.asarray(mins), jnp.asarray(maxs))))(jnp.asarray(pts))
    g_new = jax.grad(lambda p: jnp.sum(sdf_trilinear_packed(
        packed, sidx, p, jnp.asarray(mins), jnp.asarray(maxs))))(jnp.asarray(pts))
    np.testing.assert_allclose(np.asarray(g_new), np.asarray(g_ref), atol=1e-4)


def test_packed_bf16_storage(rng):
    S, D, N = 1, 8, 64
    sdf = rng.normal(size=(S, D, D, D)).astype(np.float32)
    packed = pack_sdf_corners(jnp.asarray(sdf)).astype(jnp.bfloat16)
    mins = jnp.full((S, 3), -1.0)
    maxs = jnp.full((S, 3), 1.0)
    pts = jnp.asarray(rng.uniform(-1, 1, size=(1, N, 3)).astype(np.float32))
    out = sdf_trilinear_packed(packed, jnp.zeros(1, jnp.int32), pts, mins, maxs)
    ref = sdf_trilinear_stacked(jnp.asarray(sdf), jnp.zeros(1, jnp.int32), pts, mins, maxs)
    np.testing.assert_allclose(np.asarray(out, np.float32), np.asarray(ref), atol=2e-2)
