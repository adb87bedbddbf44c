"""Geometry core tests: rotation codecs and camera transforms.

Parity targets (reference semantics):
* 6D <-> matrix <-> axis-angle round trips (source/cvae.py:36-137)
* normalize_global_T o recover_global_T == identity (source/cvae.py:152-199)
* verts_transform against a plain numpy homogeneous transform
  (source/cvae.py:141-149)
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from psi_tpu.geometry import (
    aa_to_matrix,
    matrix_to_aa,
    aa_to_rot6d,
    rot6d_to_aa,
    rot6d_to_matrix,
    matrix_to_rot6d,
    normalize_global_T,
    recover_global_T,
    verts_transform,
    convert_to_6D_rot,
    convert_to_3D_rot,
    body_params_encapsulate,
    body_params_parse,
)


def random_aa(rng, n, max_angle=np.pi - 0.05):
    axis = rng.normal(size=(n, 3))
    axis /= np.linalg.norm(axis, axis=-1, keepdims=True)
    angle = rng.uniform(1e-4, max_angle, size=(n, 1))
    return (axis * angle).astype(np.float32)


def test_aa_matrix_roundtrip(rng):
    aa = random_aa(rng, 256)
    R = aa_to_matrix(jnp.asarray(aa))
    # orthonormality & det 1
    eye = jnp.einsum("bij,bkj->bik", R, R)
    np.testing.assert_allclose(np.asarray(eye), np.tile(np.eye(3), (256, 1, 1)), atol=1e-5)
    np.testing.assert_allclose(np.asarray(jnp.linalg.det(R)), 1.0, atol=1e-5)
    aa2 = matrix_to_aa(R)
    np.testing.assert_allclose(np.asarray(aa2), aa, atol=1e-4)


def test_aa_matrix_small_angles(rng):
    aa = rng.normal(size=(64, 3)).astype(np.float32) * 1e-5
    R = aa_to_matrix(jnp.asarray(aa))
    aa2 = matrix_to_aa(R)
    np.testing.assert_allclose(np.asarray(aa2), aa, atol=1e-6)
    # gradient is finite at zero
    g = jax.grad(lambda a: jnp.sum(aa_to_matrix(a)))(jnp.zeros((1, 3)))
    assert np.all(np.isfinite(np.asarray(g)))


def test_aa_matrix_near_pi(rng):
    axis = rng.normal(size=(64, 3))
    axis /= np.linalg.norm(axis, axis=-1, keepdims=True)
    aa = (axis * (np.pi - 1e-4)).astype(np.float32)
    R = aa_to_matrix(jnp.asarray(aa))
    aa2 = np.asarray(matrix_to_aa(R))
    # axis-angle is only defined up to sign at pi; compare rotations
    R2 = np.asarray(aa_to_matrix(jnp.asarray(aa2)))
    np.testing.assert_allclose(R2, np.asarray(R), atol=1e-3)


def test_rot6d_roundtrip(rng):
    aa = random_aa(rng, 256)
    R = aa_to_matrix(jnp.asarray(aa))
    x6 = matrix_to_rot6d(R)
    R2 = rot6d_to_matrix(x6)
    np.testing.assert_allclose(np.asarray(R2), np.asarray(R), atol=1e-5)
    aa2 = rot6d_to_aa(aa_to_rot6d(jnp.asarray(aa)))
    np.testing.assert_allclose(np.asarray(aa2), aa, atol=1e-4)


def test_rot6d_layout_matches_reference(rng):
    """The 6D vector is mat[:, :, :2] flattened row-major (cvae.py:123-124)."""
    aa = random_aa(rng, 8)
    R = np.asarray(aa_to_matrix(jnp.asarray(aa)))
    x6 = np.asarray(aa_to_rot6d(jnp.asarray(aa)))
    expected = R[:, :, :2].reshape(8, 6)
    np.testing.assert_allclose(x6, expected, atol=1e-6)


def test_rot6d_gram_schmidt_on_noisy_input(rng):
    x6 = rng.normal(size=(32, 6)).astype(np.float32)
    R = rot6d_to_matrix(jnp.asarray(x6))
    eye = jnp.einsum("bij,bkj->bik", R, R)
    np.testing.assert_allclose(np.asarray(eye), np.tile(np.eye(3), (32, 1, 1)), atol=1e-5)
    np.testing.assert_allclose(np.asarray(jnp.linalg.det(R)), 1.0, atol=1e-5)


def _random_cam_int(rng, n):
    cam = np.zeros((n, 3, 3), dtype=np.float32)
    cam[:, 0, 0] = rng.uniform(400, 1200, n)  # fx
    cam[:, 1, 1] = rng.uniform(400, 1200, n)  # fy
    cam[:, 0, 2] = rng.uniform(200, 600, n)  # px
    cam[:, 1, 2] = rng.uniform(200, 600, n)  # py
    cam[:, 2, 2] = 1.0
    return cam


def test_normalize_recover_global_T_inverse(rng):
    n = 64
    x = rng.normal(size=(n, 75)).astype(np.float32)
    x[:, 2] = rng.uniform(0.5, 5.5, n)  # positive depth
    cam = _random_cam_int(rng, n)
    max_d = rng.uniform(4.0, 8.0, n).astype(np.float32)
    xn = normalize_global_T(jnp.asarray(x), jnp.asarray(cam), jnp.asarray(max_d))
    xr = recover_global_T(xn, jnp.asarray(cam), jnp.asarray(max_d))
    np.testing.assert_allclose(np.asarray(xr), x, rtol=1e-4, atol=1e-4)
    # non-translation dims untouched
    np.testing.assert_array_equal(np.asarray(xn)[:, 3:], x[:, 3:])


def test_normalize_global_T_formula(rng):
    """Check the exact formula against a numpy transcription (cvae.py:176-199)."""
    n = 16
    x = rng.normal(size=(n, 72)).astype(np.float32)
    x[:, 2] = rng.uniform(0.5, 5.5, n)
    cam = _random_cam_int(rng, n)
    max_d = rng.uniform(4.0, 8.0, n).astype(np.float32)
    out = np.asarray(normalize_global_T(jnp.asarray(x), jnp.asarray(cam), jnp.asarray(max_d)))
    s = 1.0 / np.maximum(cam[:, 0, 2], cam[:, 1, 2])
    np.testing.assert_allclose(out[:, 0], s * x[:, 0] * cam[:, 0, 0] / (x[:, 2] + 1e-6), rtol=1e-5)
    np.testing.assert_allclose(out[:, 1], s * x[:, 1] * cam[:, 1, 1] / (x[:, 2] + 1e-6), rtol=1e-5)
    np.testing.assert_allclose(out[:, 2], 2 * x[:, 2] / max_d - 1, rtol=1e-5)


def test_verts_transform(rng):
    B, V = 4, 100
    verts = rng.normal(size=(B, V, 3)).astype(np.float32)
    ext = np.tile(np.eye(4, dtype=np.float32), (B, 1, 1))
    # random rigid transforms
    from psi_tpu.geometry import aa_to_matrix as a2m

    Rm = np.asarray(a2m(jnp.asarray(random_aa(rng, B))))
    ext[:, :3, :3] = Rm
    ext[:, :3, 3] = rng.normal(size=(B, 3))
    out = np.asarray(verts_transform(jnp.asarray(verts), jnp.asarray(ext)))
    expected = np.einsum("bij,bvj->bvi", Rm, verts) + ext[:, None, :3, 3]
    np.testing.assert_allclose(out, expected, atol=1e-5)


def test_convert_6d_3d_roundtrip(rng):
    x72 = rng.normal(size=(16, 72)).astype(np.float32)
    x72[:, 3:6] = random_aa(rng, 16)
    x75 = convert_to_6D_rot(jnp.asarray(x72))
    assert x75.shape == (16, 75)
    back = np.asarray(convert_to_3D_rot(x75))
    np.testing.assert_allclose(back, x72, atol=1e-4)


def test_body_params_encapsulate_parse_roundtrip(rng):
    x = rng.normal(size=(8, 72)).astype(np.float32)
    d = body_params_encapsulate(jnp.asarray(x))
    assert d["transl"].shape == (8, 3)
    assert d["betas"].shape == (8, 10)
    assert d["body_pose_vp"].shape == (8, 32)
    assert d["left_hand_pose"].shape == (8, 12)
    back = np.asarray(body_params_parse(d))
    np.testing.assert_array_equal(back, x)
    # 'body_pose' alias used by reference pickles
    d2 = {("body_pose" if k == "body_pose_vp" else k): v for k, v in d.items()}
    back2 = np.asarray(body_params_parse(d2))
    np.testing.assert_array_equal(back2, x)
