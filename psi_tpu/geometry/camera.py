"""Camera-aware transforms of the global body translation and vertices.

TPU-native equivalents of the reference's ``GeometryTransformer`` statics
(reference: source/cvae.py:97-199). Pure jnp, batched, differentiable.

The perspective normalization maps the metric camera-frame translation
T=(X, Y, Z) to a [-1, 1]-ish box: (x, y) are the normalized image-plane
projection scaled by 1/max(px, py), z is depth linearly scaled by the
scene's maximum depth. ``recover_global_T`` is the exact inverse.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _intrinsics_scale(cam_int: jax.Array):
    """fx, fy, and the reference's s_ = 1/max(px, py) per batch element."""
    fx = cam_int[..., 0, 0]
    fy = cam_int[..., 1, 1]
    px = cam_int[..., 0, 2]
    py = cam_int[..., 1, 2]
    s = 1.0 / jnp.maximum(px, py)
    return fx, fy, s


def normalize_global_T(x: jax.Array, cam_int: jax.Array, max_depth: jax.Array) -> jax.Array:
    """Perspective-normalize the leading 3 translation dims of a body vector.

    x: [B, D] body vector, x[:, :3] is the camera-frame translation.
    cam_int: [B, 3, 3] camera intrinsics.
    max_depth: [B] maximum scene depth.
    Mirrors reference source/cvae.py:176-199.
    """
    t = x[..., :3]
    rest = x[..., 3:]
    fx, fy, s = _intrinsics_scale(cam_int)
    z_raw = t[..., 2]
    nx = s * t[..., 0] * fx / (z_raw + 1e-6)
    ny = s * t[..., 1] * fy / (z_raw + 1e-6)
    nz = 2.0 * z_raw / max_depth - 1.0
    return jnp.concatenate([jnp.stack([nx, ny, nz], axis=-1), rest], axis=-1)


def recover_global_T(x: jax.Array, cam_int: jax.Array, max_depth: jax.Array) -> jax.Array:
    """Inverse of normalize_global_T (reference source/cvae.py:152-172)."""
    t = x[..., :3]
    rest = x[..., 3:]
    fx, fy, s = _intrinsics_scale(cam_int)
    z = (t[..., 2] + 1.0) / 2.0 * max_depth
    X = t[..., 0] * z / s / fx
    Y = t[..., 1] * z / s / fy
    return jnp.concatenate([jnp.stack([X, Y, z], axis=-1), rest], axis=-1)


def verts_transform(verts: jax.Array, cam_ext: jax.Array) -> jax.Array:
    """Apply homogeneous 4x4 extrinsics to a batch of vertex clouds.

    verts: [B, V, 3], cam_ext: [B, 4, 4] -> [B, V, 3].
    Mirrors reference source/cvae.py:141-149 (pad with 1, right-multiply
    by cam_ext^T, drop the homogeneous coordinate).
    """
    ones = jnp.ones(verts.shape[:-1] + (1,), dtype=verts.dtype)
    homo = jnp.concatenate([verts, ones], axis=-1)  # [B, V, 4]
    out = jnp.einsum("bvi,bji->bvj", homo, cam_ext)
    return out[..., :3]
