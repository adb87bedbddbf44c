"""TPU-native software renderer: pinhole projection + z-buffer splatting.

Replaces the reference's Open3D offscreen capture (used for scene
depth/semantics snapshot rendering, utils_prox_snapshots_*.py, and the
result viewers) with a dependency-free scatter-min z-buffer:

* points project through the pinhole intrinsics;
* each point splats into a (2r+1)^2 pixel neighborhood;
* per pixel, an int32 key packs (quantized depth, semantic label) so a
  single scatter-min resolves both the depth buffer and the winning
  label — no atomics, maps straight to XLA's scatter-min on TPU.

Meshes are densified on host with ``upsample_mesh`` (midpoint 1->4
subdivision) until point splatting covers the surface at the target
resolution.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

_LABEL_BITS = 6  # labels < 64 (mpcat40 has 42)
_DEPTH_SCALE = 1000.0  # mm quantization for the packed z-buffer key
_BIG = jnp.int32(2**30)


def upsample_mesh(verts: np.ndarray, faces: np.ndarray, iterations: int = 1) -> Tuple[np.ndarray, np.ndarray]:
    """Midpoint subdivision (each triangle -> 4). Host-side, one-time."""
    verts = np.asarray(verts, np.float64)
    faces = np.asarray(faces, np.int64)
    for _ in range(iterations):
        edges = np.concatenate([faces[:, [0, 1]], faces[:, [1, 2]], faces[:, [2, 0]]], axis=0)
        edges = np.sort(edges, axis=1)
        uniq, inv = np.unique(edges, axis=0, return_inverse=True)
        mid = verts[uniq].mean(axis=1)
        mid_idx = len(verts) + np.arange(len(uniq))
        verts = np.concatenate([verts, mid], axis=0)
        f = faces.shape[0]
        m01 = mid_idx[inv[:f]]
        m12 = mid_idx[inv[f : 2 * f]]
        m20 = mid_idx[inv[2 * f :]]
        faces = np.concatenate(
            [
                np.stack([faces[:, 0], m01, m20], 1),
                np.stack([faces[:, 1], m12, m01], 1),
                np.stack([faces[:, 2], m20, m12], 1),
                np.stack([m01, m12, m20], 1),
            ],
            axis=0,
        )
    return verts, faces


def project_points(
    verts: jax.Array, cam_int: jax.Array, cam_ext: Optional[jax.Array] = None
) -> Tuple[jax.Array, jax.Array]:
    """World points [N, 3] -> (pixel uv [N, 2], camera-frame depth [N]).

    cam_ext is world->camera [4, 4]; intrinsics use the +z-forward
    pinhole convention of the PROX snapshots."""
    if cam_ext is not None:
        verts = verts @ cam_ext[:3, :3].T + cam_ext[:3, 3]
    z = verts[:, 2]
    fx, fy = cam_int[0, 0], cam_int[1, 1]
    px, py = cam_int[0, 2], cam_int[1, 2]
    u = verts[:, 0] * fx / jnp.where(z > 1e-6, z, 1e-6) + px
    v = verts[:, 1] * fy / jnp.where(z > 1e-6, z, 1e-6) + py
    return jnp.stack([u, v], axis=1), z


def render_depth_semantics(
    verts: jax.Array,
    labels: jax.Array,
    cam_int: jax.Array,
    height: int,
    width: int,
    cam_ext: Optional[jax.Array] = None,
    splat_radius: int = 1,
    max_depth: float = 20.0,
) -> Tuple[jax.Array, jax.Array]:
    """Splat labeled world points to (depth [H, W], seg [H, W]).

    Pixels with no points get depth 0 and label 0 (the reference's
    empty-canvas convention)."""
    uv, z = project_points(verts, cam_int, cam_ext)
    ui = jnp.round(uv[:, 0]).astype(jnp.int32)
    vi = jnp.round(uv[:, 1]).astype(jnp.int32)
    zq = jnp.clip((z * _DEPTH_SCALE).astype(jnp.int32), 0, int(max_depth * _DEPTH_SCALE))
    key_base = (zq << _LABEL_BITS) | jnp.clip(labels.astype(jnp.int32), 0, 2**_LABEL_BITS - 1)

    buf = jnp.full((height * width,), _BIG, jnp.int32)
    for dy in range(-splat_radius, splat_radius + 1):
        for dx in range(-splat_radius, splat_radius + 1):
            x = ui + dx
            y = vi + dy
            valid = (x >= 0) & (x < width) & (y >= 0) & (y < height) & (z > 1e-3)
            flat = jnp.where(valid, y * width + x, 0)
            key = jnp.where(valid, key_base, _BIG)
            buf = buf.at[flat].min(key)

    hit = buf < _BIG
    depth = jnp.where(hit, (buf >> _LABEL_BITS).astype(jnp.float32) / _DEPTH_SCALE, 0.0)
    seg = jnp.where(hit, (buf & (2**_LABEL_BITS - 1)).astype(jnp.float32), 0.0)
    return depth.reshape(height, width), seg.reshape(height, width)
