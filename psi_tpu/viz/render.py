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


def rasterize_mesh(
    verts: jax.Array,
    faces: jax.Array,
    labels: jax.Array,
    cam_int: jax.Array,
    height: int,
    width: int,
    cam_ext: Optional[jax.Array] = None,
    tile: int = 64,
    tri_chunk: int = 512,
    max_depth: float = 20.0,
) -> Tuple[jax.Array, jax.Array]:
    """True z-buffer triangle rasterization -> (depth [H, W], seg [H, W]).

    TPU-shaped: the image is processed in static (tile x tile) blocks;
    for each block all triangles stream through in chunks, evaluating
    edge functions for every (pixel, triangle) pair as dense [tile^2,
    chunk] VPU work, with the same packed (depth, label) int32 min-key
    trick as the splatter. Cost O(H*W*F) — a few GFLOP at PROX scales,
    trivially parallel; no holes, unlike point splatting.

    faces: [F, 3] int32; labels: per-vertex [V] (face label = vertex 0's).
    """
    verts = jnp.asarray(verts, jnp.float32)
    uv, z = project_points(verts, cam_int, cam_ext)
    # screen-space triangle vertices
    tri = faces.astype(jnp.int32)
    xy = uv[tri]  # [F, 3, 2]
    zz = z[tri]  # [F, 3]
    tri_label = jnp.clip(labels[tri[:, 0]].astype(jnp.int32), 0, 2**_LABEL_BITS - 1)

    n_f = tri.shape[0]
    pad_f = (-n_f) % tri_chunk
    if pad_f:
        xy = jnp.concatenate([xy, jnp.full((pad_f, 3, 2), -1e6, jnp.float32)], axis=0)
        zz = jnp.concatenate([zz, jnp.ones((pad_f, 3), jnp.float32)], axis=0)
        tri_label = jnp.concatenate([tri_label, jnp.zeros((pad_f,), jnp.int32)], axis=0)
    n_chunks = xy.shape[0] // tri_chunk

    tiles_y = -(-height // tile)
    tiles_x = -(-width // tile)
    px_local = jax.lax.broadcasted_iota(jnp.float32, (tile, tile), 1)
    py_local = jax.lax.broadcasted_iota(jnp.float32, (tile, tile), 0)

    x0, y0 = xy[:, 0, 0], xy[:, 0, 1]
    x1, y1 = xy[:, 1, 0], xy[:, 1, 1]
    x2, y2 = xy[:, 2, 0], xy[:, 2, 1]
    area = (x1 - x0) * (y2 - y0) - (x2 - x0) * (y1 - y0)  # [Fp]
    valid_tri = (jnp.abs(area) > 1e-9) & jnp.all(zz > 1e-3, axis=1)
    inv_area = jnp.where(valid_tri, 1.0 / jnp.where(jnp.abs(area) > 1e-9, area, 1.0), 0.0)

    def render_tile(ty, tx):
        px = px_local + tx * tile  # [tile, tile]
        py = py_local + ty * tile
        pxf = px.reshape(-1, 1)  # [P, 1]
        pyf = py.reshape(-1, 1)

        def chunk_body(ci, best):
            sl = lambda a: jax.lax.dynamic_slice_in_dim(a, ci * tri_chunk, tri_chunk)
            cx0, cy0, cx1, cy1, cx2, cy2 = sl(x0), sl(y0), sl(x1), sl(y1), sl(x2), sl(y2)
            cz = jax.lax.dynamic_slice_in_dim(zz, ci * tri_chunk, tri_chunk)
            cl = sl(tri_label)
            cia = sl(inv_area)
            cval = sl(valid_tri)
            # barycentric weights via edge functions [P, C]
            w0 = ((cx1 - pxf) * (cy2 - pyf) - (cx2 - pxf) * (cy1 - pyf)) * cia
            w1 = ((cx2 - pxf) * (cy0 - pyf) - (cx0 - pxf) * (cy2 - pyf)) * cia
            w2 = 1.0 - w0 - w1
            inside = (w0 >= 0) & (w1 >= 0) & (w2 >= 0) & cval[None, :]
            zi = w0 * cz[:, 0] + w1 * cz[:, 1] + w2 * cz[:, 2]  # [P, C]
            zq = jnp.clip((zi * _DEPTH_SCALE), 0, max_depth * _DEPTH_SCALE).astype(jnp.int32)
            key = jnp.where(inside & (zi > 1e-3), (zq << _LABEL_BITS) | cl[None, :], _BIG)
            return jnp.minimum(best, jnp.min(key, axis=1))

        best = jnp.full((tile * tile,), _BIG, jnp.int32)
        best = jax.lax.fori_loop(0, n_chunks, chunk_body, best)
        return best.reshape(tile, tile)

    rows = []
    for ty in range(tiles_y):
        cols = [render_tile(ty, tx) for tx in range(tiles_x)]
        rows.append(jnp.concatenate(cols, axis=1))
    buf = jnp.concatenate(rows, axis=0)[:height, :width]

    hit = buf < _BIG
    depth = jnp.where(hit, (buf >> _LABEL_BITS).astype(jnp.float32) / _DEPTH_SCALE, 0.0)
    seg = jnp.where(hit, (buf & (2**_LABEL_BITS - 1)).astype(jnp.float32), 0.0)
    return depth, seg


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
