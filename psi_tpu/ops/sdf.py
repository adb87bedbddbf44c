"""Trilinear SDF sampling — the scene-collision hot op.

The reference computes, inline at five call sites (train_s1.py:180-198,
train_s2.py:181-196, fitting_proxe.py:143-158, fitting_habitat.py:144-159,
utils_eval_collision_habitat.py:121-138):

    norm = (verts - grid_min) / (grid_max - grid_min) * 2 - 1
    sdf  = F.grid_sample(grid[:,None], norm[:,:,[2,1,0]].view(-1,V,1,1,3),
                         padding_mode='border')          # align_corners=False

Here the normalize + zyx flip + trilinear interpolation is one fused
function over the raw world-space vertices. ``grid_sample_3d`` exposes
the exact torch semantics (align_corners=False, border padding) for
parity testing; ``sdf_trilinear`` is the fused user-facing op.

Design note (TPU): the SDF grid (dim^3 floats, up to ~256MB across
scenes) lives in HBM once per scene; the 8-corner fetch is an XLA
gather over a flattened grid — bandwidth-bound and already optimal; the
surrounding arithmetic (normalize, lerp) fuses into the gather's
consumer. Everything is differentiable w.r.t. the points (border clamp
has zero gradient outside the grid, matching torch).
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp


def _trilinear_gather(grid: jax.Array, cx: jax.Array, cy: jax.Array, cz: jax.Array) -> jax.Array:
    """Trilinear interpolation of ``grid`` [D, H, W] at voxel-space coords.

    cx indexes axis 0 (D), cy axis 1 (H), cz axis 2 (W). Coordinates are
    pre-clamped to the valid range; corner indices are clamped again so
    out-of-range corners replicate the border value.
    """
    D, H, W = grid.shape
    x0 = jnp.floor(cx)
    y0 = jnp.floor(cy)
    z0 = jnp.floor(cz)
    # fractional weights computed before index clamping (border semantics)
    wx = cx - x0
    wy = cy - y0
    wz = cz - z0

    x0i = jnp.clip(x0.astype(jnp.int32), 0, D - 1)
    y0i = jnp.clip(y0.astype(jnp.int32), 0, H - 1)
    z0i = jnp.clip(z0.astype(jnp.int32), 0, W - 1)
    x1i = jnp.clip(x0i + 1, 0, D - 1)
    y1i = jnp.clip(y0i + 1, 0, H - 1)
    z1i = jnp.clip(z0i + 1, 0, W - 1)

    flat = grid.reshape(-1)

    def take(xi, yi, zi):
        return jnp.take(flat, (xi * H + yi) * W + zi, axis=0)

    c000 = take(x0i, y0i, z0i)
    c001 = take(x0i, y0i, z1i)
    c010 = take(x0i, y1i, z0i)
    c011 = take(x0i, y1i, z1i)
    c100 = take(x1i, y0i, z0i)
    c101 = take(x1i, y0i, z1i)
    c110 = take(x1i, y1i, z0i)
    c111 = take(x1i, y1i, z1i)

    c00 = c000 * (1 - wz) + c001 * wz
    c01 = c010 * (1 - wz) + c011 * wz
    c10 = c100 * (1 - wz) + c101 * wz
    c11 = c110 * (1 - wz) + c111 * wz
    c0 = c00 * (1 - wy) + c01 * wy
    c1 = c10 * (1 - wy) + c11 * wy
    return c0 * (1 - wx) + c1 * wx


def _unnormalize(coord: jax.Array, size: int) -> jax.Array:
    """[-1, 1] -> voxel coords, torch align_corners=False convention,
    clamped for padding_mode='border'."""
    c = ((coord + 1.0) * size - 1.0) / 2.0
    return jnp.clip(c, 0.0, float(size - 1))


def grid_sample_3d(grid: jax.Array, coords: jax.Array) -> jax.Array:
    """Torch-parity F.grid_sample for 3D, align_corners=False, border padding.

    grid:   [B, D, H, W]   (torch input [B, 1, D, H, W] squeezed)
    coords: [B, N, 3] normalized in [-1, 1], ordered (x, y, z) where
            x indexes W, y indexes H, z indexes D — torch's convention.
    returns [B, N]
    """
    D, H, W = grid.shape[-3:]
    cw = _unnormalize(coords[..., 0], W)
    ch = _unnormalize(coords[..., 1], H)
    cd = _unnormalize(coords[..., 2], D)
    return jax.vmap(_trilinear_gather)(grid, cd, ch, cw)


def sdf_trilinear(
    sdf: jax.Array,
    points: jax.Array,
    grid_min: jax.Array,
    grid_max: jax.Array,
) -> jax.Array:
    """Fused world-space SDF lookup.

    sdf:      [B, D, D, D] grids with axes ordered (x, y, z) — the raw
              ``{scene}_sdf.npy`` reshaped to dim^3.
    points:   [B, N, 3] world/camera-frame vertex positions.
    grid_min: [B, 3], grid_max: [B, 3] — grid bounds from {scene}.json.
    returns   [B, N] interpolated signed distances.

    Equivalent to the reference's normalize -> [2,1,0] flip ->
    F.grid_sample(padding_mode='border') chain: the flip exists there
    only because torch's grid x indexes the last array axis; sampling
    the (x, y, z)-ordered grid directly with (x, y, z) coords is the
    same function.
    """
    norm = (points - grid_min[:, None, :]) / (grid_max[:, None, :] - grid_min[:, None, :]) * 2.0 - 1.0
    D = sdf.shape[-3]
    cx = _unnormalize(norm[..., 0], D)
    cy = _unnormalize(norm[..., 1], sdf.shape[-2])
    cz = _unnormalize(norm[..., 2], sdf.shape[-1])
    return jax.vmap(_trilinear_gather)(sdf, cx, cy, cz)


def sdf_trilinear_stacked(
    sdf_stack: jax.Array,
    scene_idx: jax.Array,
    points: jax.Array,
    grid_mins: jax.Array,
    grid_maxs: jax.Array,
) -> jax.Array:
    """SDF lookup against a resident per-scene grid registry.

    sdf_stack: [S, D, H, W] all scenes' SDF grids (padded to a common
               dim), resident in HBM for the whole run.
    scene_idx: [B] int32 scene id per batch element.
    points:    [B, N, 3] world-space points.
    grid_mins/grid_maxs: [S, 3] per-scene bounds.
    returns    [B, N].

    This is the TPU replacement for the reference's per-batch host->GPU
    SDF upload (batch_gen_hdf5.py:222-250): the gather indexes directly
    into the stacked grid, so no per-batch grid copy ever happens.
    """
    gmin = grid_mins[scene_idx]  # [B, 3]
    gmax = grid_maxs[scene_idx]
    norm = (points - gmin[:, None, :]) / (gmax[:, None, :] - gmin[:, None, :]) * 2.0 - 1.0
    S, D, H, W = sdf_stack.shape
    cx = _unnormalize(norm[..., 0], D)
    cy = _unnormalize(norm[..., 1], H)
    cz = _unnormalize(norm[..., 2], W)

    x0 = jnp.floor(cx)
    y0 = jnp.floor(cy)
    z0 = jnp.floor(cz)
    wx = cx - x0
    wy = cy - y0
    wz = cz - z0
    x0i = jnp.clip(x0.astype(jnp.int32), 0, D - 1)
    y0i = jnp.clip(y0.astype(jnp.int32), 0, H - 1)
    z0i = jnp.clip(z0.astype(jnp.int32), 0, W - 1)
    x1i = jnp.clip(x0i + 1, 0, D - 1)
    y1i = jnp.clip(y0i + 1, 0, H - 1)
    z1i = jnp.clip(z0i + 1, 0, W - 1)

    flat = sdf_stack.reshape(-1)
    base = (scene_idx.astype(jnp.int32) * D)[:, None]  # [B, 1]

    def take(xi, yi, zi):
        return jnp.take(flat, ((base + xi) * H + yi) * W + zi, axis=0)

    c000 = take(x0i, y0i, z0i)
    c001 = take(x0i, y0i, z1i)
    c010 = take(x0i, y1i, z0i)
    c011 = take(x0i, y1i, z1i)
    c100 = take(x1i, y0i, z0i)
    c101 = take(x1i, y0i, z1i)
    c110 = take(x1i, y1i, z0i)
    c111 = take(x1i, y1i, z1i)

    c00 = c000 * (1 - wz) + c001 * wz
    c01 = c010 * (1 - wz) + c011 * wz
    c10 = c100 * (1 - wz) + c101 * wz
    c11 = c110 * (1 - wz) + c111 * wz
    c0 = c00 * (1 - wy) + c01 * wy
    c1 = c10 * (1 - wy) + c11 * wy
    return c0 * (1 - wx) + c1 * wx


def pack_sdf_corners(sdf_stack: jax.Array) -> jax.Array:
    """[S, D, H, W] -> [S, D, H, W, 8] with the 2x2x2 corner block of each
    cell packed into the contiguous minor axis (edge-clamped).

    TPU gathers fetch one row per index; fetching the 8 trilinear
    corners as ONE 8-float row instead of 8 scalar gathers cuts the
    gather count (the SDF lookup bottleneck) 8x. Channel c = dx*4+dy*2+dz.
    """
    out = []
    for dx in (0, 1):
        sx = jnp.concatenate([sdf_stack[:, dx:], sdf_stack[:, -1:]], axis=1) if dx else sdf_stack
        for dy in (0, 1):
            sy = jnp.concatenate([sx[:, :, dy:], sx[:, :, -1:]], axis=2) if dy else sx
            for dz in (0, 1):
                sz = jnp.concatenate([sy[:, :, :, dz:], sy[:, :, :, -1:]], axis=3) if dz else sy
                out.append(sz)
    return jnp.stack(out, axis=-1)


def sdf_trilinear_packed(
    sdf_packed: jax.Array,
    scene_idx: jax.Array,
    points: jax.Array,
    grid_mins: jax.Array,
    grid_maxs: jax.Array,
) -> jax.Array:
    """Same function as sdf_trilinear_stacked, one gather per point.

    sdf_packed: [S, D, H, W, 8] from pack_sdf_corners; may be stored
    bf16 (half the gather bytes; ~2^-8-relative value quantization —
    the production fit/train configs opt in via make_assets, parity
    tests keep f32). The gather is the cost: on v5e it runs at a fixed
    ~8ns per INDEX for any row width <=128, so one packed-row fetch per
    point is the optimal shape (8 scalar gathers measured 6x slower,
    scripts/profile_sdf.py / profile_gather.py).

    Trilinear weights are applied as an unrolled lerp tree (7 fused
    elementwise ops on [B, N] slices) instead of materializing
    [B, N, 8] weight tensors — measured ~7% faster end-to-end.
    """
    S, D, H, W, _ = sdf_packed.shape
    gmin = grid_mins[scene_idx]
    gmax = grid_maxs[scene_idx]
    norm = (points - gmin[:, None, :]) / (gmax[:, None, :] - gmin[:, None, :]) * 2.0 - 1.0
    cx = _unnormalize(norm[..., 0], D)
    cy = _unnormalize(norm[..., 1], H)
    cz = _unnormalize(norm[..., 2], W)

    x0 = jnp.floor(cx)
    y0 = jnp.floor(cy)
    z0 = jnp.floor(cz)
    wx = cx - x0
    wy = cy - y0
    wz = cz - z0
    x0i = jnp.clip(x0.astype(jnp.int32), 0, D - 1)
    y0i = jnp.clip(y0.astype(jnp.int32), 0, H - 1)
    z0i = jnp.clip(z0.astype(jnp.int32), 0, W - 1)

    rows = sdf_packed.reshape(-1, 8)
    base = (scene_idx.astype(jnp.int32) * D)[:, None]
    flat = ((base + x0i) * H + y0i) * W + z0i
    c = jnp.take(rows, flat, axis=0).astype(jnp.float32)  # [B, N, 8]

    return _lerp8(c, wx, wy, wz)


def _lerp8(c: jax.Array, wx: jax.Array, wy: jax.Array, wz: jax.Array) -> jax.Array:
    """Trilinear combine of packed corner rows c [..., 8] with fractional
    weights; channel layout c = dx*4 + dy*2 + dz (pack_sdf_corners).
    Unrolled lerp tree: 7 fused elementwise ops on [B, N] slices instead
    of materialized [B, N, 8] weight tensors (~7% faster end-to-end)."""
    ux, uy, uz = 1 - wx, 1 - wy, 1 - wz
    c00 = c[..., 0] * uz + c[..., 1] * wz
    c01 = c[..., 2] * uz + c[..., 3] * wz
    c10 = c[..., 4] * uz + c[..., 5] * wz
    c11 = c[..., 6] * uz + c[..., 7] * wz
    c0 = c00 * uy + c01 * wy
    c1 = c10 * uy + c11 * wy
    return c0 * ux + c1 * wx


def _voxel_coords(points, scene_idx, grid_mins, grid_maxs, dims):
    """World points -> clamped voxel-space coords (cx, cy, cz), the shared
    front half of every packed lookup."""
    D, H, W = dims
    gmin = grid_mins[scene_idx]
    gmax = grid_maxs[scene_idx]
    norm = (points - gmin[:, None, :]) / (gmax[:, None, :] - gmin[:, None, :]) * 2.0 - 1.0
    return (
        _unnormalize(norm[..., 0], D),
        _unnormalize(norm[..., 1], H),
        _unnormalize(norm[..., 2], W),
    )


def sdf_trilinear_packed_cached(
    sdf_packed: jax.Array,
    scene_idx: jax.Array,
    points: jax.Array,
    grid_mins: jax.Array,
    grid_maxs: jax.Array,
) -> Tuple[jax.Array, Tuple[jax.Array, jax.Array]]:
    """sdf_trilinear_packed + the per-point cell cache.

    Returns (sdf [B, N], cache) where cache = (corners [B, N, 8] in the
    GRID's storage dtype, base [B, N, 3] f32 floor voxel coords). The
    corner rows are fetched by the lookup anyway, so emitting the cache
    is free — and carrying them in the grid dtype is lossless (they were
    gathered from it) while halving the dominant cheap-iteration HBM
    tensor when the production bf16 packed grids are in use. Feeding it to
    ``sdf_trilinear_from_cache`` re-evaluates the SDF at MOVED points
    with zero gathers — each point's SDF is the linear (trilinear-
    extrapolated) patch of the cell it occupied at cache time. Exact
    while points stay in their cells; error is second-order in the
    displacement beyond (bounded by cell size x SDF curvature). This is
    the fit loop's selection-refresh collision path (FitConfig.refresh_every).
    """
    S, D, H, W, _ = sdf_packed.shape
    cx, cy, cz = _voxel_coords(points, scene_idx, grid_mins, grid_maxs, (D, H, W))
    x0 = jnp.floor(cx)
    y0 = jnp.floor(cy)
    z0 = jnp.floor(cz)
    x0i = jnp.clip(x0.astype(jnp.int32), 0, D - 1)
    y0i = jnp.clip(y0.astype(jnp.int32), 0, H - 1)
    z0i = jnp.clip(z0.astype(jnp.int32), 0, W - 1)

    rows = sdf_packed.reshape(-1, 8)
    sbase = (scene_idx.astype(jnp.int32) * D)[:, None]
    flat = ((sbase + x0i) * H + y0i) * W + z0i
    c_src = jnp.take(rows, flat, axis=0)  # [B, N, 8], grid dtype

    sdf = _lerp8(c_src.astype(jnp.float32), cx - x0, cy - y0, cz - z0)
    base = jnp.stack([x0, y0, z0], axis=-1)  # floor coords as f32
    return sdf, (c_src, base)


def sdf_trilinear_from_cache(
    cache: Tuple[jax.Array, jax.Array],
    scene_idx: jax.Array,
    points: jax.Array,
    grid_mins: jax.Array,
    grid_maxs: jax.Array,
    dims: Tuple[int, int, int],
) -> jax.Array:
    """Frozen-cell SDF re-evaluation: no memory traffic beyond the cache.

    Evaluates each point against the trilinear patch of the cell cached
    by ``sdf_trilinear_packed_cached`` (corners carried outside the
    autodiff path; gradients flow through the fractional coordinates,
    i.e. through the points — exactly as in the full lookup). Weights
    are NOT clamped to [0, 1]: a point that drifted out of its cached
    cell sees the patch's linear extrapolation, which tracks the true
    SDF to first order and keeps the gradient alive (the alternative —
    clamping — flatlines the gradient at the old cell border).
    """
    corners, base = cache
    corners = jax.lax.stop_gradient(corners).astype(jnp.float32)
    base = jax.lax.stop_gradient(base)
    cx, cy, cz = _voxel_coords(points, scene_idx, grid_mins, grid_maxs, dims)
    return _lerp8(corners, cx - base[..., 0], cy - base[..., 1], cz - base[..., 2])


def sdf_penetration_loss(body_sdf: jax.Array) -> jax.Array:
    """mean |sdf| over penetrating (sdf < 0) vertices; 0 if none.

    Static-shape equivalent of the reference's dynamic branch
    (train_s1.py:194-198): ``body_sdf[body_sdf < 0].abs().mean()`` with
    the no-penetration case folded in via a count clamp.
    """
    neg = jnp.minimum(body_sdf, 0.0)
    count = jnp.sum(body_sdf < 0)
    total = -jnp.sum(neg)
    return total / jnp.maximum(count, 1).astype(body_sdf.dtype)
