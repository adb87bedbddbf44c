"""Chamfer nearest-neighbour distance — Pallas TPU kernel + jnp reference.

TPU-native replacement for the reference's vendored CUDA extension
(chamfer_pytorch/chamfer.cu:12-193, chamfer_cuda.cpp, dist_chamfer.py):
bidirectional squared NN distance between two point clouds, with the
exact double-sided gradient of the CUDA backward (scatter into *both*
clouds including cross terms, chamfer.cu:155-174) realized as a
gather/segment-sum custom VJP — no atomics needed on TPU.

Kernel design (vs. the CUDA shared-memory tiling): points are stored
coordinate-major ([B, 3, N]) so tiles are lane-aligned; each grid step
owns a TILE_N slice of cloud A and streams cloud B through VMEM in
TILE_M chunks, forming the pairwise distance tile on the MXU via
  d[i,j] = |a_i|^2 + |b_j|^2 - 2 a_i.b_j
and keeping a running (min, argmin) carry. The O(N*M) work is one
fused matmul-shaped program instead of the CUDA kernel's scalar inner
loop (chamfer.cu:40-113).

The pure-jnp ``chamfer_distance_reference`` mirrors the reference's
dual-implementation test pattern (chamfer_pytorch/chamfer_python.py,
test_chamfer.py) and is the CPU fallback.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_PAD_COORD = 1e5  # padding points are pushed far away so they never win argmin
# Tile sizes tuned on v5e (PSI shapes: N~1455 contact verts, M~20k scene
# points): larger tiles amortize loop overhead; the f32 distance tile
# (TILE_N x TILE_M x 4B) is the VMEM constraint.
_TILE_N = 1536
_TILE_M = 2048


def _pick_tiles(m_pad: int, tile_m: int = _TILE_M):
    """Shrink TILE_N when the resident y block grows so the distance tile
    + y stay within the ~16MB VMEM budget."""
    tile_n = _TILE_N
    while tile_n * tile_m * 4 + 16 * m_pad * 2 + 8 * m_pad * 4 > 14 * 1024 * 1024 and tile_n > 256:
        tile_n //= 2
    return tile_n, tile_m


# ---------------------------------------------------------------------------
# Pure-jnp reference (also the CPU path)
# ---------------------------------------------------------------------------


def _pairwise_sqdist(x: jax.Array, y: jax.Array) -> jax.Array:
    """[N, 3] x [M, 3] -> [N, M] squared euclidean distances."""
    x2 = jnp.sum(x * x, axis=-1)[:, None]
    y2 = jnp.sum(y * y, axis=-1)[None, :]
    xy = jnp.matmul(x, y.T, precision=jax.lax.Precision.HIGHEST)
    return x2 + y2 - 2.0 * xy


def _nn_one(x: jax.Array, y: jax.Array) -> Tuple[jax.Array, jax.Array]:
    d = _pairwise_sqdist(x, y)
    return jnp.min(d, axis=-1), jnp.argmin(d, axis=-1).astype(jnp.int32)


def chamfer_distance_reference(
    x: jax.Array, y: jax.Array
) -> Tuple[jax.Array, jax.Array, jax.Array, jax.Array]:
    """O(N*M) bidirectional NN distance. x: [B, N, 3], y: [B, M, 3].

    Returns (dist1 [B,N], dist2 [B,M], idx1 [B,N], idx2 [B,M]) —
    squared distances, matching chamfer_pytorch/chamfer_python.py.
    """
    d1, i1 = jax.vmap(_nn_one)(x, y)
    d2, i2 = jax.vmap(_nn_one)(y, x)
    return d1, d2, i1, i2


# ---------------------------------------------------------------------------
# Pallas kernel: one direction (A -> nearest in B)
# ---------------------------------------------------------------------------


def _nn_kernel(xt_ref, yt_ref, y2_ref, idx_ref, *, tile_m: int):
    """Argmin kernel with a split-bf16 cross term.

    The per-row constant |x_i|^2 cannot change an argmin over j, so the
    kernel minimizes d'[i,j] = |y_j|^2 - 2 x_i.y_j; exact distances are
    recomputed outside from the winning index. The cross term x.y runs
    as ONE default-precision bf16 MXU pass over K=16 with the operands
    pre-split into high/low bf16 halves arranged as
    (x_hi, x_lo, x_hi) . (y_hi, y_hi, y_lo): with the f32 MXU
    accumulator this reproduces f32 products up to the ~2^-16-relative
    x_lo*y_lo term, at ~3x fewer MXU cycles than a 6-pass f32-HIGHEST
    dot. (The split itself must use jax.lax.reduce_precision — see
    _split_cmajor.)

    xt_ref: [1, 16, TILE_N] bf16 split rows; yt_ref: [1, 16, M_pad];
    y2_ref: [1, 8, M_pad] (row 0 = exact f32 |y|^2);
    idx_ref: [1, 8, TILE_N] (argmin broadcast over the sublane axis)."""
    xt = xt_ref[0]  # [16, TILE_N]
    tile_n = xt.shape[-1]
    m_pad = yt_ref.shape[-1]
    num_m_tiles = m_pad // tile_m

    big = jnp.float32(3.0e38)

    def body(mi, carry):
        best_d, best_i = carry  # [TILE_N, 1] each
        yt = yt_ref[0, :, pl.ds(mi * tile_m, tile_m)]  # [16, TILE_M]
        y2 = y2_ref[0, 0:1, pl.ds(mi * tile_m, tile_m)]  # [1, TILE_M]
        prod = jax.lax.dot_general(
            xt, yt, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
        )  # [TILE_N, TILE_M]
        d = y2 - 2.0 * prod  # [TILE_N, TILE_M]

        tile_min = jnp.min(d, axis=1, keepdims=True)  # [TILE_N, 1]
        col = jax.lax.broadcasted_iota(jnp.int32, (tile_n, tile_m), 1) + mi * tile_m
        tile_arg = jnp.min(
            jnp.where(d <= tile_min, col, jnp.int32(2**30)), axis=1, keepdims=True
        )  # [TILE_N, 1]

        improved = tile_min < best_d
        best_d = jnp.where(improved, tile_min, best_d)
        best_i = jnp.where(improved, tile_arg, best_i)
        return best_d, best_i

    init = (
        jnp.full((tile_n, 1), big, dtype=jnp.float32),
        jnp.zeros((tile_n, 1), dtype=jnp.int32),
    )
    _, best_i = jax.lax.fori_loop(0, num_m_tiles, body, init)
    idx_ref[0] = jnp.broadcast_to(best_i.reshape(1, tile_n), (8, tile_n))


def _round_up(v: int, m: int) -> int:
    return -(-v // m) * m


def _split_cmajor(p: jax.Array, size_pad: int, order: str) -> jax.Array:
    """[B, P, 3] -> [B, 16, size_pad] bf16 split-row tile; far padding.

    order='x' lays rows (hi, lo, hi, 0...), order='y' lays
    (hi, hi, lo, 0...) so a K=16 contraction of the two yields
    x_hi.y_hi + x_lo.y_hi + x_hi.y_lo.

    The hi half MUST round through jax.lax.reduce_precision: a plain
    f32->bf16->f32 cast round-trip is elided by XLA's
    allow-excess-precision pass, which silently zeroes the lo half."""
    pad_pts = jnp.full((p.shape[0], size_pad - p.shape[1], 3), _PAD_COORD, p.dtype)
    p = jnp.concatenate([p, pad_pts], axis=1).astype(jnp.float32)
    pt = jnp.swapaxes(p, 1, 2)  # [B, 3, P]
    hi_f = jax.lax.reduce_precision(pt, 8, 7)  # bf16-valued, f32-typed
    hi = hi_f.astype(jnp.bfloat16)
    lo = (pt - hi_f).astype(jnp.bfloat16)
    zeros = jnp.zeros((p.shape[0], 7, size_pad), jnp.bfloat16)
    rows = [hi, lo, hi] if order == "x" else [hi, hi, lo]
    return jnp.concatenate(rows + [zeros], axis=1)


def _nn_direction_pallas(x: jax.Array, y: jax.Array, interpret: bool) -> Tuple[jax.Array, jax.Array]:
    """x: [B, N, 3], y: [B, M, 3] -> (dist [B, N], idx [B, N]).

    The kernel finds the argmin; the (exact, f32) squared distance is
    recomputed from the winning neighbour with a subtract-square, which
    is also more accurate near zero than the |x|^2+|y|^2-2xy expansion."""
    B, N, _ = x.shape
    M = y.shape[1]
    # small clouds (e.g. pruned scene-point sets) don't pay for a full
    # 2048-wide tile: shrink tile_m to the lane-aligned M
    tile_m_cap = min(_TILE_M, max(512, _round_up(M, 128)))
    m_pad = _round_up(max(M, tile_m_cap), tile_m_cap)
    tile_n, tile_m = _pick_tiles(m_pad, tile_m_cap)
    n_pad = _round_up(N, tile_n)

    xt = _split_cmajor(x, n_pad, "x")
    yt = _split_cmajor(y, m_pad, "y")

    # exact |y|^2 in f32 (row constant offsets would cancel in the argmin;
    # the column term must be accurate)
    pad_pts = jnp.full((B, m_pad - M, 3), _PAD_COORD, y.dtype)
    y_full = jnp.concatenate([y.astype(jnp.float32), pad_pts], axis=1)
    y2 = jnp.sum(y_full * y_full, axis=-1)  # [B, m_pad]
    y2_rows = jnp.broadcast_to(y2[:, None, :], (B, 8, m_pad))

    grid = (B, n_pad // tile_n)
    idx = pl.pallas_call(
        functools.partial(_nn_kernel, tile_m=tile_m),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, 16, tile_n), lambda b, i: (b, 0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 16, m_pad), lambda b, i: (b, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 8, m_pad), lambda b, i: (b, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 8, tile_n), lambda b, i: (b, 0, i), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, 8, n_pad), jnp.int32),
        interpret=interpret,
    )(xt, yt, y2_rows)
    idx = jnp.clip(idx[:, 0, :N], 0, M - 1)
    nn = jnp.take_along_axis(y, idx[..., None], axis=1)  # [B, N, 3]
    dist = jnp.sum((x - nn) ** 2, axis=-1)
    return dist, idx


def _on_tpu() -> bool:
    try:
        return jax.default_backend() == "tpu"
    except RuntimeError:  # pragma: no cover
        return False


def _nn_both(x, y, implementation: str):
    use_pallas = implementation == "pallas" or (implementation == "auto" and _on_tpu())
    # the Pallas kernel is f32-only (split-bf16 carries); f64 inputs
    # (x64 parity runs) take the exact jnp path
    if x.dtype != jnp.float32:
        use_pallas = False
    interpret = implementation == "pallas" and not _on_tpu()
    if use_pallas:
        d1, i1 = _nn_direction_pallas(x, y, interpret)
        d2, i2 = _nn_direction_pallas(y, x, interpret)
        return d1, d2, i1, i2
    return chamfer_distance_reference(x, y)


# ---------------------------------------------------------------------------
# custom VJP (the CUDA backward's scatter, as gather + segment-sum)
# ---------------------------------------------------------------------------


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def _chamfer(x: jax.Array, y: jax.Array, implementation: str):
    d1, d2, _, _ = _nn_both(x, y, implementation)
    return d1, d2


def _chamfer_fwd(x, y, implementation):
    d1, d2, i1, i2 = _nn_both(x, y, implementation)
    return (d1, d2), (x, y, i1, i2)


def _chamfer_bwd(implementation, res, g):
    x, y, i1, i2 = res
    g1, g2 = g  # [B, N], [B, M]
    B, N, _ = x.shape
    M = y.shape[1]

    def one(x, y, i1, i2, g1, g2):
        # direction 1: dist1[n] = |x[n] - y[i1[n]]|^2
        diff1 = x - y[i1]  # [N, 3]
        gx = 2.0 * g1[:, None] * diff1
        gy = jnp.zeros_like(y).at[i1].add(-2.0 * g1[:, None] * diff1)
        # direction 2: dist2[m] = |y[m] - x[i2[m]]|^2
        diff2 = y - x[i2]  # [M, 3]
        gy = gy + 2.0 * g2[:, None] * diff2
        gx = gx.at[i2].add(-2.0 * g2[:, None] * diff2)
        return gx, gy

    gx, gy = jax.vmap(one)(x, y, i1, i2, g1, g2)
    return gx, gy


_chamfer.defvjp(_chamfer_fwd, _chamfer_bwd)


def chamfer_distance(
    x: jax.Array, y: jax.Array, *, implementation: str = "auto"
) -> Tuple[jax.Array, jax.Array]:
    """Bidirectional squared NN distance, differentiable w.r.t. both clouds.

    x: [B, N, 3], y: [B, M, 3] -> (dist1 [B, N], dist2 [B, M]).
    Drop-in equivalent of ``chamferDist()(xyz1, xyz2)``
    (reference chamfer_pytorch/dist_chamfer.py:48-53).

    implementation: 'auto' (Pallas on TPU, jnp elsewhere), 'pallas'
    (interpret mode off-TPU — slow, for tests), or 'reference'.
    """
    # promote low-precision inputs to f32; keep f64 (x64 parity tests)
    dt = jnp.promote_types(x.dtype, jnp.float32)
    return _chamfer(x.astype(dt), y.astype(dt), implementation)


def _nn_one_direction(x, y, implementation: str):
    use_pallas = implementation == "pallas" or (implementation == "auto" and _on_tpu())
    if x.dtype != jnp.float32:  # Pallas kernel is f32-only (see _nn_both)
        use_pallas = False
    if use_pallas:
        interpret = implementation == "pallas" and not _on_tpu()
        return _nn_direction_pallas(x, y, interpret)
    return jax.vmap(_nn_one)(x, y)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def _chamfer_one(x: jax.Array, y: jax.Array, implementation: str):
    d1, _ = _nn_one_direction(x, y, implementation)
    return d1


def _chamfer_one_fwd(x, y, implementation):
    d1, i1 = _nn_one_direction(x, y, implementation)
    return d1, (x, y, i1)


def _chamfer_one_bwd(implementation, res, g1):
    x, y, i1 = res

    def one(x, y, i1, g1):
        diff1 = x - y[i1]
        gx = 2.0 * g1[:, None] * diff1
        gy = jnp.zeros_like(y).at[i1].add(-2.0 * g1[:, None] * diff1)
        return gx, gy

    return jax.vmap(one)(x, y, i1, g1)


_chamfer_one.defvjp(_chamfer_one_fwd, _chamfer_one_bwd)


def chamfer_one_sided(
    x: jax.Array, y: jax.Array, *, implementation: str = "auto"
) -> jax.Array:
    """Squared NN distance x -> y only: [B, N, 3] x [B, M, 3] -> [B, N].

    Half the cost of chamfer_distance when (as in every PSI loss,
    train_s1.py:165-169, fitting_proxe.py:136-139) only dist1 is
    consumed. Gradients flow to both clouds, identically to the
    two-sided op's dist1 path.
    """
    return _chamfer_one(x.astype(jnp.float32), y.astype(jnp.float32), implementation)


def chamfer_one_sided_nn(
    x: jax.Array, y: jax.Array, *, implementation: str = "auto"
) -> Tuple[jax.Array, jax.Array]:
    """One-sided NN distance plus the winning neighbour's coordinates.

    Returns (d1 [B, N], y_nn [B, N, 3]); d1 = |x - y_nn|^2 recomputed
    from the winner (the Pallas path's native formulation), y_nn is
    stop-gradient. d1 is differentiable w.r.t. x ONLY — identical to
    chamfer_one_sided's x-gradient; the y-side gradient is dropped
    (every PSI fit/train caller treats the scene cloud as constant).

    The y_nn output is the frozen-correspondence carry for the fit
    loop's selection-refresh mode (FitConfig.refresh_every): between
    refreshes the contact term evaluates |x - y_nn_frozen|^2, the ICP-
    style majorizer of the true NN distance (NN is the min over
    correspondences, so the frozen loss upper-bounds it and is exact at
    the refresh point).
    """
    x = x.astype(jnp.float32)
    y = y.astype(jnp.float32)
    # the NN search itself needs no gradient (and the Pallas kernel has
    # no autodiff rule): search on detached clouds, differentiate only
    # the recomputed distance to the winner
    _, i1 = _nn_one_direction(
        jax.lax.stop_gradient(x), jax.lax.stop_gradient(y), implementation
    )
    y_nn = jax.lax.stop_gradient(jnp.take_along_axis(y, i1[..., None], axis=1))
    d1 = jnp.sum((x - y_nn) ** 2, axis=-1)
    return d1, y_nn


def chamfer_with_idx(
    x: jax.Array, y: jax.Array, *, implementation: str = "auto"
) -> Tuple[jax.Array, jax.Array, jax.Array, jax.Array]:
    """Like chamfer_distance but also returns NN indices (non-differentiable),
    equivalent of chamfer_pytorch/dist_chamfer_idx.py."""
    return _nn_both(x.astype(jnp.float32), y.astype(jnp.float32), implementation)
