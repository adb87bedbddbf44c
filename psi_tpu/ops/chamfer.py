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
_TILE_N = 512
_TILE_M = 512


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


def _nn_kernel(xt_ref, yt_ref, dist_ref, idx_ref, *, tile_m: int):
    """xt_ref: [1, 8, TILE_N] A-coords (rows 0..2 used); yt_ref: [1, 8, M_pad];
    dist_ref/idx_ref: [1, 8, TILE_N] (result broadcast over the 8-sublane
    axis to satisfy Mosaic's (8, 128) output-tile alignment)."""
    xt = xt_ref[0]  # [8, TILE_N]
    tile_n = xt.shape[-1]
    m_pad = yt_ref.shape[-1]
    num_m_tiles = m_pad // tile_m

    # |a|^2 per column of the A tile: contract the coordinate axis on the MXU.
    ones = jnp.ones((1, 8), dtype=jnp.float32)
    x2 = jax.lax.dot_general(
        ones, xt * xt, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32, precision=jax.lax.Precision.HIGHEST
    )  # [1, TILE_N]

    big = jnp.float32(3.0e38)

    def body(mi, carry):
        best_d, best_i = carry  # [TILE_N, 1] each
        yt = yt_ref[0, :, pl.ds(mi * tile_m, tile_m)]  # [8, TILE_M]
        y2 = jax.lax.dot_general(
            ones, yt * yt, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32, precision=jax.lax.Precision.HIGHEST
        )  # [1, TILE_M]
        prod = jax.lax.dot_general(
            xt, yt, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32, precision=jax.lax.Precision.HIGHEST
        )  # [TILE_N, TILE_M]
        d = x2.reshape(tile_n, 1) + y2 - 2.0 * prod  # [TILE_N, TILE_M]

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
    best_d, best_i = jax.lax.fori_loop(0, num_m_tiles, body, init)
    dist_ref[0] = jnp.broadcast_to(best_d.reshape(1, tile_n), (8, tile_n))
    idx_ref[0] = jnp.broadcast_to(best_i.reshape(1, tile_n), (8, tile_n))


def _round_up(v: int, m: int) -> int:
    return -(-v // m) * m


def _nn_direction_pallas(x: jax.Array, y: jax.Array, interpret: bool) -> Tuple[jax.Array, jax.Array]:
    """x: [B, N, 3], y: [B, M, 3] -> (dist [B, N], idx [B, N])."""
    B, N, _ = x.shape
    M = y.shape[1]
    n_pad = _round_up(N, _TILE_N)
    m_pad = _round_up(max(M, _TILE_M), _TILE_M)

    # coordinate-major, 8 sublanes (3 coords + zero padding), far-away pads
    def to_cmajor(p, size_pad):
        pad_pts = jnp.full((p.shape[0], size_pad - p.shape[1], 3), _PAD_COORD, p.dtype)
        p = jnp.concatenate([p, pad_pts], axis=1)
        pt = jnp.swapaxes(p, 1, 2)  # [B, 3, P]
        zeros = jnp.zeros((p.shape[0], 5, size_pad), p.dtype)
        return jnp.concatenate([pt, zeros], axis=1).astype(jnp.float32)

    xt = to_cmajor(x, n_pad)
    yt = to_cmajor(y, m_pad)

    grid = (B, n_pad // _TILE_N)
    dist, idx = pl.pallas_call(
        functools.partial(_nn_kernel, tile_m=_TILE_M),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, 8, _TILE_N), lambda b, i: (b, 0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 8, m_pad), lambda b, i: (b, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, 8, _TILE_N), lambda b, i: (b, 0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 8, _TILE_N), lambda b, i: (b, 0, i), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B, 8, n_pad), jnp.float32),
            jax.ShapeDtypeStruct((B, 8, n_pad), jnp.int32),
        ],
        interpret=interpret,
    )(xt, yt)
    return dist[:, 0, :N], jnp.clip(idx[:, 0, :N], 0, M - 1)


def _on_tpu() -> bool:
    try:
        return jax.default_backend() == "tpu"
    except RuntimeError:  # pragma: no cover
        return False


def _nn_both(x, y, implementation: str):
    use_pallas = implementation == "pallas" or (implementation == "auto" and _on_tpu())
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
    return _chamfer(x.astype(jnp.float32), y.astype(jnp.float32), implementation)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def _chamfer_one(x: jax.Array, y: jax.Array, implementation: str):
    if implementation == "pallas" or (implementation == "auto" and _on_tpu()):
        interpret = implementation == "pallas" and not _on_tpu()
        d1, _ = _nn_direction_pallas(x, y, interpret)
        return d1
    d1, _ = jax.vmap(_nn_one)(x, y)
    return d1


def _chamfer_one_fwd(x, y, implementation):
    if implementation == "pallas" or (implementation == "auto" and _on_tpu()):
        interpret = implementation == "pallas" and not _on_tpu()
        d1, i1 = _nn_direction_pallas(x, y, interpret)
    else:
        d1, i1 = jax.vmap(_nn_one)(x, y)
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


def chamfer_with_idx(
    x: jax.Array, y: jax.Array, *, implementation: str = "auto"
) -> Tuple[jax.Array, jax.Array, jax.Array, jax.Array]:
    """Like chamfer_distance but also returns NN indices (non-differentiable),
    equivalent of chamfer_pytorch/dist_chamfer_idx.py."""
    return _nn_both(x.astype(jnp.float32), y.astype(jnp.float32), implementation)
