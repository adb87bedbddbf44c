"""Contact-NN candidate pruning — tile-granular, custom-call-free.

The contact term's NN search (reference fitting_proxe.py:136-139,
train_s1.py:165-169 — chamfer against the full scene cloud) only needs
scene points near the body. Earlier rounds pruned with
``jax.lax.approx_min_k`` over per-point distances; that lowers to the
TPU ApproxTopK custom call, which was observed to HARD-FAULT the device
inside particular fit-scan structures (habitat-shape refresh_every=10
programs; see ROUND_NOTES round 3) while identical shapes pass in other
programs — a compiler/runtime bug we cannot fix, only avoid.

Round-3 bisection (one fresh process per config, n=200/50-iter
refresh_every=10 habitat shape) isolated the trigger further: ANY
selection formulation containing a take_along_axis tile gather or a
nested inner lax.scan inside the refresh-block fit scan faults the
device (topk+gather FAIL, argmin-scan+gather FAIL, argmin-scan+matmul
FAIL), while top_k + one-hot MATMUL fetch runs clean — and pruning off
runs clean. Hence DEFAULT_METHOD='topk_matmul': the only surviving
variant is also the most MXU-native one (no gather lowering at all).

This module replaces approx_min_k with a TPU-native formulation built
from dense reduces plus one tiny exact top_k:

* Scene clouds are **Morton-ordered once at registry build time**
  (``morton_argsort``, host-side numpy), so any 128-point slice of the
  cloud is a spatially compact blob.
* ``select_near_tiles`` reduces per-point centroid distances [B, M] to
  per-tile minima [B, M/tile], picks the k/tile nearest tiles with an
  exact ``lax.top_k`` over that small axis, and gathers the winning
  tiles whole. The candidate set is a union of spatial blobs covering
  the body's neighbourhood; per-tile MIN distance guarantees any tile
  containing a very-near point is kept. tile=32 default: fine enough
  granularity that the K-point budget places blobs adaptively (recall
  measured in tests/test_fit_prune.py; protocol scores in EVAL_SYNTH.md).

Cost: the same O(B*M) distance pass as before, a [B, M/tile] reduce, a
top_k over M/tile elements, and a contiguous tile-row gather — all
plain XLA ops with no custom-call lowering.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

TILE = 32
_FAR = 1.0e5

# How the k nearest tiles are ranked and fetched. All four variants are
# numerically identical (ties aside); they exist because the TPU fault
# this module works around is PROGRAM-STRUCTURE-sensitive and the
# trigger op had to be isolated empirically (scripts in /tmp round 3):
#   rank: 'topk'  = lax.top_k over the [B, n_tiles] tile minima
#         'argmin'= k sequential masked argmins (pure dense reduces)
#   fetch: 'gather' = take_along_axis on whole tile rows
#          'matmul' = one-hot einsum (MXU, no gather lowering at all)
DEFAULT_METHOD = "topk_matmul"


def morton_codes(verts: np.ndarray, bits: int = 10) -> np.ndarray:
    """[P, 3] float -> [P] uint64 Morton (Z-order) codes over the bbox."""
    v = np.asarray(verts, np.float64)
    lo = v.min(axis=0)
    span = np.maximum(v.max(axis=0) - lo, 1e-9)
    q = np.clip(((v - lo) / span * (2**bits - 1)).astype(np.uint64), 0, 2**bits - 1)
    code = np.zeros(v.shape[0], np.uint64)
    for b in range(bits):
        for ax in range(3):
            code |= ((q[:, ax] >> np.uint64(b)) & np.uint64(1)) << np.uint64(3 * b + ax)
    return code


def morton_argsort(verts: np.ndarray) -> np.ndarray:
    """Permutation that orders points along the Z-order curve. Applied to
    scene clouds at registry build (data/scenes.py); NN searches are
    order-invariant, so only the pruning tiles care."""
    return np.argsort(morton_codes(verts), kind="stable")


def _rank_tiles_argmin(tile_min: jax.Array, k_tiles: int) -> jax.Array:
    """[B, nt] -> one-hot [B, k_tiles, nt] of the k smallest, via k
    sequential masked argmins — dense reduces + iota compares only."""
    nt = tile_min.shape[-1]
    iota = jnp.arange(nt)

    def step(tm, _):
        m = jnp.argmin(tm, axis=-1)  # [B]
        oh = (iota[None, :] == m[:, None]).astype(tile_min.dtype)  # [B, nt]
        return tm + oh * jnp.asarray(_FAR**2, tile_min.dtype), oh

    _, oh = jax.lax.scan(step, tile_min, None, length=k_tiles)
    return jnp.moveaxis(oh, 0, 1)  # [B, k_tiles, nt]


def select_near_tiles(
    scene_pts: jax.Array,  # [B, M, 3] Morton-ordered (far-padded OK)
    centroid: jax.Array,  # [B, 3]
    k_points: int,
    tile: int = TILE,
    method: str | None = None,
) -> jax.Array:
    """The ~k_points scene points nearest each centroid, tile-granular.

    Returns [B, ceil(k/tile)*tile, 3]. Selection is non-differentiable
    (indices are stop_gradient); the caller's downstream NN search
    treats the scene cloud as constant, matching the reference.
    """
    method = method or DEFAULT_METHOD
    rank, fetch = method.split("_")
    B, M, _ = scene_pts.shape
    k_tiles = max(1, -(-k_points // tile))
    pad = (-M) % tile
    if pad:
        scene_pts = jnp.concatenate(
            [scene_pts, jnp.full((B, pad, 3), _FAR, scene_pts.dtype)], axis=1
        )
    nt = (M + pad) // tile
    if k_tiles >= nt:
        return scene_pts
    cd = jnp.sum((scene_pts - centroid[:, None, :]) ** 2, axis=-1)  # [B, Mp]
    tile_min = jnp.min(cd.reshape(B, nt, tile), axis=-1)  # [B, nt]
    tile_min = jax.lax.stop_gradient(tile_min)
    tiles = scene_pts.reshape(B, nt, tile * 3)

    if rank == "topk":
        _, tidx = jax.lax.top_k(-tile_min, k_tiles)  # exact, tiny axis
        tidx = jax.lax.stop_gradient(tidx)
        if fetch == "gather":
            cand = jnp.take_along_axis(tiles, tidx[:, :, None], axis=1)
            return cand.reshape(B, k_tiles * tile, 3)
        oh = (tidx[:, :, None] == jnp.arange(nt)[None, None, :]).astype(scene_pts.dtype)
    else:
        oh = _rank_tiles_argmin(tile_min, k_tiles)  # [B, k_tiles, nt]
        if fetch == "gather":
            tidx = jnp.argmax(oh, axis=-1).astype(jnp.int32)
            cand = jnp.take_along_axis(tiles, tidx[:, :, None], axis=1)
            return cand.reshape(B, k_tiles * tile, 3)
    # one-hot selection must not round the coordinates through bf16:
    # force the f32-exact matmul path
    cand = jnp.einsum("bkn,bnc->bkc", oh, tiles, precision=jax.lax.Precision.HIGHEST)
    return cand.reshape(B, k_tiles * tile, 3)
