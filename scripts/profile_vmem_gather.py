"""Prototype: can Mosaic's in-VMEM dynamic_gather beat the HBM gather
engine for the trilinear SDF corner fetch?

The fit step's SDF lookup is one packed-row HBM gather per body vertex
(ops/sdf.py::sdf_trilinear_packed) - measured ~8ns/index on v5e
(scripts/profile_gather.py), i.e. ~21ms for 256 bodies x 10475 verts.
The candidate replacement extracts a per-body sub-box of the SDF into
VMEM and fetches the 8 trilinear corners with tpu.dynamic_gather
(jnp.take_along_axis inside a Pallas kernel), which runs at VPU rate
instead of gather-engine rate.

This script measures the primitives in isolation on the real chip:
  1. correctness + support: take_along_axis axis=0/1 in a kernel
  2. throughput: chained row+lane gathers on a [2304, 128] table
  3. relayout cost: compact [18,128] -> table-shape [2304,1] reshape
  4. baseline: the current packed HBM gather at bench shapes

Timing rules per ROUND_NOTES.md: many reps with pre-staged inputs,
divide a multi-second total.
"""

import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

R, L = 2304, 128  # table shape: 48x48 (x,y) rows, 128 (z) lanes


def _time(fn, args, reps=50, inner=1):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.time()
    for _ in range(reps):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.time() - t0) / (reps * inner)


# ---------------------------------------------------------------- 1. support
def _row_gather_kernel(t_ref, r_ref, o_ref):
    o_ref[...] = jnp.take_along_axis(t_ref[...], r_ref[...], axis=0)


def _lane_gather_kernel(t_ref, r_ref, o_ref):
    o_ref[...] = jnp.take_along_axis(t_ref[...], r_ref[...], axis=1)


def check_support():
    rng = np.random.default_rng(0)
    for rows in (8, 128, 512, 2304):
        t = jnp.asarray(rng.standard_normal((rows, L)), jnp.float32)
        ri = jnp.asarray(rng.integers(0, rows, (rows, L)), jnp.int32)
        li = jnp.asarray(rng.integers(0, L, (rows, L)), jnp.int32)
        for name, kern, idx, axis in (
            (f"row(axis=0,R={rows})", _row_gather_kernel, ri, 0),
            (f"lane(axis=1,R={rows})", _lane_gather_kernel, li, 1),
        ):
            try:
                out = pl.pallas_call(
                    kern,
                    out_shape=jax.ShapeDtypeStruct((rows, L), jnp.float32),
                    in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
                    out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
                )(t, idx)
                ref = jnp.take_along_axis(t, idx, axis=axis)
                ok = bool(jnp.allclose(out, ref))
                print(f"[support] {name}: lowered, correct={ok}")
            except Exception as e:
                print(f"[support] {name}: FAILED - {type(e).__name__}: {str(e)[:160]}")


# ------------------------------------------------------------- 2. throughput
def _chained_kernel(n_gathers, t_ref, l_ref, o_ref):
    t = t_ref[0]
    acc = jnp.zeros_like(t)
    li = l_ref[0]
    for k in range(n_gathers):
        acc = acc + jnp.take_along_axis(t, (li + k) % L, axis=1)
    o_ref[0] = acc


def measure_throughput(n_gathers=8, grid_n=256, rows=512):
    """Emulates the trilinear workload: per body, n_gathers lane gathers
    on a [rows,128] VMEM table; grid over bodies."""
    rng = np.random.default_rng(0)
    t = jnp.asarray(rng.standard_normal((grid_n, rows, L)), jnp.float32)
    li = jnp.asarray(rng.integers(0, L, (grid_n, rows, L)), jnp.int32)

    inner = pl.pallas_call(
        functools.partial(_chained_kernel, n_gathers),
        grid=(grid_n,),
        out_shape=jax.ShapeDtypeStruct((grid_n, rows, L), jnp.float32),
        in_specs=[
            pl.BlockSpec((1, rows, L), lambda n: (n, 0, 0), memory_space=pltpu.VMEM),
        ] * 2,
        out_specs=pl.BlockSpec((1, rows, L), lambda n: (n, 0, 0), memory_space=pltpu.VMEM),
    )
    f = jax.jit(inner)
    dt = _time(f, (t, li), reps=20)
    gathers = n_gathers * grid_n
    elems = gathers * rows * L
    print(
        f"[throughput] {n_gathers} lane gathers x {grid_n} bodies x [{rows},{L}]: "
        f"{dt*1e3:.2f} ms/call, {elems/dt/1e9:.1f} G gathered-elems/s, "
        f"{dt/gathers*1e6:.2f} us/gather"
    )
    return dt


# ---------------------------------------------------------------- 3. relayout
def _relayout_kernel(c_ref, o_ref):
    c = c_ref[...]  # [18, 128]
    col = c.reshape(R, 1)  # cross-lane relayout: lanes -> sublanes
    o_ref[...] = jnp.broadcast_to(col, (R, L))


def measure_relayout(grid_n=256, n_arrays=7):
    rng = np.random.default_rng(0)
    c = jnp.asarray(rng.standard_normal((grid_n, 18, L)), jnp.float32)

    def kern(c_ref, o_ref):
        acc = jnp.zeros((R, L), jnp.float32)
        for k in range(n_arrays):
            x = (c_ref[...] + k).reshape(R, 1)
            acc = acc + jnp.broadcast_to(x, (R, L))
        o_ref[...] = acc

    try:
        f = pl.pallas_call(
            kern,
            grid=(grid_n,),
            out_shape=jax.ShapeDtypeStruct((grid_n, R, L), jnp.float32),
            in_specs=[pl.BlockSpec((1, 18, L), lambda n: (n, 0, 0), memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((1, R, L), lambda n: (n, 0, 0), memory_space=pltpu.VMEM),
        )
        f = jax.jit(lambda a: f(a))
        dt = _time(f, (c,), reps=20)
        print(
            f"[relayout] {n_arrays} x (18,128)->(2304,1) per body x {grid_n}: "
            f"{dt*1e3:.2f} ms/call, {dt/(n_arrays*grid_n)*1e6:.2f} us/relayout"
        )
    except Exception as e:
        print(f"[relayout] FAILED - {type(e).__name__}: {str(e)[:300]}")


# ---------------------------------------------------------------- 4. baseline
def measure_hbm_gather(n_bodies=256, n_verts=10475, dim=128):
    rng = np.random.default_rng(0)
    packed = jnp.asarray(rng.standard_normal((4, dim, dim, dim, 8)), jnp.float32)
    rows = packed.reshape(-1, 8)
    idx = jnp.asarray(rng.integers(0, rows.shape[0], (n_bodies, n_verts)), jnp.int32)

    @jax.jit
    def f(rows, idx):
        return jnp.take(rows, idx, axis=0).sum(axis=-1)

    dt = _time(f, (rows, idx), reps=20)
    n_idx = n_bodies * n_verts
    print(
        f"[hbm-gather] packed rows, {n_idx} indices: {dt*1e3:.2f} ms/call, "
        f"{dt/n_idx*1e9:.2f} ns/index"
    )
    return dt


if __name__ == "__main__":
    print(f"devices: {jax.devices()}")
    which = sys.argv[1:] or ["support", "throughput", "relayout", "hbm"]
    if "support" in which:
        check_support()
    if "throughput" in which:
        measure_throughput()
    if "relayout" in which:
        measure_relayout()
    if "hbm" in which:
        measure_hbm_gather()
