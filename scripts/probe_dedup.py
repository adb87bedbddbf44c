"""Measure the building blocks of a unique-cell SDF gather-row dedup.

The full fit pass gathers one packed-corner row per vertex (2.68 M rows
at bench shapes, ~8 ns/row => ~21 ms). A body's 10475 verts occupy only
~1-3 k distinct cells, so a dedup scheme (sort ids -> gather one row per
distinct cell -> broadcast back) fetches the same values with far fewer
BIG-TABLE rows — but it pays for a sort, a scatter, and a broadcast-back
gather from a SMALL per-body table. Whether it wins is decided by:

  1. ns/row of jnp.take as a function of TABLE size (is a small-table
     gather cheaper than the big-grid gather?)
  2. cost of jnp.sort / argsort over [B, N] int32 at fit shapes
  3. cost of the scatter building the compact table
  4. cost of take_along_axis from a per-body [B, K, 8] table

    python scripts/probe_dedup.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

B, N = 256, 10475
ITERS = 20
REPS = 3


def timeit(fn, *args):
    # block_until_ready under-synchronizes through the axon tunnel; force
    # a host materialization like profile_gather.py does
    acc = float(np.asarray(fn(*args)).sum())  # compile + warmup
    t0 = time.time()
    for _ in range(REPS):
        acc += float(np.asarray(fn(*args)).sum())
    return (time.time() - t0) / REPS / ITERS, acc


def probe_table_size():
    print("== gather ns/row vs table rows (width 8, f32, random idx) ==", flush=True)
    rng = np.random.default_rng(0)
    for R in [1024, 4096, 16384, 131072, 1048576, 8388608]:
        table = jnp.asarray(rng.normal(size=(R, 8)).astype(np.float32))
        idx = jnp.asarray(rng.integers(0, R, size=(B, N)).astype(np.int32))

        @jax.jit
        def run(table, idx):
            def step(acc, i):
                c = jnp.take(table, (idx + i) % R, axis=0)
                return acc + c.sum(axis=-1), None

            out, _ = jax.lax.scan(step, jnp.zeros((B, N), jnp.float32),
                                  jnp.arange(ITERS, dtype=jnp.int32))
            return out

        dt, _ = timeit(run, table, idx)
        print(f"  R={R:<9} {dt*1e3:7.3f} ms/iter  {dt/(B*N)*1e9:6.2f} ns/row", flush=True)


def probe_per_body_table():
    print("== take_along_axis from per-body [B, K, 8] tables ==", flush=True)
    rng = np.random.default_rng(0)
    for K in [512, 1024, 2048, 4096]:
        table = jnp.asarray(rng.normal(size=(B, K, 8)).astype(np.float32))
        idx = jnp.asarray(rng.integers(0, K, size=(B, N)).astype(np.int32))

        @jax.jit
        def run(table, idx):
            def step(acc, i):
                c = jnp.take_along_axis(table, ((idx + i) % K)[:, :, None], axis=1)
                return acc + c.sum(axis=-1), None

            out, _ = jax.lax.scan(step, jnp.zeros((B, N), jnp.float32),
                                  jnp.arange(ITERS, dtype=jnp.int32))
            return out

        dt, _ = timeit(run, table, idx)
        print(f"  K={K:<6} {dt*1e3:7.3f} ms/iter  {dt/(B*N)*1e9:6.2f} ns/row", flush=True)


def probe_sort():
    print("== sort / argsort / scatter at [B, N] int32 ==", flush=True)
    rng = np.random.default_rng(0)
    # body-like ids: ~2k distinct values per row
    idx = jnp.asarray(rng.integers(0, 2048, size=(B, N)).astype(np.int32) * 37 + 5)

    @jax.jit
    def run_sort(idx):
        def step(acc, i):
            s = jnp.sort(idx + i, axis=1)
            return acc + s[:, ::997].sum(axis=-1), None

        out, _ = jax.lax.scan(step, jnp.zeros((B,), jnp.int32),
                              jnp.arange(ITERS, dtype=jnp.int32))
        return out

    dt, _ = timeit(run_sort, idx)
    print(f"  sort        {dt*1e3:7.3f} ms/iter", flush=True)

    @jax.jit
    def run_argsort(idx):
        def step(acc, i):
            o = jnp.argsort(idx + i, axis=1)
            return acc + o[:, ::997].sum(axis=-1).astype(jnp.int32), None

        out, _ = jax.lax.scan(step, jnp.zeros((B,), jnp.int32),
                              jnp.arange(ITERS, dtype=jnp.int32))
        return out

    dt, _ = timeit(run_argsort, idx)
    print(f"  argsort     {dt*1e3:7.3f} ms/iter", flush=True)

    @jax.jit
    def run_sort_pair(idx):
        # sort ids AND carry the permutation (sort a (ids, iota) pair) —
        # what the dedup scheme actually needs
        def step(acc, i):
            s, o = jax.lax.sort((idx + i, jnp.broadcast_to(
                jnp.arange(N, dtype=jnp.int32)[None], (B, N))), dimension=1, num_keys=1)
            return acc + (s[:, ::997] + o[:, ::997]).sum(axis=-1), None

        out, _ = jax.lax.scan(step, jnp.zeros((B,), jnp.int32),
                              jnp.arange(ITERS, dtype=jnp.int32))
        return out

    dt, _ = timeit(run_sort_pair, idx)
    print(f"  sort pair   {dt*1e3:7.3f} ms/iter", flush=True)

    K = 4096
    ranks = jnp.asarray(np.minimum(np.sort(
        rng.integers(0, K, size=(B, N))), K - 1).astype(np.int32))
    vals = jnp.asarray(rng.integers(0, 1 << 20, size=(B, N)).astype(np.int32))

    @jax.jit
    def run_scatter(ranks, vals):
        def step(acc, i):
            t = jnp.zeros((B, K), jnp.int32)
            t = jax.vmap(lambda tb, r, v: tb.at[r].set(v))(t, ranks, vals + i)
            return acc + t[:, ::997].sum(axis=-1), None

        out, _ = jax.lax.scan(step, jnp.zeros((B,), jnp.int32),
                              jnp.arange(ITERS, dtype=jnp.int32))
        return out

    dt, _ = timeit(run_scatter, ranks, vals)
    print(f"  scatter set [B,N]->[B,{K}] {dt*1e3:7.3f} ms/iter", flush=True)

    @jax.jit
    def run_cumsum(idx):
        def step(acc, i):
            f = (idx + i != jnp.roll(idx + i, 1, axis=1)).astype(jnp.int32)
            r = jnp.cumsum(f, axis=1)
            return acc + r[:, ::997].sum(axis=-1), None

        out, _ = jax.lax.scan(step, jnp.zeros((B,), jnp.int32),
                              jnp.arange(ITERS, dtype=jnp.int32))
        return out

    dt, _ = timeit(run_cumsum, idx)
    print(f"  flags+cumsum {dt*1e3:7.3f} ms/iter", flush=True)


if __name__ == "__main__":
    probe_table_size()
    probe_per_body_table()
    probe_sort()
