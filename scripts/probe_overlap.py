"""Does XLA overlap a packed-row gather with INDEPENDENT dense compute?

The full fit pass is gather-bound (21 ms of 2.68 M packed-corner rows vs
~6-13 ms of dense LBS/NN/backward work, BENCH_r04 roofline). Round 4's
NN-fetch experiment proved *some* gather DMA hides under dense compute
(removing a 2.9 ms-isolated gather changed in-context time by ~0).

This probe measures the limit case for a population-chunked fit
iteration (split the body axis in two; chunk A's gather and chunk B's
dense chain are data-independent inside one scan body):

  t_gather : scan of gather-only iterations  (2.68 M rows/iter)
  t_dense  : scan of matmul-chain iterations (~gather-scale wall)
  t_both   : scan where each iteration does BOTH, independently

  overlap fraction = (t_gather + t_dense - t_both) / min(t_gather, t_dense)

~1.0 -> scheduler hides the smaller cost entirely (chunking wins);
~0.0 -> serial issue, chunking cannot help the gather wall.

    python scripts/probe_overlap.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

B, N = 256, 10475
GRID_ROWS = 128 ** 3
ITERS = 20
REPS = 3
# dense chain sized to roughly match the gather wall (~20 ms/iter):
# K x [M, M] @ [M, M] bf16 matmuls
M, KMM = 2048, 120


def timeit(fn, *args):
    acc = float(np.asarray(fn(*args)).sum())  # compile + warmup
    t0 = time.time()
    for _ in range(REPS):
        acc += float(np.asarray(fn(*args)).sum())
    return (time.time() - t0) / REPS / ITERS, acc


def main():
    rng = np.random.default_rng(0)
    table = jnp.asarray(rng.normal(size=(GRID_ROWS, 8)).astype(np.float32))
    idx = jnp.asarray(rng.integers(0, GRID_ROWS, size=(B, N)).astype(np.int32))
    a = jnp.asarray(rng.normal(size=(M, M)).astype(np.float32), dtype=jnp.bfloat16)

    def gather_once(i):
        c = jnp.take(table, (idx + i) % GRID_ROWS, axis=0)
        return c.sum(axis=-1)

    def dense_once(x):
        def mm(y, _):
            y = jnp.dot(y, a)
            # renormalize so values stay finite across the chain
            return (y / (jnp.float32(M) ** 0.5)).astype(jnp.bfloat16), None
        y, _ = jax.lax.scan(mm, x, None, length=KMM)
        return y

    @jax.jit
    def run_gather(table, idx):
        def step(acc, i):
            return acc + gather_once(i), None
        out, _ = jax.lax.scan(step, jnp.zeros((B, N), jnp.float32),
                              jnp.arange(ITERS, dtype=jnp.int32))
        return out

    @jax.jit
    def run_dense(a):
        def step(y, _):
            return dense_once(y), None
        out, _ = jax.lax.scan(step, a, None, length=ITERS)
        return out.astype(jnp.float32)

    @jax.jit
    def run_both(table, idx, a):
        def step(carry, i):
            acc, y = carry
            return (acc + gather_once(i), dense_once(y)), None
        (out, y), _ = jax.lax.scan(step, (jnp.zeros((B, N), jnp.float32), a),
                                   jnp.arange(ITERS, dtype=jnp.int32))
        return out.sum() + y.astype(jnp.float32).sum()

    tg, _ = timeit(run_gather, table, idx)
    td, _ = timeit(run_dense, a)
    tb, _ = timeit(run_both, table, idx, a)
    ov = (tg + td - tb) / min(tg, td)
    print(f"gather-only {tg*1e3:7.3f} ms/iter  ({B*N} rows)", flush=True)
    print(f"dense-only  {td*1e3:7.3f} ms/iter  ({KMM} x {M}^3 bf16 matmuls)", flush=True)
    print(f"both        {tb*1e3:7.3f} ms/iter  (serial sum {1e3*(tg+td):.3f})", flush=True)
    print(f"overlap fraction of min-resource: {ov:5.2f}", flush=True)


if __name__ == "__main__":
    main()
