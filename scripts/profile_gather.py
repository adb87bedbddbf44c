"""Raw TPU gather characterization: what does jnp.take cost per row as a
function of row width, dtype, and index locality?  Informs the SDF
lookup design (1 row per vertex; 2.68M rows/iter at fit shapes).

    python scripts/profile_gather.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

B, N = 256, 10475
R = 4 * 128 * 128 * 128  # table rows (4 scenes x 128^3)
ITERS = 20


def harness(width, dtype, sorted_idx, reps=3):
    rng = np.random.default_rng(0)
    table = jnp.asarray(rng.normal(size=(R, width)).astype(dtype))

    idxs = []
    for i in range(reps + 1):
        idx = rng.integers(0, R, size=(B, N)).astype(np.int32)
        if sorted_idx == "sorted":
            idx = np.sort(idx, axis=1)
        elif sorted_idx == "local":
            # per body: random base cell + small offsets (body-like locality)
            base = rng.integers(0, R - 70000, size=(B, 1))
            idx = (base + rng.integers(0, 65536, size=(B, N))).astype(np.int32)
        idxs.append(jnp.asarray(idx))

    @jax.jit
    def run(table, idx):
        def step(acc, i):
            # index depends on the loop counter so the gather cannot be
            # hoisted out of the scan as loop-invariant
            c = jnp.take(table, (idx + i) % R, axis=0)  # [B, N, width]
            return acc + c.sum(axis=-1), None

        out, _ = jax.lax.scan(
            step, jnp.zeros((B, N), jnp.float32), jnp.arange(ITERS, dtype=jnp.int32)
        )
        return out

    acc = float(np.asarray(run(table, idxs[0])).sum())  # warmup, force to host
    t0 = time.time()
    for i in range(reps):
        acc += float(np.asarray(run(table, idxs[1 + i])).sum())
    dt = (time.time() - t0) / reps
    ns_per_row = dt / ITERS / (B * N) * 1e9
    print(f"width={width:<4} {str(np.dtype(dtype)):<9} {sorted_idx:<7} "
          f"{dt/ITERS*1e3:7.2f} ms/iter  {ns_per_row:6.2f} ns/row  (acc={acc:.3g})", flush=True)


def main():
    for width, dtype in [(8, np.float32), (8, np.float16), (16, np.float32),
                         (32, np.float32), (128, np.float32), (1, np.float32)]:
        # bf16 isn't a numpy dtype; use jnp cast inside harness for it
        harness(width, dtype, "random")
    # locality sensitivity at the production width
    for mode in ["sorted", "local"]:
        harness(8, np.float32, mode)
    # bf16 rows
    rngw = 8
    import numpy as _np
    rng = _np.random.default_rng(0)
    table = jnp.asarray(rng.normal(size=(R, rngw)).astype(np.float32)).astype(jnp.bfloat16)
    idxs = [jnp.asarray(rng.integers(0, R, size=(B, N)).astype(np.int32)) for _ in range(4)]

    @jax.jit
    def run(table, idx):
        def step(acc, i):
            c = jnp.take(table, (idx + i) % R, axis=0).astype(jnp.float32)
            return acc + c.sum(axis=-1), None

        out, _ = jax.lax.scan(
            step, jnp.zeros((B, N), jnp.float32), jnp.arange(ITERS, dtype=jnp.int32)
        )
        return out

    acc = float(np.asarray(run(table, idxs[0])).sum())
    t0 = time.time()
    for i in range(3):
        acc += float(np.asarray(run(table, idxs[1 + i])).sum())
    dt = (time.time() - t0) / 3
    print(f"width=8    bfloat16  random  {dt/ITERS*1e3:7.2f} ms/iter  "
          f"{dt/ITERS/(B*N)*1e9:6.2f} ns/row  (acc={acc:.3g})", flush=True)


if __name__ == "__main__":
    main()
