"""Measure the NN winner-fetch gather — record of a NEGATIVE result.

The fit loop's contact refresh (psi_tpu/ops/chamfer.py::chamfer_one_sided_nn)
runs the Pallas argmin kernel, then fetches the winning neighbour's
coordinates with ``jnp.take_along_axis(y, idx[..., None], axis=1)`` —
a [B, N]-row random-access HBM gather. Measured IN ISOLATION it costs
2.93 ms at fit shapes (9.2 ns/row, 54% of the pass), so round 4 built
an in-kernel replacement: a one-hot MXU matmul against an exact 3-way
bf16 split of y (bitwise-identical y_nn, 5.44 -> 3.70 ms/pass
standalone, with-gradient variant 5.68 -> 3.95).

It REGRESSED the fit: nn_only segment 8.59 -> 9.76 ms/iter, full
26.83 -> 28.00 (same-day A/B, scripts/profile_segments.py). Bisection
with a prune-in-the-loop microbench reproduced it (+2.95 ms with the
new kernel vs +0.08 with the gather; an optimization_barrier between
prune and chamfer changed nothing): inside the real program XLA hides
the winner gather's DMA under the adjacent dense work (prune einsum,
decode, collision math), so the gather costs ~nothing in context,
while the in-kernel extraction adds ~1.1 ms of *serial* kernel time.
The change was reverted; this script survives as the measurement
harness and regression check (with_fetch minus argmin_only ~= the
isolated gather cost — expect ~3 ms standalone and do NOT conclude
it's worth removing without an in-context A/B).

Timings are scan-looped to multi-second walls (the only trustworthy
protocol through the tunnel).

Usage: python scripts/profile_nn_fetch.py [B N M iters]
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from psi_tpu.ops.chamfer import _nn_one_direction, chamfer_one_sided_nn

B, N, M = 256, 1455, 2048
ITERS = 50
if len(sys.argv) > 1:
    B, N, M = map(int, sys.argv[1:4])
if len(sys.argv) > 4:
    ITERS = int(sys.argv[4])

key = jax.random.PRNGKey(0)
kx, ky = jax.random.split(key)
x0 = jax.random.normal(kx, (B, N, 3), jnp.float32)
y = jax.random.normal(ky, (B, M, 3), jnp.float32) * 1.5


def loop(f):
    @jax.jit
    def run(x0):
        def body(c, k):
            x = c + 0.001 * k  # distinct input each iter (defeat CSE)
            return c, f(x)
        _, outs = jax.lax.scan(body, x0, jnp.arange(ITERS, dtype=jnp.float32))
        return jax.tree.map(lambda o: o.sum(), outs)
    return run


def with_fetch(x):
    d1, y_nn = chamfer_one_sided_nn(x, y)
    return d1.sum() + y_nn.sum()


def argmin_only(x):
    # kernel + a cheap consumption of idx; no coordinate fetch
    out = _nn_one_direction(x, y, "auto")
    return out[1].sum()


def fetch_only(x):
    # isolate the take_along_axis row gather itself: indices derived
    # from x cheaply (no NN kernel)
    idx = (jnp.abs(x[..., 0]) * 997).astype(jnp.int32) % M
    y_nn = jnp.take_along_axis(y, idx[..., None], axis=1)
    return y_nn.sum()


def timed(name, f):
    run = loop(f)
    out = run(x0)
    jax.block_until_ready(out)
    best = 1e9
    for _ in range(3):
        t0 = time.perf_counter()
        out = run(x0)
        jax.block_until_ready(out)
        best = min(best, time.perf_counter() - t0)
    per = best / ITERS * 1e3
    print(f"{name:>14}: {per:7.3f} ms/pass   (wall {best:.3f}s / {ITERS})")
    return per


if __name__ == "__main__":
    print(f"shapes: B={B} N={N} M={M}, {ITERS} passes per program")
    t_full = timed("with_fetch", with_fetch)
    t_arg = timed("argmin_only", argmin_only)
    t_gather = timed("fetch_only", fetch_only)
    print(f"implied fetch cost inside NN pass: {t_full - t_arg:.3f} ms "
          f"({(t_full - t_arg) / t_full * 100:.0f}% of the pass) — "
          f"NOTE: hidden under dense work in the real fit program (see docstring)")
