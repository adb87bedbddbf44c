"""SDF lookup variant shootout (run on the real TPU).

Times grad(sum(sdf_lookup(verts))) over a 20-iter scan at fit shapes
(256 bodies x 10475 verts, 128^3 grids, 4 scenes) for several
implementations, to pick the production one.

    python scripts/profile_sdf.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from psi_tpu.ops.sdf import pack_sdf_corners, sdf_trilinear_packed, sdf_trilinear_stacked

B, V, DIM, S = 256, 10475, 128, 4
ITERS = 20


def packed_unrolled(sdf_packed, scene_idx, points, grid_mins, grid_maxs):
    """Like sdf_trilinear_packed but weights unrolled (no [B,N,8] concats)."""
    S_, D, H, W, _ = sdf_packed.shape
    gmin = grid_mins[scene_idx]
    gmax = grid_maxs[scene_idx]
    norm = (points - gmin[:, None, :]) / (gmax[:, None, :] - gmin[:, None, :]) * 2.0 - 1.0

    def unnorm(c, size):
        return jnp.clip(((c + 1.0) * size - 1.0) / 2.0, 0.0, float(size - 1))

    cx = unnorm(norm[..., 0], D)
    cy = unnorm(norm[..., 1], H)
    cz = unnorm(norm[..., 2], W)
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

    ux, uy, uz = 1 - wx, 1 - wy, 1 - wz
    c00 = c[..., 0] * uz + c[..., 1] * wz
    c01 = c[..., 2] * uz + c[..., 3] * wz
    c10 = c[..., 4] * uz + c[..., 5] * wz
    c11 = c[..., 6] * uz + c[..., 7] * wz
    c0 = c00 * uy + c01 * wy
    c1 = c10 * uy + c11 * wy
    return c0 * ux + c1 * wx


def main():
    rng = np.random.default_rng(0)
    sdf_stack = jnp.asarray(rng.normal(size=(S, DIM, DIM, DIM)).astype(np.float32))
    packed = pack_sdf_corners(sdf_stack)
    packed_bf16 = packed.astype(jnp.bfloat16)
    grid_mins = jnp.asarray(np.full((S, 3), -4.0, np.float32))
    grid_maxs = jnp.asarray(np.full((S, 3), 4.0, np.float32))
    scene_idx = jnp.zeros((B,), jnp.int32)

    pts = [jnp.asarray(rng.uniform(-4, 4, size=(B, V, 3)).astype(np.float32)) for _ in range(4)]

    def harness(fn, table, grad=True):
        # table threaded as a jit ARGUMENT: closing over it would bake
        # the (hundreds of MB) grid into the program as a constant
        @jax.jit
        def one(table, points):
            def loss(p):
                return jnp.sum(fn(table, p))

            def step(p, _):
                if grad:
                    g = jax.grad(loss)(p)
                    return p + 1e-6 * g, None
                return p + 1e-6 * fn(table, p).sum(), None

            out, _ = jax.lax.scan(step, points, None, length=ITERS)
            return out

        return lambda points: one(table, points)

    variants = {
        "packed_f32": harness(lambda t, p: sdf_trilinear_packed(t, scene_idx, p, grid_mins, grid_maxs), packed),
        "packed_bf16": harness(lambda t, p: packed_unrolled(t, scene_idx, p, grid_mins, grid_maxs), packed_bf16),
        "packed_unrolled": harness(lambda t, p: packed_unrolled(t, scene_idx, p, grid_mins, grid_maxs), packed),
        "stacked_8gather": harness(lambda t, p: sdf_trilinear_stacked(t, scene_idx, p, grid_mins, grid_maxs), sdf_stack),
        "packed_f32_fwdonly": harness(lambda t, p: sdf_trilinear_packed(t, scene_idx, p, grid_mins, grid_maxs), packed, grad=False),
    }

    print(f"{'variant':<22} {'s/rep':>8} {'ms/iter':>8}")
    for name, fn in variants.items():
        out = fn(pts[0])
        out.block_until_ready()
        t0 = time.time()
        reps = 3
        for i in range(reps):
            out = fn(pts[1 + i])
        out.block_until_ready()
        dt = (time.time() - t0) / reps
        print(f"{name:<22} {dt:8.3f} {dt / ITERS * 1e3:8.1f}", flush=True)


if __name__ == "__main__":
    main()
