"""Test the vertex-layout hypothesis (run on real TPU).

profile_lbs.py shows every [B, V, 3]-shaped stage of the LBS chain
running ~5-8x above its HBM traffic bound (e.g. the camera-extrinsics
transform: ~130 MB of fwd+bwd traffic, >1.3 ms measured vs ~0.16 ms at
819 GB/s). Hypothesis: XLA:TPU lays the arrays out with the
3-coordinate axis minor, so every 8x128 vector tile carries 3 useful
lanes out of 128. This microbench times the SAME camera transform
fwd+bwd in both layouts:

  vertex-major  verts [B, V, 3]:  einsum('bxy,bvy->bvx', R, verts) + t
  coord-major   verts [B, 3, V]:  einsum('bxy,byv->bxv', R, verts) + t

    python scripts/profile_layout.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

B, V = 256, 10475
NUM_ITER = 20


def bench(name, step_fn, x0):
    @jax.jit
    def run(x):
        out, _ = jax.lax.scan(step_fn, x, None, length=NUM_ITER)
        return out

    out = run(x0)
    jax.block_until_ready(out)
    reps = 5
    t0 = time.time()
    for _ in range(reps):
        out = run(out)
    jax.block_until_ready(out)
    dt = (time.time() - t0) / reps / NUM_ITER * 1e3
    tb = 4 * (B * V * 3 * 4) / 819e9 * 1e3  # ~4 passes over verts-sized data
    print(f"{name:<22} {dt:8.3f} ms/iter   (~{tb:.3f} ms traffic bound)", flush=True)


def main():
    rng = np.random.default_rng(0)
    R = jnp.asarray(rng.normal(size=(B, 3, 3)).astype(np.float32))
    t = jnp.asarray(rng.normal(size=(B, 3)).astype(np.float32))

    v_bv3 = jnp.asarray(rng.normal(size=(B, V, 3)).astype(np.float32))

    def step_bv3(x, _):
        def f(xx):
            out = jnp.einsum("bxy,bvy->bvx", R, xx) + t[:, None, :]
            return jnp.sum(out * out)
        return x - 1e-4 * jax.grad(f)(x), None

    v_b3v = jnp.asarray(np.transpose(np.asarray(v_bv3), (0, 2, 1)).copy())

    def step_b3v(x, _):
        def f(xx):
            out = jnp.einsum("bxy,byv->bxv", R, xx) + t[:, :, None]
            return jnp.sum(out * out)
        return x - 1e-4 * jax.grad(f)(x), None

    bench("camext vertex-major", step_bv3, v_bv3)
    bench("camext coord-major", step_b3v, v_b3v)

    # skinning blend in both layouts: T = W@A then apply to v_posed
    J = 55
    W = jnp.asarray(rng.normal(size=(V, J)).astype(np.float32))
    A12 = jnp.asarray(rng.normal(size=(B, J, 12)).astype(np.float32))

    def step_skin_bv3(x, _):
        def f(xx):
            T = jnp.einsum("vj,bjz->bvz", W, A12, preferred_element_type=jnp.float32)
            T34 = T.reshape(B, V, 3, 4)
            out = jnp.einsum("bvxy,bvy->bvx", T34[..., :3], xx) + T34[..., 3]
            return jnp.sum(out * out)
        return x - 1e-4 * jax.grad(f)(x), None

    Wt = jnp.asarray(np.asarray(W).T.copy())  # [J, V]
    A12t = jnp.asarray(np.transpose(np.asarray(A12), (0, 2, 1)).copy())  # [B, 12, J]

    def step_skin_b3v(x, _):
        def f(xx):
            T = jnp.einsum("bzj,jv->bzv", A12t, Wt, preferred_element_type=jnp.float32)
            # T rows are (x,y) pairs: row 4x+y holds R[x,y] (y<3), 4x+3 the translation
            out = jnp.stack([
                T[:, 4 * x + 0] * xx[:, 0] + T[:, 4 * x + 1] * xx[:, 1]
                + T[:, 4 * x + 2] * xx[:, 2] + T[:, 4 * x + 3]
                for x in range(3)
            ], axis=1)
            return jnp.sum(out * out)
        return x - 1e-4 * jax.grad(f)(x), None

    bench("skin   vertex-major", step_skin_bv3, v_bv3)
    bench("skin   coord-major", step_skin_b3v, v_b3v)


if __name__ == "__main__":
    main()
