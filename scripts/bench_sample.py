"""Sampling-latency bench (encode-once population sampling).

Timing per ROUND_NOTES.md: many reps with DISTINCT inputs, totals in
seconds — sub-second tunnel timings are unreliable.
"""
import sys, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import time
import numpy as np, jax, jax.numpy as jnp
from psi_tpu.models import HumanCVAES1
from psi_tpu.gen.sample import generate_bodies, generate_bodies_rows

N, R, REPS = 256, 16, 60
mdl = HumanCVAES1(latentD=256)
variables = mdl.init(jax.random.PRNGKey(0), jnp.zeros((1, 75)), jnp.zeros((1, 128, 128, 2)))
rng = np.random.RandomState(0)
cam_int = jnp.asarray(np.eye(3, dtype=np.float32)[None] * 500)
max_d = jnp.asarray([6.0], jnp.float32)

xs_all = jnp.asarray(rng.randn(REPS + 1, 1, 128, 128, 2).astype(np.float32))
out = generate_bodies(mdl, variables, xs_all[0], cam_int, max_d, N, jax.random.PRNGKey(1))
out.block_until_ready()
outs = []
t0 = time.time()
for i in range(REPS):
    outs.append(generate_bodies(mdl, variables, xs_all[1 + i], cam_int, max_d, N, jax.random.PRNGKey(2 + i)))
for o in outs:
    o.block_until_ready()
dt = (time.time() - t0) / REPS
print(f"generate_bodies ({N} bodies, 1 snapshot): {dt*1e3:.1f} ms  [total {dt*REPS:.1f}s]")

cam_stack = jnp.broadcast_to(cam_int, (R, 3, 3))
max_stack = jnp.full((R,), 6.0, jnp.float32)
ridx = jnp.asarray(np.arange(N) % R, jnp.int32)
stacks = jnp.asarray(rng.randn(REPS + 1, R, 128, 128, 2).astype(np.float32))
out = generate_bodies_rows(mdl, variables, stacks[0], cam_stack, max_stack, ridx, jax.random.PRNGKey(9))
out.block_until_ready()
outs = []
t0 = time.time()
for i in range(REPS):
    outs.append(generate_bodies_rows(mdl, variables, stacks[1 + i], cam_stack, max_stack, ridx, jax.random.PRNGKey(10 + i)))
for o in outs:
    o.block_until_ready()
dt = (time.time() - t0) / REPS
print(f"generate_bodies_rows ({N} rows, {R} snapshots): {dt*1e3:.1f} ms  [total {dt*REPS:.1f}s]")
