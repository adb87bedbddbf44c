"""A/B the population-chunked fit (FitConfig.overlap_chunks) on TPU.

probe_overlap.py measured the gather engine fully concurrent with dense
MXU work (overlap fraction ~1.0 on independent chains). This script
decides whether chunking the REAL fit program wins: exact mode (every
iteration is a gather-bound full pass — the verdict target) and the
production refresh config, at bench shapes, overlap_chunks in {1,2,4}.

Timing per ROUND_NOTES protocol: median of 8 groups x 2 reps, distinct
PRNG inputs per rep, block_until_ready per group.

    python scripts/profile_overlap_fit.py
"""

import dataclasses
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from psi_tpu.data.synthetic import make_synthetic_assets, random_body_batch, random_camera_batch
from psi_tpu.fit.fitting import make_fit_step
from psi_tpu.utils.config import FitConfig

N = 256
NUM_ITER = 20
GROUPS, REPS = 8, 2


def measure(fit, xs, cam_ext, scene_idx):
    out = fit(xs[0], cam_ext, scene_idx)[0]
    out.block_until_ready()
    dts = []
    for g in range(GROUPS):
        t0 = time.time()
        for r in range(REPS):
            out = fit(xs[(g * REPS + r) % len(xs)], cam_ext, scene_idx)[0]
        out.block_until_ready()
        dts.append((time.time() - t0) / REPS)
    return float(np.median(dts)), min(dts), max(dts)


def main():
    asset_kw = dict(num_verts=10475, num_joints=55, num_scenes=4, sdf_dim=128,
                    scene_points=20000, n_contact=1455, seed=0)
    assets_f32, _ = make_synthetic_assets(**asset_kw)
    assets_bf16, _ = make_synthetic_assets(**asset_kw, sdf_dtype=jnp.bfloat16)
    rng = np.random.default_rng(0)
    cam_ext = jnp.asarray(random_camera_batch(rng, N)[0])
    scene_idx = jnp.zeros((N,), jnp.int32)
    max_d = np.full((N,), 5.0, np.float32)
    xs = [jnp.asarray(random_body_batch(rng, N, max_d)) for _ in range(6)]

    cases = []
    for c in (1, 2, 4):
        cases.append((f"exact   C={c}", assets_f32,
                      dataclasses.replace(FitConfig.exact(num_iter=NUM_ITER), overlap_chunks=c)))
    for c in (1, 2, 4):
        cases.append((f"product C={c}", assets_bf16,
                      dataclasses.replace(FitConfig.production(num_iter=NUM_ITER), overlap_chunks=c)))

    print(f"N={N} iters={NUM_ITER} groups={GROUPS}x{REPS} (median)")
    for name, assets, cfg in cases:
        fit = make_fit_step(assets, cfg, want_metrics=False)
        med, lo, hi = measure(fit, xs, cam_ext, scene_idx)
        print(f"{name}: {med*1e3:8.1f} ms  ({med/NUM_ITER*1e3:6.2f} ms/iter; "
              f"spread {lo*1e3:.1f}-{hi*1e3:.1f}; {N/med:7.1f} bodies/s fit-only)",
              flush=True)


if __name__ == "__main__":
    main()
