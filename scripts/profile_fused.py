"""Measure the fused Pallas decode+LBS kernel on the real TPU.

Round-3 verdict item 1: ops/fused_skinning.py was written and tested but
never timed on hardware. This script times make_fit_step at bench shapes
(N=256, V=10475, C=1455, M=20000, 128^3 SDF) for every lbs_precision
tier in both the production refresh config and reference-exact mode,
using the bench.py number-of-record protocol (median over >=10 timed
groups, distinct inputs per rep).

    python scripts/profile_fused.py [--groups 10] [--reps 2]
"""

import json
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

N_BODIES = 256
NUM_ITER = 20
N_CONTACT = 1455
SCENE_POINTS = 20000
SDF_DIM = 128


def main():
    groups = int(sys.argv[sys.argv.index("--groups") + 1]) if "--groups" in sys.argv else 10
    reps = int(sys.argv[sys.argv.index("--reps") + 1]) if "--reps" in sys.argv else 2

    asset_kw = dict(
        num_verts=10475, num_joints=55, num_scenes=4, sdf_dim=SDF_DIM,
        scene_points=SCENE_POINTS, n_contact=N_CONTACT, seed=0,
    )
    assets_f32, _ = make_synthetic_assets(**asset_kw)
    assets_bf16, _ = make_synthetic_assets(**asset_kw, sdf_dtype=jnp.bfloat16)

    rng = np.random.default_rng(0)
    cam_ext = jnp.asarray(random_camera_batch(rng, N_BODIES)[0])
    scene_idx = jnp.zeros((N_BODIES,), jnp.int32)
    max_d = np.full((N_BODIES,), 5.0, np.float32)
    n_inputs = groups * reps
    xs = [jnp.asarray(random_body_batch(rng, N_BODIES, max_d)) for _ in range(n_inputs)]

    variants = {
        # production refresh config, three LBS tiers
        "refresh10_fast": (assets_bf16, FitConfig(num_iter=NUM_ITER, refresh_every=10,
                                                  lbs_precision="fast")),
        "refresh10_fused": (assets_bf16, FitConfig(num_iter=NUM_ITER, refresh_every=10,
                                                   lbs_precision="fused")),
        # reference-exact mode (every-iter full pass, f32 grids)
        "exact_high": (assets_f32, FitConfig(num_iter=NUM_ITER)),
        "exact_fast": (assets_f32, FitConfig(num_iter=NUM_ITER, lbs_precision="fast")),
        "exact_fused": (assets_f32, FitConfig(num_iter=NUM_ITER, lbs_precision="fused")),
    }

    results = {}
    vref = None
    print(f"{'variant':<18} {'median s':>9} {'ms/iter':>8} {'bodies/s':>9}  spread", flush=True)
    for name, (assets, cfg) in variants.items():
        fit = make_fit_step(assets, cfg, want_metrics=False)
        out = fit(xs[0], cam_ext, scene_idx)[0]
        out.block_until_ready()
        if vref is None:
            vref = np.asarray(out)
        dts = []
        k = 0
        for g in range(groups):
            t0 = time.time()
            for _ in range(reps):
                out = fit(xs[k], cam_ext, scene_idx)[0]
                k += 1
            out.block_until_ready()
            dts.append((time.time() - t0) / reps)
        dt = float(np.median(dts))
        results[name] = {
            "median_s": round(dt, 4),
            "ms_per_iter": round(dt / NUM_ITER * 1e3, 2),
            "bodies_per_sec": round(N_BODIES / dt, 1),
            "group_s": [round(x, 4) for x in dts],
        }
        print(f"{name:<18} {dt:9.3f} {dt / NUM_ITER * 1e3:8.2f} {N_BODIES / dt:9.1f}  "
              f"[{min(dts):.3f}, {max(dts):.3f}]", flush=True)

    print(json.dumps(results))


if __name__ == "__main__":
    main()
