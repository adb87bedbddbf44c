"""Refresh-cadence throughput A/B at PROX-E bench shapes (real TPU).

Round 3 swept refresh_every in {1 (exact), 5, 10} and adopted 10; 15
and 20 were never tried. The round-5 decomposition shows the full
(refresh) iterations are ~74% of the production fit wall, so a longer
cadence is the largest remaining headline lever. Quality is validated
separately by the paired multi-seed protocol harness
(scripts/protocol_multiseed.py --refresh "10,15,20").

    python scripts/profile_refresh_cadence.py [--groups 8] [--reps 2]
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

N_BODIES, NUM_ITER = 256, 20


def main():
    groups = int(sys.argv[sys.argv.index("--groups") + 1]) if "--groups" in sys.argv else 8
    reps = int(sys.argv[sys.argv.index("--reps") + 1]) if "--reps" in sys.argv else 2

    assets, _ = make_synthetic_assets(
        num_verts=10475, num_joints=55, num_scenes=4, sdf_dim=128,
        scene_points=20000, n_contact=1455, seed=0, sdf_dtype=jnp.bfloat16,
    )
    rng = np.random.default_rng(0)
    cam_ext = jnp.asarray(random_camera_batch(rng, N_BODIES)[0])
    scene_idx = jnp.zeros((N_BODIES,), jnp.int32)
    max_d = np.full((N_BODIES,), 5.0, np.float32)
    xs = [jnp.asarray(random_body_batch(rng, N_BODIES, max_d)) for _ in range(groups * reps)]

    print(f"{'cadence':<12} {'median s':>9} {'ms/iter':>8} {'bodies/s':>9}  spread", flush=True)
    results = {}
    for r in (10, 15, 20):
        fit = make_fit_step(assets, FitConfig.production(num_iter=NUM_ITER, refresh_every=r),
                            want_metrics=False)
        out = fit(xs[0], cam_ext, scene_idx)[0]
        out.block_until_ready()
        dts = []
        k = 0
        for _ in range(groups):
            t0 = time.time()
            for _ in range(reps):
                out = fit(xs[k], cam_ext, scene_idx)[0]
                k += 1
            out.block_until_ready()
            dts.append((time.time() - t0) / reps)
        dt = float(np.median(dts))
        results[f"refresh{r}"] = {
            "median_s": round(dt, 4),
            "ms_per_iter": round(dt / NUM_ITER * 1e3, 2),
            "bodies_per_sec": round(N_BODIES / dt, 1),
        }
        print(f"refresh{r:<5} {dt:9.3f} {dt / NUM_ITER * 1e3:8.2f} {N_BODIES / dt:9.1f}  "
              f"[{min(dts):.3f}, {max(dts):.3f}]", flush=True)
    print(json.dumps(results))


if __name__ == "__main__":
    main()
