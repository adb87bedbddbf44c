"""Probe XLA cost_analysis on the compiled fit program (run on TPU).

Checks whether the PJRT executable's cost analysis accounts for scan
trip counts (HLO while loops) — the decision input for the bench.py
roofline block: if 'flops'/'bytes accessed' scale with num_iter, the
compiled program's own accounting is the number of record; otherwise
the roofline must use the analytic per-iter model.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from psi_tpu.data.synthetic import make_synthetic_assets, random_body_batch, random_camera_batch
from psi_tpu.fit.fitting import _fit_program
from psi_tpu.utils.config import FitConfig

N = 64


def main():
    print("device:", jax.devices()[0].device_kind, flush=True)
    assets, _ = make_synthetic_assets(
        num_verts=1024, num_joints=55, num_scenes=2, sdf_dim=32,
        scene_points=2000, n_contact=128, seed=0,
    )
    rng = np.random.default_rng(0)
    cam_ext = jnp.asarray(random_camera_batch(rng, N)[0])
    scene_idx = jnp.zeros((N,), jnp.int32)
    x72 = jnp.asarray(random_body_batch(rng, N, np.full((N,), 5.0, np.float32)))

    for iters in (5, 20):
        cfg = FitConfig(num_iter=iters)
        fit = jax.jit(_fit_program(cfg, want_metrics=False))
        lowered = fit.lower(assets, x72, cam_ext, scene_idx)
        compiled = lowered.compile()
        try:
            ca = compiled.cost_analysis()
        except Exception as e:
            print(f"iters={iters}: cost_analysis failed: {e}")
            continue
        if isinstance(ca, (list, tuple)):
            ca = ca[0]
        keys = {k: v for k, v in ca.items()
                if "flops" in k or "bytes" in k.lower() or "seconds" in k}
        print(f"iters={iters}: {keys}", flush=True)


if __name__ == "__main__":
    main()
