"""Accuracy validation for selection-refresh fitting (run on TPU or CPU).

Compares the production every-iteration fit against the selection-refresh
variant (pruned candidate sets refreshed every T iters) at bench shapes:
  * final 72-D body-vector delta (max / mean abs)
  * post-fit eval metrics: non-collision score and contact indicator
    (the paper-table protocol, utils_eval_collision_habitat.py:131-140)
  * final per-body loss terms

    python scripts/validate_refresh_fit.py [N_BODIES]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax.numpy as jnp
import numpy as np

from psi_tpu.data.synthetic import make_synthetic_assets, random_body_batch, random_camera_batch
from psi_tpu.fit import make_fit_step
from psi_tpu.utils.config import FitConfig

N = int(sys.argv[1]) if len(sys.argv) > 1 else 256


def eval_scores(assets, x72, cam_ext, scene_idx):
    from psi_tpu.body.decode import body_vec_to_verts
    from psi_tpu.ops.sdf import sdf_trilinear_packed

    verts, _ = body_vec_to_verts(assets.smplx, assets.vposer_params, x72, cam_ext)
    sdf = sdf_trilinear_packed(assets.sdf_packed, scene_idx, verts, assets.grid_mins, assets.grid_maxs)
    noncoll = jnp.mean(jnp.sum(sdf > 0, axis=1) / sdf.shape[1])
    contact = jnp.mean((jnp.sum(sdf < 0, axis=1) > 0).astype(jnp.float32))
    return float(noncoll), float(contact)


def main():
    assets, _ = make_synthetic_assets(
        num_verts=10475, num_joints=55, num_scenes=4, sdf_dim=128,
        scene_points=20000, n_contact=1455, seed=0,
    )
    rng = np.random.default_rng(0)
    cam_ext, _ = random_camera_batch(rng, N)
    cam_ext = jnp.asarray(cam_ext)
    scene_idx = jnp.asarray(rng.integers(0, 4, (N,)), jnp.int32)
    max_d = np.full((N,), 5.0, np.float32)
    x72 = jnp.asarray(random_body_batch(rng, N, max_d))

    configs = {
        "production": FitConfig(),
        "refresh_t2": FitConfig(refresh_every=2),
        "refresh_t4": FitConfig(refresh_every=4),
        "refresh_t5": FitConfig(refresh_every=5),
        "refresh_t10": FitConfig(refresh_every=10),
        "refresh_t5_w0": FitConfig(refresh_every=5, refresh_warmup=0),
        "refresh_t5_w8": FitConfig(refresh_every=5, refresh_warmup=8),
    }
    results = {}
    for name, cfg in configs.items():
        fit = make_fit_step(assets, cfg)
        xf, metrics, _ = fit(x72, cam_ext, scene_idx)
        nc, ct = eval_scores(assets, xf, cam_ext, scene_idx)
        results[name] = (np.asarray(xf), {k: float(np.mean(v)) for k, v in metrics.items()}, nc, ct)
        m = results[name][1]
        print(f"[{name}] noncoll={nc:.4f} contact={ct:.4f} "
              f"loss_total={m['total']:.5f} rec={m['rec']:.5f} "
              f"vposer={m['vposer']:.6f} collision={m['collision']:.6f} "
              f"contact_term={m['contact']:.6f}", flush=True)

    base = results["production"][0]
    for name in configs:
        if name == "production":
            continue
        d = np.abs(results[name][0] - base)
        print(f"[delta vs production] {name}: max={d.max():.5f} mean={d.mean():.6f}")


if __name__ == "__main__":
    main()
