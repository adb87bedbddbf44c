"""End-to-end demo (equivalent of the reference's demo.ipynb, runnable
headless): synthetic scene -> stage-1 CVAE sampling -> SMPL-X decode ->
scene-aware fitting -> eval scores -> rendered PNGs.

    python demo.py [--out demo_out]
"""

import argparse
import os

import jax
import jax.numpy as jnp
import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="demo_out")
    ap.add_argument("--n_samples", type=int, default=16)
    args = ap.parse_args()
    os.makedirs(args.out, exist_ok=True)

    from psi_tpu.data.synthetic import SyntheticBatchGenerator, make_synthetic_assets
    from psi_tpu.eval import collision_contact_scores, diversity_metrics
    from psi_tpu.fit import fit_bodies
    from psi_tpu.gen import generate_bodies
    from psi_tpu.models import HumanCVAES1
    from psi_tpu.utils.config import FitConfig

    print("[1/5] building assets (synthetic SMPL-X + scenes)...")
    assets, registry = make_synthetic_assets(
        num_verts=10475, num_joints=55, num_scenes=2, sdf_dim=48, scene_points=5000, n_contact=1024
    )

    print("[2/5] sampling bodies from the stage-1 CVAE...")
    model = HumanCVAES1(latentD=256)
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 75)), jnp.zeros((1, 128, 128, 2)))
    gen = SyntheticBatchGenerator(num_scenes=2, batches_per_epoch=1, seed=0)
    b = gen.next_batch(1)
    x72 = generate_bodies(
        model, variables, jnp.asarray(b["xs"]), jnp.asarray(b["cam_int"]),
        jnp.asarray(b["max_d"]), args.n_samples, jax.random.PRNGKey(1),
    )
    print(f"    sampled {x72.shape[0]} bodies")

    print("[3/5] scene-aware fitting (20 Adam iters, one XLA program)...")
    cam_ext = jnp.asarray(np.tile(b["cam_ext"][0][None], (args.n_samples, 1, 1)))
    scene_idx = jnp.zeros(args.n_samples, jnp.int32)
    # production fit stack (refresh blocks + fused Pallas LBS) — the
    # same config every CLI defaults to; FitConfig.exact() for parity
    x_fit, metrics, hist = fit_bodies(assets, x72, cam_ext, scene_idx,
                                      FitConfig.production(num_iter=20))
    print(f"    loss {float(np.asarray(hist)[0].mean()):.4f} -> {float(np.asarray(hist)[-1].mean()):.4f}")

    print("[4/5] evaluation...")
    nc, ct = collision_contact_scores(assets, np.asarray(x_fit), np.asarray(cam_ext), np.asarray(scene_idx))
    ent, md = diversity_metrics(np.asarray(x_fit), k=min(8, args.n_samples))
    print(f"    non-collision={nc:.3f} contact={ct:.3f} diversity entropy={ent:.3f}")

    print("[5/5] rendering...")
    from psi_tpu.body.decode import body_vec_to_verts
    from psi_tpu.viz.colors import BODY_COLORS, mpcat40_color
    from psi_tpu.viz.show_results import render_color
    from PIL import Image

    scene_pts = registry.verts_stack[0, : registry.n_verts[0]]
    scene_colors = mpcat40_color(np.full(len(scene_pts), 5))
    verts, _ = body_vec_to_verts(assets.smplx, assets.vposer_params, x_fit, cam_ext)
    view = np.eye(4, dtype=np.float32)
    view[:3, 3] = [0, 0, 8.0]
    cam_int = np.array([[400, 0, 320], [0, 400, 240], [0, 0, 1]], np.float32)
    all_pts = np.concatenate([scene_pts] + [np.asarray(verts[i]) for i in range(4)], axis=0)
    all_col = np.concatenate(
        [scene_colors] + [np.tile(BODY_COLORS["blue"], (verts.shape[1], 1)) for _ in range(4)], axis=0
    )
    img = render_color(all_pts, all_col, cam_int, 480, 640, cam_ext=view)
    out = os.path.join(args.out, "demo_bodies.png")
    Image.fromarray(img).save(out)
    print(f"    wrote {out}")
    print("done.")


if __name__ == "__main__":
    main()
