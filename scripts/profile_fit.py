"""Ablation profiler for the fit step (run on the real TPU).

Times the 20-iter fit scan at bench shapes (N=256 bodies, V=10475,
C=1455 contact verts, M=20000 scene points, 128^3 SDF) with loss terms
structurally removed / variants swapped in, to attribute the per-iter
cost before optimizing. Timing rules per ROUND_NOTES.md: multi-second
runs, distinct inputs per rep, block_until_ready once at the end.

    python scripts/profile_fit.py [variant ...]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
import optax

from psi_tpu.body.decode import body_vec_to_verts
from psi_tpu.data.synthetic import make_synthetic_assets, random_body_batch, random_camera_batch
from psi_tpu.geometry.bodyvec import convert_to_3D_rot, convert_to_6D_rot
from psi_tpu.ops.chamfer import chamfer_one_sided
from psi_tpu.ops.sdf import sdf_trilinear_packed
from psi_tpu.utils.config import FitConfig

N_BODIES = 256
NUM_ITER = 20
N_CONTACT = 1455
SCENE_POINTS = 20000
SDF_DIM = 128


def build_fit(assets, cfg, *, contact=True, collision=True, remat=False, prune_k=0, prune_static=0):
    opt = optax.adam(cfg.init_lr_h)

    def decode(assets_, xhr, cam_ext):
        xh = convert_to_3D_rot(xhr)
        verts, _ = body_vec_to_verts(assets_.smplx, assets_.vposer_params, xh, cam_ext)
        return xh, verts

    decode_fn = jax.checkpoint(decode) if remat else decode

    def loss_fn(xhr, assets_, scene_pts, xhr_init, cam_ext, scene_idx):
        loss = cfg.weight_loss_rec * jnp.mean(jnp.abs(xhr - xhr_init), axis=1)
        xh, verts = decode_fn(assets_, xhr, cam_ext)
        loss += cfg.weight_loss_vposer * jnp.mean(xh[:, 16:48] ** 2, axis=1)
        if contact:
            contact_verts = verts[:, assets_.contact_vids, :]
            if prune_k:
                centroid = jnp.mean(contact_verts, axis=1)  # [N, 3]
                cd = jnp.sum((scene_pts - centroid[:, None, :]) ** 2, axis=-1)
                _, sel = jax.lax.approx_min_k(cd, prune_k)
                scene_pts = jnp.take_along_axis(
                    scene_pts, jax.lax.stop_gradient(sel)[..., None], axis=1
                )
            d1 = chamfer_one_sided(contact_verts, scene_pts)
            s = jnp.sqrt(d1 + 1e-4)
            loss += cfg.weight_contact * jnp.mean(s / (s + cfg.contact_denom_offset), axis=1)
        if collision:
            body_sdf = sdf_trilinear_packed(
                assets_.sdf_packed, scene_idx, verts, assets_.grid_mins, assets_.grid_maxs
            )
            neg = jnp.minimum(body_sdf, 0.0)
            cnt = jnp.maximum(jnp.sum(body_sdf < 0, axis=1), 1).astype(xhr.dtype)
            loss += cfg.weight_collision * (-jnp.sum(neg, axis=1) / cnt)
        return jnp.sum(loss)

    @jax.jit
    def fit(assets_, x72_init, cam_ext, scene_idx):
        xhr_init = convert_to_6D_rot(x72_init)

        scene_pts = assets_.scene_verts[scene_idx]  # [N_bodies, M, 3]
        if prune_static:
            # one-time selection from the INITIAL body position, reused
            # for all iterations (bodies move little during fitting)
            _, verts0 = decode(assets_, xhr_init, cam_ext)
            centroid0 = jnp.mean(verts0[:, assets_.contact_vids, :], axis=1)
            cd = jnp.sum((scene_pts - centroid0[:, None, :]) ** 2, axis=-1)
            _, sel = jax.lax.approx_min_k(cd, prune_static)
            scene_pts = jnp.take_along_axis(scene_pts, sel[..., None], axis=1)

        def step(carry, _):
            xhr, opt_state = carry
            grads = jax.grad(loss_fn)(xhr, assets_, scene_pts, xhr_init, cam_ext, scene_idx)
            updates, opt_state = opt.update(grads, opt_state, xhr)
            return (optax.apply_updates(xhr, updates), opt_state), None

        (xhr, _), _ = jax.lax.scan(step, (xhr_init, opt.init(xhr_init)), None, length=cfg.num_iter)
        return convert_to_3D_rot(xhr)

    return lambda *a: fit(assets, *a)


def main():
    variants = {
        "full": dict(),
        "no_contact": dict(contact=False),
        "no_sdf": dict(collision=False),
        "lbs_only": dict(contact=False, collision=False),
        "remat": dict(remat=True),
        "prune2048": dict(prune_k=2048),
        "prune1024": dict(prune_k=1024),
        "prune2048_remat": dict(prune_k=2048, remat=True),
        "prune512": dict(prune_k=512),
        "prune_static4096": dict(prune_static=4096),
        "prune_static2048": dict(prune_static=2048),
        "production": dict(),  # real make_fit_step, FitConfig defaults
        "production_noprune": dict(),
        "production_bf16sdf": dict(),
        "production_remat": dict(),  # FitConfig(remat_decode=True)
        # production make_fit_step in selection-refresh mode
        "refresh_t2": dict(refresh_every=2),
        "refresh_t4": dict(refresh_every=4),
        "refresh_t5": dict(refresh_every=5),
        "refresh_t10": dict(refresh_every=10),
    }
    which = sys.argv[1:] or list(variants)

    assets, _ = make_synthetic_assets(
        num_verts=10475, num_joints=55, num_scenes=4, sdf_dim=SDF_DIM,
        scene_points=SCENE_POINTS, n_contact=N_CONTACT, seed=0,
    )
    cfg = FitConfig(num_iter=NUM_ITER)
    rng = np.random.default_rng(0)
    cam_ext, _ = random_camera_batch(rng, N_BODIES)
    cam_ext = jnp.asarray(cam_ext)
    scene_idx = jnp.zeros((N_BODIES,), jnp.int32)
    max_d = np.full((N_BODIES,), 5.0, np.float32)

    xs = [jnp.asarray(random_body_batch(rng, N_BODIES, max_d)) for _ in range(4)]

    print(f"{'variant':<20} {'s/rep':>8} {'ms/iter':>8} {'bodies/s':>9}")
    for name in which:
        if name.startswith("production"):
            # the real make_fit_step (current FitConfig defaults)
            from psi_tpu.fit import make_fit_step

            if name == "production_bf16sdf":
                assets_p, _ = make_synthetic_assets(
                    num_verts=10475, num_joints=55, num_scenes=4, sdf_dim=SDF_DIM,
                    scene_points=SCENE_POINTS, n_contact=N_CONTACT, seed=0,
                    sdf_dtype=jnp.bfloat16,
                )
            else:
                assets_p = assets
            pk = 0 if name == "production_noprune" else FitConfig().prune_scene_points
            real = make_fit_step(
                assets_p,
                FitConfig(num_iter=NUM_ITER, prune_scene_points=pk,
                          remat_decode=(name == "production_remat")),
            )
            fit = lambda a, b, c: real(a, b, c)[0]
        elif name.startswith("refresh"):
            from psi_tpu.fit import make_fit_step

            real = make_fit_step(assets, FitConfig(num_iter=NUM_ITER, **variants[name]))
            fit = lambda a, b, c: real(a, b, c)[0]
        else:
            fit = build_fit(assets, cfg, **variants[name])
        out = fit(xs[0], cam_ext, scene_idx)
        out.block_until_ready()  # compile + warmup
        reps = 3
        t0 = time.time()
        for i in range(reps):
            out = fit(xs[1 + i], cam_ext, scene_idx)
        out.block_until_ready()
        dt = (time.time() - t0) / reps
        print(f"{name:<20} {dt:8.3f} {dt / NUM_ITER * 1e3:8.1f} {N_BODIES / dt:9.1f}", flush=True)


if __name__ == "__main__":
    main()
