"""Attribute the cost of the CHEAP refresh iteration (run on real TPU).

The selection-refresh fit's cheap iterations are pure dense math
(frozen-cell SDF patches + frozen NN correspondences), yet measure
~9 ms at N=256 where decode alone is ~0.5 ms. This script scans 20
Adam iters of the cheap loss with terms ablated, against a FIXED
carried state built once outside the loop (no cond, no refresh), to
find where the time goes.

    python scripts/profile_cheap_iter.py
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
from psi_tpu.ops.chamfer import chamfer_one_sided_nn
from psi_tpu.ops.sdf import sdf_trilinear_from_cache, sdf_trilinear_packed_cached
from psi_tpu.utils.config import FitConfig

N = 256
NUM_ITER = 20


def build(assets, cfg, *, contact=True, collision=True, decode=True):
    opt = optax.adam(cfg.init_lr_h)
    dims = tuple(assets.sdf_packed.shape[1:4])

    @jax.jit
    def fit(assets_, x72_init, cam_ext, scene_idx, y_nn, cache):
        xhr_init = convert_to_6D_rot(x72_init)

        def loss_fn(xhr):
            loss = cfg.weight_loss_rec * jnp.mean(jnp.abs(xhr - xhr_init), axis=1)
            xh = convert_to_3D_rot(xhr)
            loss += cfg.weight_loss_vposer * jnp.mean(xh[:, 16:48] ** 2, axis=1)
            if decode:
                verts, _ = body_vec_to_verts(assets_.smplx, assets_.vposer_params, xh, cam_ext)
                if contact:
                    cv = verts[:, assets_.contact_vids, :]
                    d1 = jnp.sum((cv - y_nn) ** 2, axis=-1)
                    s = jnp.sqrt(d1 + 1e-4)
                    loss += cfg.weight_contact * jnp.mean(s / (s + cfg.contact_denom_offset), axis=1)
                if collision:
                    sdf = sdf_trilinear_from_cache(
                        cache, scene_idx, verts, assets_.grid_mins, assets_.grid_maxs, dims
                    )
                    neg = jnp.minimum(sdf, 0.0)
                    cnt = jnp.maximum(jnp.sum(sdf < 0, axis=1), 1).astype(xhr.dtype)
                    loss += cfg.weight_collision * (-jnp.sum(neg, axis=1) / cnt)
            return jnp.sum(loss)

        def step(carry, _):
            xhr, opt_state = carry
            grads = jax.grad(loss_fn)(xhr)
            updates, opt_state = opt.update(grads, opt_state, xhr)
            return (optax.apply_updates(xhr, updates), opt_state), None

        (xhr, _), _ = jax.lax.scan(step, (xhr_init, opt.init(xhr_init)), None, length=NUM_ITER)
        return convert_to_3D_rot(xhr)

    return fit


def main():
    assets, _ = make_synthetic_assets(
        num_verts=10475, num_joints=55, num_scenes=4, sdf_dim=128,
        scene_points=20000, n_contact=1455, seed=0,
    )
    cfg = FitConfig(num_iter=NUM_ITER)
    rng = np.random.default_rng(0)
    cam_ext, _ = random_camera_batch(rng, N)
    cam_ext = jnp.asarray(cam_ext)
    scene_idx = jnp.zeros((N,), jnp.int32)
    max_d = np.full((N,), 5.0, np.float32)
    xs = [jnp.asarray(random_body_batch(rng, N, max_d)) for _ in range(4)]

    # build the frozen state once (as a refresh pass would)
    xh0 = convert_to_3D_rot(convert_to_6D_rot(xs[0]))
    verts0, _ = body_vec_to_verts(assets.smplx, assets.vposer_params, xh0, cam_ext)
    _, cache = sdf_trilinear_packed_cached(
        assets.sdf_packed, scene_idx, verts0, assets.grid_mins, assets.grid_maxs
    )
    cv0 = verts0[:, assets.contact_vids, :]
    _, y_nn = chamfer_one_sided_nn(cv0, assets.scene_verts[scene_idx])
    jax.block_until_ready(cache)

    variants = {
        "rec_vposer_only": dict(decode=False, contact=False, collision=False),
        "decode_only": dict(contact=False, collision=False),
        "decode_contact": dict(collision=False),
        "decode_collision": dict(contact=False),
        "full_cheap": dict(),
    }
    print(f"{'variant':<18} {'s/rep':>8} {'ms/iter':>8}")
    for name, kw in variants.items():
        fit = build(assets, cfg, **kw)
        out = fit(assets, xs[0], cam_ext, scene_idx, y_nn, cache)
        out.block_until_ready()
        reps = 5
        t0 = time.time()
        for i in range(reps):
            out = fit(assets, xs[1 + i % 3], cam_ext, scene_idx, y_nn, cache)
        out.block_until_ready()
        dt = (time.time() - t0) / reps
        print(f"{name:<18} {dt:8.3f} {dt / NUM_ITER * 1e3:8.2f}", flush=True)


if __name__ == "__main__":
    main()
