"""Decompose the CHEAP refresh iteration's floor (run on real TPU).

Round-4 roofline: a production cheap iteration (frozen-cell SDF patches
+ frozen NN correspondences + the fused Pallas decode+LBS kernel) has
~3.55 GF / ~24 MB of modeled resource use (<0.05 ms at v5e peaks) yet
measures ~2.8 ms at N=256 — ~98% of its wall unattributed. 14 of 20 fit
iterations are cheap, so naming this floor is the biggest single
headline lever (round-4 verdict weak #1 / next #2).

This script builds the decomposition two ways:

A. STACK ablation — 20-iter scans of progressively more of the cheap
   step, all against a FIXED carried state (the real production one:
   fused bundle, bf16 cell cache):
     carry_only      scan carrying (xhr, opt_state), body = trivial op
     adam_only       carry + optax.adam update with synthetic grads
     fwd_only        carry + full cheap-loss FORWARD (no grad, no adam)
     grad_only       carry + value_and_grad of the full cheap loss
     full_cheap      the real thing (grad + adam)       <- ~2.8 ms target

B. TERM ablation — grad+adam scans with loss terms removed (all with
   the fused decode kernel, since every term consumes verts):
     rec_vposer_only   no decode at all
     decode_only       fused kernel fwd+bwd, sum(verts) as the loss
     decode_contact    + frozen-correspondence contact term
     decode_collision  + cached-cell collision term

Usage:  python scripts/profile_cheap_iter.py [fused|fast|high]
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
REPS = 5


def build(assets, cfg, fused_bundle, *, contact=True, collision=True, decode=True,
          mode="full"):
    """mode: full | fwd_only | grad_only | adam_only | carry_only."""
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
                verts, _ = body_vec_to_verts(
                    assets_.smplx, assets_.vposer_params, xh, cam_ext,
                    precision=cfg.lbs_precision, fused_bundle=fused_bundle,
                )
                if not contact and not collision:
                    # keep the decode live without term math
                    loss += 0.0 * jnp.sum(verts, axis=(1, 2))
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
            if mode == "carry_only":
                xhr = xhr + 1e-12
            elif mode == "adam_only":
                grads = xhr * 1e-12  # synthetic, keeps adam's chain live
                updates, opt_state = opt.update(grads, opt_state, xhr)
                xhr = optax.apply_updates(xhr, updates)
            elif mode == "fwd_only":
                xhr = xhr + 1e-12 * loss_fn(xhr)
            elif mode == "grad_only":
                _, grads = jax.value_and_grad(loss_fn)(xhr)
                xhr = xhr - 1e-12 * grads
            else:  # full
                grads = jax.grad(loss_fn)(xhr)
                updates, opt_state = opt.update(grads, opt_state, xhr)
                xhr = optax.apply_updates(xhr, updates)
            return (xhr, opt_state), None

        (xhr, _), _ = jax.lax.scan(step, (xhr_init, opt.init(xhr_init)), None, length=NUM_ITER)
        return convert_to_3D_rot(xhr)

    return fit


def main():
    tier = sys.argv[1] if len(sys.argv) > 1 else "fused"
    cfg = FitConfig.production(num_iter=NUM_ITER, lbs_precision=tier)
    assets, _ = make_synthetic_assets(
        num_verts=10475, num_joints=55, num_scenes=4, sdf_dim=128,
        scene_points=20000, n_contact=1455, seed=0, sdf_dtype=jnp.bfloat16,
    )
    if tier == "fused":
        from psi_tpu.body.smplx_model import make_fused_bundle

        fused_bundle = make_fused_bundle(assets.smplx)
    else:
        fused_bundle = None
    rng = np.random.default_rng(0)
    cam_ext, _ = random_camera_batch(rng, N)
    cam_ext = jnp.asarray(cam_ext)
    scene_idx = jnp.zeros((N,), jnp.int32)
    max_d = np.full((N,), 5.0, np.float32)
    xs = [jnp.asarray(random_body_batch(rng, N, max_d)) for _ in range(4)]

    # build the frozen state once (as a refresh pass would); cache in the
    # grid dtype (bf16) to match the production carry
    xh0 = convert_to_3D_rot(convert_to_6D_rot(xs[0]))
    verts0, _ = body_vec_to_verts(
        assets.smplx, assets.vposer_params, xh0, cam_ext,
        precision=cfg.lbs_precision, fused_bundle=fused_bundle,
    )
    _, cache = sdf_trilinear_packed_cached(
        assets.sdf_packed, scene_idx, verts0, assets.grid_mins, assets.grid_maxs
    )
    cv0 = verts0[:, assets.contact_vids, :]
    _, y_nn = chamfer_one_sided_nn(cv0, assets.scene_verts[scene_idx])
    jax.block_until_ready(cache)

    variants = [
        # A: stack ablation
        ("carry_only", dict(mode="carry_only")),
        ("adam_only", dict(mode="adam_only")),
        ("fwd_only", dict(mode="fwd_only")),
        ("grad_only", dict(mode="grad_only")),
        ("full_cheap", dict(mode="full")),
        # B: term ablation (grad+adam)
        ("rec_vposer_only", dict(decode=False, contact=False, collision=False)),
        ("decode_only", dict(contact=False, collision=False)),
        ("decode_contact", dict(collision=False)),
        ("decode_collision", dict(contact=False)),
    ]
    print(f"tier={tier}  N={N}  iters/scan={NUM_ITER}  reps={REPS}")
    print(f"{'variant':<18} {'s/rep':>8} {'ms/iter':>8}")
    for name, kw in variants:
        fit = build(assets, cfg, fused_bundle, **kw)
        out = fit(assets, xs[0], cam_ext, scene_idx, y_nn, cache)
        out.block_until_ready()
        t0 = time.time()
        for i in range(REPS):
            out = fit(assets, xs[1 + i % 3], cam_ext, scene_idx, y_nn, cache)
        out.block_until_ready()
        dt = (time.time() - t0) / REPS
        print(f"{name:<18} {dt:8.3f} {dt / NUM_ITER * 1e3:8.2f}", flush=True)


if __name__ == "__main__":
    main()
