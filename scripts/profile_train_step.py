"""Decompose the training step and its batch-scaling wall (real TPU).

Round-4 verdict weak #4: batch 128 delivers only +14% samples/s over
batch 32 (4,172 vs 3,657) — per-step wall scales ~3.5x for 4x batch, so
the step is NOT launch-limited; some per-sample resource dominates at
~0.24 ms/sample. Candidates: the f32 conv trunk (flax default dtype —
2.1 GF/sample at half-rate f32 MXU), the training SDF collision gather
(10,475 rows/sample at ~8 ns/row = 0.084 ms/sample), the UNPRUNED
train-time chamfer NN over the 20k scene cloud, LBS model-tensor
streaming (posedirs ~62 MB/step, batch-independent), and the optimizer.

Scans K=32 steps per program (the production scan-epoch shape, zero
host round-trips) of the six-term loss with terms structurally ablated,
at batch 32 and 128:

    full                the bench step (all six terms)
    no_scene            conv CVAE + KL/rec/vposer only (no decode)
    decode_only         + body decode (LBS fwd+bwd), no chamfer/SDF
    decode_chamfer      + chamfer contact term (no SDF gather)
    decode_sdf          + SDF collision gather (no chamfer)
    adam_only           optimizer chain alone (synthetic grads)

    python scripts/profile_train_step.py [batch ...]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
import optax

from psi_tpu.data.synthetic import SyntheticBatchGenerator, make_synthetic_assets
from psi_tpu.geometry.bodyvec import convert_to_3D_rot, convert_to_6D_rot
from psi_tpu.geometry.camera import normalize_global_T, recover_global_T
from psi_tpu.train.loop import build_model, init_state
from psi_tpu.train.objective import (
    kl_normal_loss, l1_loss, scene_geometry_losses, vposer_reg_loss,
)
from psi_tpu.utils.config import LossConfig, TrainConfig

K_STEPS = 32
REPS = 3


def build_step(model, opt, cfg, lcfg, *, decode=True, chamfer=True, sdf=True,
               mode="full"):
    def loss_fn(params, batch_stats, batch, key, assets):
        variables = {"params": params, "batch_stats": batch_stats}
        xh, cam_int, cam_ext, max_d = (
            batch["xh"], batch["cam_int"], batch["cam_ext"], batch["max_d"])
        xhn = normalize_global_T(xh, cam_int, max_d)
        xhnr = convert_to_6D_rot(xhn)
        out = model.apply(variables, xhnr, batch["xs"], key, train=True,
                          mutable=["batch_stats"])
        (xhnr_rec, mu, logvar), new_state = out
        loss = lcfg.weight_loss_kl * kl_normal_loss(mu, logvar)
        xhn_rec = convert_to_3D_rot(xhnr_rec)
        xh_rec = recover_global_T(xhn_rec, cam_int, max_d)
        loss += lcfg.weight_loss_rec_h * (
            0.5 * l1_loss(xhnr_rec[:, :3], xhnr[:, :3])
            + 0.5 * l1_loss(xh_rec[:, :3], xh[:, :3])
            + l1_loss(xhnr_rec[:, 3:], xhnr[:, 3:])
        )
        loss += lcfg.weight_loss_vposer * vposer_reg_loss(xh_rec[:, 16:48])
        if decode:
            # scene_geometry_losses with terms structurally ablated
            from psi_tpu.body.decode import body_vec_to_verts
            from psi_tpu.ops.chamfer import chamfer_one_sided
            from psi_tpu.ops.sdf import sdf_trilinear_packed

            assets_ = assets
            verts, _ = body_vec_to_verts(
                assets_.smplx, assets_.vposer_params, xh_rec, cam_ext)
            if chamfer:
                cv = verts[:, assets_.contact_vids, :]
                d1 = chamfer_one_sided(cv, assets_.scene_verts[batch["scene_idx"]])
                s = jnp.sqrt(d1 + 1e-4)
                loss += lcfg.weight_contact * jnp.mean(
                    jnp.mean(s / (s + lcfg.contact_denom_offset), axis=1))
            if sdf:
                body_sdf = sdf_trilinear_packed(
                    assets_.sdf_packed, batch["scene_idx"], verts,
                    assets_.grid_mins, assets_.grid_maxs)
                neg = jnp.minimum(body_sdf, 0.0)
                cnt = jnp.maximum(jnp.sum(body_sdf < 0, axis=1), 1).astype(jnp.float32)
                loss += lcfg.weight_collision * jnp.mean(-jnp.sum(neg, axis=1) / cnt)
            if not chamfer and not sdf:
                loss += 0.0 * jnp.sum(verts)
        return loss, new_state["batch_stats"]

    @jax.jit
    def run(params, batch_stats, opt_state, stacked, keys, assets):
        def step(carry, xs):
            params, batch_stats, opt_state = carry
            batch, key = xs
            if mode == "adam_only":
                grads = jax.tree.map(lambda p: p * 1e-12, params)
            else:
                (_, batch_stats), grads = jax.value_and_grad(
                    loss_fn, has_aux=True)(params, batch_stats, batch, key, assets)
            updates, opt_state = opt.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            return (params, batch_stats, opt_state), None

        (params, batch_stats, opt_state), _ = jax.lax.scan(
            step, (params, batch_stats, opt_state), (stacked, keys))
        return params, batch_stats, opt_state

    return run


def main():
    batches = [int(b) for b in sys.argv[1:]] or [32, 128]
    assets, _ = make_synthetic_assets(
        num_verts=10475, num_joints=55, num_scenes=4, sdf_dim=128,
        scene_points=20000, n_contact=1455, seed=0,
    )
    lcfg = LossConfig()
    variants = [
        ("adam_only", dict(mode="adam_only")),
        ("no_scene", dict(decode=False)),
        ("decode_only", dict(chamfer=False, sdf=False)),
        ("decode_chamfer", dict(sdf=False)),
        ("decode_sdf", dict(chamfer=False)),
        ("full", dict()),
    ]
    for B in batches:
        cfg = TrainConfig(model_type="s1", latentD=256, batch_size=B)
        model = build_model(cfg)
        opt = optax.adam(cfg.init_lr_h)
        state = init_state(model, cfg, opt, jax.random.PRNGKey(0))
        gen = SyntheticBatchGenerator(num_scenes=4, batches_per_epoch=K_STEPS + 1, seed=0)
        bs = [gen.next_batch(B) for _ in range(K_STEPS)]
        stacked = {k: jnp.stack([jnp.asarray(bb[k]) for bb in bs]) for k in bs[0]}
        keys = jax.random.split(jax.random.PRNGKey(7), K_STEPS)
        print(f"== batch {B} ({K_STEPS} steps/program, {REPS} reps) ==")
        for name, kw in variants:
            run = build_step(model, opt, cfg, lcfg, **kw)
            p, st, o = run(state.params, state.batch_stats, state.opt_state,
                           stacked, keys, assets)
            jax.block_until_ready(p)
            t0 = time.time()
            for _ in range(REPS):
                p, st, o = run(state.params, state.batch_stats, state.opt_state,
                               stacked, keys, assets)
            jax.block_until_ready(p)
            dt = (time.time() - t0) / (REPS * K_STEPS)
            print(f"  {name:<16} {dt*1e3:8.3f} ms/step  "
                  f"{B/dt:9.0f} samples/s", flush=True)


if __name__ == "__main__":
    main()
