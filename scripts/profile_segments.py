"""Attribute production-fit time to schedule segments (run on real TPU).

Times 20-iter scans of EACH segment type in isolation at bench shapes —
full (gather+NN), nn_only (NN, cached SDF), cheap (frozen both) — for a
given lbs tier, so the per-iter cost of each segment is a measured
number, not an inference from program totals.

    python scripts/profile_segments.py [fused|fast|high]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
import optax

from psi_tpu.data.synthetic import make_synthetic_assets, random_body_batch, random_camera_batch
from psi_tpu.fit.fitting import _per_body_losses
from psi_tpu.geometry.bodyvec import convert_to_6D_rot
from psi_tpu.utils.config import FitConfig

N = 256
NUM_ITER = 20


def main():
    tier = sys.argv[1] if len(sys.argv) > 1 else "fused"
    cfg = FitConfig.production(num_iter=NUM_ITER, lbs_precision=tier)
    assets, _ = make_synthetic_assets(
        num_verts=10475, num_joints=55, num_scenes=4, sdf_dim=128,
        scene_points=20000, n_contact=1455, seed=0, sdf_dtype=jnp.bfloat16,
    )
    rng = np.random.default_rng(0)
    cam_ext = jnp.asarray(random_camera_batch(rng, N)[0])
    scene_idx = jnp.zeros((N,), jnp.int32)
    max_d = np.full((N,), 5.0, np.float32)
    xs = [jnp.asarray(random_body_batch(rng, N, max_d)) for _ in range(4)]

    opt = optax.adam(cfg.init_lr_h)
    n_contact = int(assets.contact_vids.shape[0])
    n_verts = int(assets.smplx.v_template.shape[0])

    def build(fresh_nn, fresh_sdf, decode_only=False):
        @jax.jit
        def run(assets_, x72_init, cam_ext, scene_idx, y_nn, cache):
            xhr_init = convert_to_6D_rot(x72_init)
            if cfg.lbs_precision == "fused":
                from psi_tpu.body.smplx_model import make_fused_bundle

                fb = make_fused_bundle(assets_.smplx)
            else:
                fb = None

            def loss_fn(x):
                if decode_only:
                    # isolate the decode chain: verts consumed by a real
                    # cotangent so nothing is DCE'd
                    from psi_tpu.body.decode import body_vec_to_verts
                    from psi_tpu.geometry.bodyvec import convert_to_3D_rot

                    v = body_vec_to_verts(
                        assets_.smplx, assets_.vposer_params,
                        convert_to_3D_rot(x), cam_ext,
                        precision=cfg.lbs_precision, fused_bundle=fb,
                    )[0]
                    return jnp.sum(v * 1e-3), ({"total": jnp.zeros(x.shape[0])}, (y_nn, cache))
                return _per_body_losses(
                    assets_, x, xhr_init, cam_ext, scene_idx, cfg,
                    (y_nn, cache), fresh_nn, fresh_sdf, None, fb,
                )

            def step(carry, _):
                xhr, opt_state, sel = carry
                (_, (m, new_sel)), grads = jax.value_and_grad(loss_fn, has_aux=True)(xhr)
                updates, opt_state = opt.update(grads, opt_state, xhr)
                return (optax.apply_updates(xhr, updates), opt_state, sel), None

            carry = (xhr_init, opt.init(xhr_init), 0)
            carry, _ = jax.lax.scan(step, carry, None, length=NUM_ITER)
            return carry[0]

        return run

    y_nn = jnp.zeros((N, n_contact, 3), jnp.float32)
    cache = (jnp.zeros((N, n_verts, 8), assets.sdf_packed.dtype),
             jnp.zeros((N, n_verts, 3), jnp.float32))

    variants = {
        "decode_only": build(False, False, decode_only=True),
        "cheap": build(False, False),
        "nn_only": build(True, False),
        "full": build(True, True),
    }
    print(f"tier={tier}")
    print(f"{'segment':<12} {'s/scan':>8} {'ms/iter':>8}")
    for name, fn in variants.items():
        out = fn(assets, xs[0], cam_ext, scene_idx, y_nn, cache)
        out.block_until_ready()
        reps = 5
        t0 = time.time()
        for i in range(reps):
            out = fn(assets, xs[1 + i % 3], cam_ext, scene_idx, y_nn, cache)
        out.block_until_ready()
        dt = (time.time() - t0) / reps
        print(f"{name:<12} {dt:8.3f} {dt / NUM_ITER * 1e3:8.2f}", flush=True)


if __name__ == "__main__":
    main()
