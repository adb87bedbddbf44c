"""Secondary benchmark: full six-term training-step throughput
(BASELINE.md config #3: SDF collision + Chamfer contact training on
PROX-E-scale batches). Prints one JSON line with steps/s and samples/s.

    python scripts/bench_train.py [--batch 32] [--model_type s1]
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--model_type", type=str, default="s1")
    ap.add_argument("--reps", type=int, default=10)
    ap.add_argument("--scan", type=int, default=0,
                    help="also time the chunked-scan epoch path (K steps per program)")
    ap.add_argument("--prune", type=int, default=0,
                    help="LossConfig.prune_scene_points (0 = exact contact NN)")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import optax

    from psi_tpu.data.synthetic import SyntheticBatchGenerator, make_synthetic_assets
    from psi_tpu.train.loop import build_model, init_state, make_train_step
    from psi_tpu.utils.config import LossConfig, TrainConfig

    assets, _ = make_synthetic_assets(
        num_verts=10475, num_joints=55, num_scenes=4, sdf_dim=128,
        scene_points=20000, n_contact=1455, seed=0,
    )
    cfg = TrainConfig(model_type=args.model_type, latentD=256, batch_size=args.batch)
    model = build_model(cfg)
    opt = optax.adam(cfg.init_lr_h)
    state = init_state(model, cfg, opt, jax.random.PRNGKey(0))
    step = make_train_step(model, opt, assets, LossConfig(prune_scene_points=args.prune), args.model_type)

    n_batches = max(args.reps + 1, args.scan)
    gen = SyntheticBatchGenerator(num_scenes=4, batches_per_epoch=n_batches + 1, seed=0)
    batches = [
        {k: jnp.asarray(v) for k, v in gen.next_batch(args.batch).items()}
        for _ in range(n_batches)
    ]
    key = jax.random.PRNGKey(1)
    fca = jnp.float32(1.0)
    fs = jnp.float32(1.0)

    # warmup/compile
    state, m = step(state, batches[0], key, fca, fs)
    jax.block_until_ready(m["loss"])

    t0 = time.time()
    for i in range(args.reps):
        key, k = jax.random.split(key)
        state, m = step(state, batches[i + 1], k, fca, fs)
    jax.block_until_ready(m["loss"])
    dt = (time.time() - t0) / args.reps
    print(json.dumps({
        "metric": "train_steps_per_sec",
        "value": round(1.0 / dt, 2),
        "unit": "steps/s",
        "samples_per_sec": round(args.batch / dt, 1),
        "batch": args.batch,
        "model_type": args.model_type,
    }))

    if args.scan:
        # production scan-epoch path: K steps per XLA program, zero host
        # round-trips per step (train/loop.py::make_epoch_step)
        from psi_tpu.train.loop import make_epoch_step

        K = args.scan
        epoch_fn = make_epoch_step(model, opt, assets, LossConfig(prune_scene_points=args.prune), args.model_type)
        stacked = jax.tree.map(lambda *xs: jnp.stack(xs), *batches[:K])
        keys = jax.random.split(jax.random.PRNGKey(2), K)
        state2 = init_state(model, cfg, opt, jax.random.PRNGKey(0))
        state2, m = epoch_fn(state2, stacked, keys, fca, fs)
        jax.block_until_ready(m["loss"])
        reps = max(1, args.reps // 2)
        t0 = time.time()
        for i in range(reps):
            keys = jax.random.split(jax.random.PRNGKey(3 + i), K)
            state2, m = epoch_fn(state2, stacked, keys, fca, fs)
        jax.block_until_ready(m["loss"])
        dt = (time.time() - t0) / (reps * K)
        print(json.dumps({
            "metric": "train_steps_per_sec_scan",
            "value": round(1.0 / dt, 2),
            "unit": "steps/s",
            "samples_per_sec": round(args.batch / dt, 1),
            "batch": args.batch,
            "scan_chunk": K,
            "model_type": args.model_type,
        }))


if __name__ == "__main__":
    main()
