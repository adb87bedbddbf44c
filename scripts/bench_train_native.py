"""Native-loader-in-the-loop training soak (run on the real TPU).

Round-3 verdict item 6: the .psipack double-buffered C++ loader
(native/psi_native.cpp) was unit-tested but the recorded scan-epoch
steps/s fed from pre-staged synthetic batches. This script packs a
synthetic dataset to .psipack, then runs a sustained multi-epoch
TrainOP train — the production scan-epoch path, which now STREAMS
chunks (train/loop.py: chunk k+1 is pulled from the prefetching loader
while the device executes chunk k) — with the native loader feeding
every batch, and reports steps/s plus loader occupancy (fraction of
wall spent blocked in loader_next).

    python scripts/bench_train_native.py [--samples 6144] [--epochs 3]
"""

import argparse
import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


class TimedGen:
    """Wraps a batch generator, accumulating wall time spent inside it."""

    def __init__(self, inner):
        self.inner = inner
        self.wall = 0.0
        self.calls = 0

    def has_next_batch(self):
        return self.inner.has_next_batch()

    def next_batch(self, batch_size=None):
        t0 = time.time()
        b = self.inner.next_batch(batch_size)
        self.wall += time.time() - t0
        self.calls += 1
        return b

    def reset(self):
        self.inner.reset()


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--samples", type=int, default=6144)
    ap.add_argument("--epochs", type=int, default=3)
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--chunk", type=int, default=32)
    ap.add_argument("--stage_bf16", action="store_true",
                    help="stage snapshot images in bfloat16 (half the "
                         "host->device bytes per chunk)")
    args = ap.parse_args()

    from psi_tpu.data.native_loader import NativeBatchGenerator, pack_dataset
    from psi_tpu.data.synthetic import SyntheticBatchGenerator, make_synthetic_assets
    from psi_tpu.train.loop import TrainOP
    from psi_tpu.utils.config import LossConfig, TrainConfig

    # ---- pack a full-scale synthetic dataset to .psipack ----
    t0 = time.time()
    n = args.samples
    per = 512
    pack_path = os.path.join(tempfile.gettempdir(), f"soak_{n}.psipack")
    if not os.path.exists(pack_path):
        gen = SyntheticBatchGenerator(
            num_scenes=4, batches_per_epoch=-(-n // per), seed=0)
        chunks = []
        for lo in range(0, n, per):
            b = gen.next_batch(min(per, n - lo))
            assert b is not None
            chunks.append(b)
        cat = {k: np.concatenate([c[k] for c in chunks], axis=0) for k in chunks[0]}
        pack_dataset(
            pack_path,
            cat["xs"][..., 0].reshape(n, -1), cat["xs"][..., 1].reshape(n, -1),
            cat["xh"].reshape(n, -1), cat["cam_ext"].reshape(n, -1),
            cat["cam_int"].reshape(n, -1), cat["max_d"].reshape(n),
            cat["scene_idx"].astype(np.int32),
        )
    pack_mb = os.path.getsize(pack_path) / 1e6
    print(f"[soak] pack: {n} samples at {pack_path} ({pack_mb:.0f} MB, "
          f"{time.time()-t0:.1f}s)", file=sys.stderr, flush=True)

    assets, _ = make_synthetic_assets(
        num_verts=10475, num_joints=55, num_scenes=4, sdf_dim=128,
        scene_points=20000, n_contact=1455, seed=0,
    )
    cfg = TrainConfig(
        model_type="s1", latentD=256, batch_size=args.batch,
        epoch=args.epochs, scan_epoch=True, scan_chunk_size=args.chunk,
        stage_bf16=args.stage_bf16,
        save_dir=os.path.join(tempfile.gettempdir(), "soak_ckpt"),
        resume_training=False, verbose=False, saving_per_epochs=10_000,
    )
    op = TrainOP(cfg, LossConfig(), assets)
    loader = TimedGen(NativeBatchGenerator(pack_path, args.batch, seed=0))

    # warmup epoch: pays the scan-chunk XLA compiles so the timed run
    # measures steady-state throughput, not compile time
    import dataclasses
    warm_cfg = dataclasses.replace(cfg, epoch=1)
    t0 = time.time()
    TrainOP(warm_cfg, LossConfig(), assets).train(loader)
    warm_s = time.time() - t0
    loader.reset()
    loader.wall, loader.calls = 0.0, 0

    t0 = time.time()
    op.train(loader)
    wall = time.time() - t0
    steps = args.epochs * (n // args.batch)
    print(json.dumps({
        "metric": "train_steps_per_sec_native_loader",
        "steps": steps,
        "epochs": args.epochs,
        "batch_size": args.batch,
        "warmup_epoch_s": round(warm_s, 1),
        "wall_s": round(wall, 1),
        "steps_per_sec": round(steps / wall, 1),
        "samples_per_sec": round(steps * args.batch / wall, 0),
        "loader_wall_s": round(loader.wall, 1),
        "loader_occupancy": round(loader.wall / wall, 3),
        "loader_calls": loader.calls,
        "pack_mb": round(pack_mb, 1),
        "stage_bf16": args.stage_bf16,
    }))


if __name__ == "__main__":
    main()
