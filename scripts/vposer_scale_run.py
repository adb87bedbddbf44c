"""AMASS-scale VPoser training validation (VERDICT round-1 item 5).

Builds a synthetic AMASS-sized corpus (>=100k frames after the
subsample/trim/split prep stages of psi_tpu/data/amass.py), trains the
full-size VPoser (512 neurons, latentD 32, batch 256, mesh-space L1
through the full 10475-vertex body model — the reference recipe,
human_body_prior/train/vposer_smpl.py:301-345) on the attached chip,
and verifies best-snapshot reload reproduces the recorded best loss.

Writes the per-epoch loss curve to <out>/vposer_scale.json and prints a
markdown table for EVAL_SYNTH.md.

  python scripts/vposer_scale_run.py --out /tmp/vposer_scale [--epochs 8]
"""

import sys, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import argparse
import json
import time

import numpy as np


def make_amass_corpus(root: str, n_files_per_subset, frames_per_file: int, seed: int = 0):
    """Raw synthetic mocap npz files on a low-dimensional pose manifold:
    z [8] -> tanh random features -> 52x3 axis-angle, so the VAE has
    structure to learn (pure-noise poses would bound the loss away from
    zero and hide convergence)."""
    rng = np.random.default_rng(seed)
    w1 = rng.normal(0, 1.0, size=(8, 64)).astype(np.float32)
    w2 = rng.normal(0, 0.15, size=(64, 156)).astype(np.float32) / np.sqrt(64)
    total = 0
    for subset, n_files in n_files_per_subset.items():
        sub = os.path.join(root, subset)
        os.makedirs(sub, exist_ok=True)
        for i in range(n_files):
            z = rng.normal(size=(frames_per_file, 8)).astype(np.float32)
            poses = np.tanh(z @ w1) @ w2
            poses += rng.normal(0, 0.01, size=poses.shape).astype(np.float32)  # mocap jitter
            np.savez(os.path.join(sub, f"mocap_{i:03d}.npz"), poses=poses)
            total += frames_per_file
    return total


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", type=str, default="/tmp/vposer_scale")
    ap.add_argument("--epochs", type=int, default=8)
    ap.add_argument("--frames_per_file", type=int, default=10500)
    args = ap.parse_args()

    from psi_tpu.body.smplx_model import synthetic_smplx
    from psi_tpu.data.amass import prepare_vposer_datasets
    from psi_tpu.train.vposer_trainer import VPoserTrainConfig, VPoserTrainer

    os.makedirs(args.out, exist_ok=True)
    amass_root = os.path.join(args.out, "amass_raw")
    prepared = os.path.join(args.out, "prepared")

    t0 = time.time()
    if not os.path.isdir(prepared):
        raw = make_amass_corpus(
            amass_root,
            {"SynthCMU": 34, "SynthBML": 5, "SynthEva": 3},
            args.frames_per_file,
        )
        print(f"[1/4] raw corpus: {raw} frames ({time.time()-t0:.0f}s)")
        counts = prepare_vposer_datasets(
            amass_root, prepared,
            splits={"train": ["SynthCMU"], "vald": ["SynthBML"], "test": ["SynthEva"]},
        )
        print(f"[2/4] prepared: {counts} ({time.time()-t0:.0f}s)")
        assert counts["train"] >= 80_000, counts
        assert sum(counts.values()) >= 100_000, counts
    else:
        print("[1-2/4] reusing prepared corpus")

    import jax
    print("[3/4] training on", jax.default_backend())
    bm = synthetic_smplx(num_verts=10475, num_joints=55, seed=0)
    cfg = VPoserTrainConfig(
        num_neurons=512, latentD=32, num_joints=21, batch_size=256,
        num_epochs=args.epochs, base_lr=1e-3,
    )
    tr = VPoserTrainer(os.path.join(args.out, "work"), cfg, prepared, bm)
    n_train = len(tr.ds_train)
    curve = []
    e0 = tr.evaluate()
    print(f"    epoch 0 (init) eval loss_total={e0['loss_total']:.4f}")
    curve.append({"epoch": 0, "eval": e0})
    for ep in range(args.epochs):
        te = time.time()
        tr.epochs_completed += 1
        train_losses = tr.train_epoch()
        eval_losses = tr.evaluate()
        dt = time.time() - te
        curve.append({"epoch": ep + 1, "train": train_losses, "eval": eval_losses,
                      "epoch_s": dt, "frames_per_s": n_train / dt})
        star = ""
        if eval_losses["loss_total"] < tr.best_loss_total:
            tr.best_loss_total = eval_losses["loss_total"]
            import flax.serialization
            from psi_tpu.utils.tools import makepath
            tr.best_model_fname = makepath(os.path.join(
                tr.work_dir, "snapshots", f"TR00_E{tr.epochs_completed:03d}.pt.msgpack"), isfile=True)
            with open(tr.best_model_fname, "wb") as f:
                f.write(flax.serialization.msgpack_serialize(
                    flax.serialization.to_state_dict(tr.variables)))
            star = " **"
        print(f"    epoch {ep+1}: train={train_losses['loss_total']:.4f} "
              f"eval={eval_losses['loss_total']:.4f} mesh={eval_losses['loss_mesh_rec']:.4f} "
              f"kl={eval_losses['loss_kl']:.4f} ({dt:.0f}s, {n_train/dt:.0f} frames/s){star}")

    # best-snapshot reload must reproduce the recorded best eval loss
    print("[4/4] reload check:", tr.best_model_fname)
    recorded = tr.best_loss_total
    tr.load_best()
    replay = tr.evaluate()
    print(f"    recorded best={recorded:.6f} replayed={replay['loss_total']:.6f}")
    assert abs(replay["loss_total"] - recorded) < 1e-3 * max(1.0, abs(recorded)), (
        recorded, replay["loss_total"])

    payload = {"config": cfg.__dict__, "n_train_frames": n_train,
               "curve": curve, "reload_replay": replay["loss_total"]}
    with open(os.path.join(args.out, "vposer_scale.json"), "w") as f:
        json.dump(payload, f, indent=1)

    print("\nmarkdown table:\n")
    print("| epoch | train total | eval total | eval mesh L1 | eval KL | frames/s |")
    print("|---|---|---|---|---|---|")
    for row in curve:
        if "train" not in row:
            print(f"| 0 (init) | — | {row['eval']['loss_total']:.4f} | "
                  f"{row['eval']['loss_mesh_rec']:.4f} | {row['eval']['loss_kl']:.4f} | — |")
        else:
            print(f"| {row['epoch']} | {row['train']['loss_total']:.4f} | {row['eval']['loss_total']:.4f} | "
                  f"{row['eval']['loss_mesh_rec']:.4f} | {row['eval']['loss_kl']:.4f} | {row['frames_per_s']:.0f} |")
    print("\ndone.")


if __name__ == "__main__":
    main()
