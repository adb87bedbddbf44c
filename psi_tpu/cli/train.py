"""Training CLI — reference flag surface (train_s1.py:345-366,
frontend_sh_scripts/train_js.sh) for both stages.

  python -m psi_tpu.cli.train --model_type s1 --save_dir ckpts \
      --batch_size 32 --num_epoch 30 --lr_h 0.0003 \
      --weight_loss_vposer 0.001 --weight_loss_kl 0.1 \
      --weight_loss_contact 0.01 --weight_loss_collision 0.1 \
      [--proxe_path ... | --synthetic]
"""

from __future__ import annotations

import argparse
import os


def build_parser():
    p = argparse.ArgumentParser(description="Train the PSI scene-conditioned CVAE (TPU)")
    p.add_argument("--model_type", type=str, default="s1", choices=["s1", "s2"])
    p.add_argument("--save_dir", type=str, default=os.getcwd())
    p.add_argument("--batch_size", type=int, default=32)
    p.add_argument("--lr_h", type=float, default=3e-4)
    p.add_argument("--num_epoch", type=int, default=30)
    p.add_argument("--weight_loss_vposer", type=float, default=1e-3)
    p.add_argument("--weight_loss_kl", type=float, default=1e-1)
    p.add_argument("--weight_loss_contact", type=float, default=1e-1)
    p.add_argument("--weight_loss_collision", type=float, default=1e-1)
    p.add_argument("--use_all", type=int, default=0, help="use train+test scenes")
    p.add_argument("--only_vircam", type=int, default=0, help="only virtualcams samples")
    p.add_argument("--latentD", type=int, default=256)
    p.add_argument("--grad_clip_norm", type=float, default=None)
    p.add_argument("--num_devices", type=int, default=None, help="DP mesh size (None = all)")
    p.add_argument("--synthetic_batches", type=int, default=4, help="batches/epoch in --synthetic mode")
    p.add_argument(
        "--prune_scene_points", type=int, default=0,
        help="contact-NN candidate pruning for the training chamfer term "
        "(0 = reference-exact full-cloud NN, the default; 2048 = the "
        "fit-validated Morton-tile pruning — the chamfer term is the "
        "largest train-step cost at batch>=32, scripts/profile_train_step.py)")
    from psi_tpu.cli.common import add_asset_args

    add_asset_args(p)
    return p


def main(argv=None):
    args = build_parser().parse_args(argv)

    from psi_tpu.cli.common import build_assets
    from psi_tpu.parallel.mesh import make_mesh
    from psi_tpu.train import TrainOP
    from psi_tpu.utils.config import LossConfig, TrainConfig

    cfg = TrainConfig(
        model_type=args.model_type,
        batch_size=args.batch_size,
        epoch=args.num_epoch,
        init_lr_h=args.lr_h,
        latentD=args.latentD,
        save_dir=args.save_dir,
        grad_clip_norm=args.grad_clip_norm,
    )
    loss_cfg = LossConfig(
        weight_loss_vposer=args.weight_loss_vposer,
        weight_loss_kl=args.weight_loss_kl,
        weight_contact=args.weight_loss_contact,
        weight_collision=args.weight_loss_collision,
        prune_scene_points=args.prune_scene_points,
    )

    assets, registry = build_assets(args)

    if args.synthetic or args.proxe_path is None:
        from psi_tpu.data.synthetic import SyntheticBatchGenerator

        batch_gen = SyntheticBatchGenerator(
            num_scenes=registry.num_scenes, batches_per_epoch=args.synthetic_batches
        )
    else:
        from psi_tpu.data.hdf5 import BatchGeneratorWithSceneMesh

        import glob as _glob

        def find(prefix):
            # accept both naming generations (virtualcams.hdf5 /
            # virtualcams_v2.hdf5, train_s1.py:386-389)
            hits = sorted(_glob.glob(os.path.join(args.proxe_path, f"{prefix}*.hdf5")))
            return hits[-1:] if hits else []

        train_files = find("virtualcams")
        if not args.only_vircam:
            train_files += find("realcams")
        batch_gen = BatchGeneratorWithSceneMesh(
            train_files, mode="all" if args.use_all else "train", registry=registry
        )

    mesh = make_mesh(args.num_devices) if args.num_devices else None
    op = TrainOP(cfg, loss_cfg, assets, mesh=mesh)
    op.train(batch_gen)


if __name__ == "__main__":
    main()
