"""Tutorial: sample body poses from the VPoser prior and decode meshes
(equivalent of human_body_prior/tutorials/sample_body_pose.py).

    python examples/sample_body_pose.py [--n 5] [--out poses.png]
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=5)
    ap.add_argument("--out", type=str, default="sampled_poses.png")
    ap.add_argument("--vposer_ckpt", type=str, default=None, help="torch snapshot dir/file (else random weights)")
    ap.add_argument("--smplx_npz", type=str, default=None, help="SMPLX_NEUTRAL.npz (else synthetic body)")
    args = ap.parse_args()

    from psi_tpu.body.smplx_model import load_smplx_npz, smplx_forward, synthetic_smplx
    from psi_tpu.body.vposer import synthetic_vposer_params, vposer_decode

    if args.vposer_ckpt:
        from psi_tpu.utils.convert_torch import load_vposer_params

        vp = load_vposer_params(args.vposer_ckpt)
    else:
        vp = synthetic_vposer_params(seed=0)

    body = load_smplx_npz(args.smplx_npz) if args.smplx_npz else synthetic_smplx(num_verts=600, num_joints=55)

    # z ~ N(0, 1) -> 21-joint axis-angle poses (VPoser.sample_poses semantics)
    z = jax.random.normal(jax.random.PRNGKey(0), (args.n, 32))
    pose_aa = vposer_decode(vp, z)
    print(f"sampled {args.n} poses, axis-angle shape {pose_aa.shape}")

    verts, joints = smplx_forward(
        body,
        transl=jnp.zeros((args.n, 3)),
        global_orient=jnp.zeros((args.n, 3)),
        betas=jnp.zeros((args.n, 10)),
        body_pose=pose_aa,
    )
    print(f"decoded meshes: verts {verts.shape}, joints {joints.shape}")

    # render a grid
    from psi_tpu.viz.mesh_viewer import MeshViewer, imagearray2file

    mv = MeshViewer(width=200, height=200)
    frames = np.zeros((1, args.n, 1, 200, 200, 3), np.uint8)
    for i in range(args.n):
        mv.set_meshes([(
            np.asarray(verts[i]) + np.array([0, 0, 2.5]),
            np.asarray(body.faces),
            np.tile([0.4, 0.5, 0.85], (verts.shape[1], 1)),
        )], densify=0)
        frames[0, i, 0] = mv.render()
    imagearray2file(frames, args.out)
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
