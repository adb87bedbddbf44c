"""Attribute the LBS fwd+bwd cost inside the fit loop (run on real TPU).

profile_cheap_iter.py showed the cheap refresh iteration is ~5.9 ms at
N=256 and that ~5.6 ms of it is the VPoser-decode -> SMPL-X LBS chain
(forward + backward). The raw numbers say that cannot be compute: the
two FLOP-heavy contractions total ~12 GFLOP forward (~35 fwd+bwd) =
well under 1 ms even at f32 rates, and the end-to-end HBM traffic bound
is ~1 ms. This script times the chain's stages in isolation — each as
20 Adam-like iterations inside ONE jitted scan with a REAL vertex
cotangent (a sum-of-verts loss; ablations whose loss ignores verts get
the decode DCE'd, see ROUND_NOTES.md) — to find where the 5.6 ms goes.

Stages (cumulative chain prefixes, so stage N+1 minus stage N is the
marginal cost of that piece):
  vposer      x72 -> pose_aa           (VPoser decode MLP + 6D->aa)
  blendshapes + shape blend + joint regression
  posecorr    + pose-corrective blendshape matmul
  tree        + Rodrigues + kinematic-chain compose (A transforms)
  skin        + skinning blend T = W@A and vertex transform (full LBS)
  camext      + camera extrinsics transform (= body_vec_to_verts)

    python scripts/profile_lbs.py [--fast]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from psi_tpu.body.lbs import batch_rigid_transform, blend_shapes, vertices2joints
from psi_tpu.body.smplx_model import synthetic_smplx
from psi_tpu.body.vposer import vposer_decode
from psi_tpu.data.synthetic import make_synthetic_assets, random_body_batch, random_camera_batch
from psi_tpu.geometry.bodyvec import body_params_encapsulate
from psi_tpu.geometry.camera import verts_transform
from psi_tpu.geometry.rot6d import aa_to_matrix
from psi_tpu.ops.precision import einsum_f32x3, matmul_f32x3

N = 256
NUM_ITER = 20
_P = jax.lax.Precision.HIGHEST


def main():
    fast = "--fast" in sys.argv
    assets, _ = make_synthetic_assets(
        num_verts=10475, num_joints=55, num_scenes=1, sdf_dim=32,
        scene_points=1024, n_contact=1455, seed=0,
    )
    m = assets.smplx
    vp = assets.vposer_params
    rng = np.random.default_rng(0)
    cam_ext = jnp.asarray(random_camera_batch(rng, N)[0])
    x72 = jnp.asarray(random_body_batch(rng, N, np.full((N,), 5.0, np.float32)))
    J = len(m.parents)

    def chain(x, upto):
        p = body_params_encapsulate(x)
        pose_aa_body = vposer_decode(vp, p["body_pose_vp"])
        if upto == "vposer":
            return pose_aa_body
        full_aa = jnp.concatenate(
            [p["global_orient"], pose_aa_body] +
            ([jnp.zeros((x.shape[0], (J - 22) * 3), x.dtype)] if J > 22 else []),
            axis=1,
        )[:, : J * 3]
        betas = p["betas"]
        v_shaped = m.v_template[None] + blend_shapes(betas, m.shapedirs)
        if fast:
            joints = jnp.einsum("bik,ji->bjk", v_shaped, m.J_regressor,
                                preferred_element_type=jnp.float32)
        else:
            joints = vertices2joints(m.J_regressor, v_shaped)
        if upto == "blendshapes":
            return v_shaped.sum() + joints.sum()
        rot_mats = aa_to_matrix(full_aa.reshape(x.shape[0], J, 3))
        ident = jnp.eye(3, dtype=v_shaped.dtype)
        pose_feature = (rot_mats[:, 1:] - ident).reshape(x.shape[0], -1)
        if fast:
            pose_offsets = jnp.matmul(
                pose_feature, m.posedirs, preferred_element_type=jnp.float32
            ).reshape(x.shape[0], -1, 3)
        else:
            pose_offsets = matmul_f32x3(pose_feature, m.posedirs).reshape(x.shape[0], -1, 3)
        v_posed = v_shaped + pose_offsets
        if upto == "posecorr":
            return v_posed.sum()
        posed_joints, A = batch_rigid_transform(rot_mats, joints, tuple(int(i) for i in np.asarray(m.parents)))
        if upto == "tree":
            return A.sum() + v_posed.sum()
        A12 = A[:, :, :3, :].reshape(x.shape[0], J, 12)
        if fast:
            T = jnp.einsum("vj,bjz->bvz", m.lbs_weights, A12,
                           preferred_element_type=jnp.float32)
        else:
            T = einsum_f32x3("vj,bjz->bvz", m.lbs_weights, A12, a_axis=1, b_axis=1)
        T34 = T.reshape(x.shape[0], -1, 3, 4)
        verts = jnp.einsum("bvxy,bvy->bvx", T34[..., :3], v_posed, precision=_P) + T34[..., 3]
        if upto == "skin":
            return verts.sum()
        return verts_transform(verts, cam_ext).sum()

    stages = ["vposer", "blendshapes", "posecorr", "tree", "skin", "camext"]
    print(f"{'stage':<14} {'ms/iter':>8} {'marginal':>9}   ({'fast' if fast else 'high'} precision, N={N})")
    prev = 0.0
    for st in stages:
        @jax.jit
        def run(x0, _st=st):
            def step(x, _):
                g = jax.grad(lambda xx: jnp.sum(chain(xx, _st)))(x)
                return x - 1e-4 * g, None
            out, _ = jax.lax.scan(step, x0, None, length=NUM_ITER)
            return out

        out = run(x72)
        out.block_until_ready()
        reps = 5
        t0 = time.time()
        for _ in range(reps):
            out = run(out)
        out.block_until_ready()
        dt = (time.time() - t0) / reps / NUM_ITER * 1e3
        print(f"{st:<14} {dt:8.3f} {dt - prev:9.3f}", flush=True)
        prev = dt


if __name__ == "__main__":
    main()
