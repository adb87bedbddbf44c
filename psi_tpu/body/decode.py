"""Shared body-vector -> mesh decode path.

The chain every consumer (training loss, fitting, eval, viz) runs
(reference: source/train_s1.py:136-154, fitting_proxe.py:113-129,
utils_eval_collision_habitat.py): split the 72-D vector, decode the
VPoser latent to 63-D axis-angle, run SMPL-X, optionally apply camera
extrinsics. One pure function so XLA fuses VPoser-decode -> LBS ->
transform into a single program.
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import jax

from psi_tpu.body.smplx_model import SMPLXModel, smplx_forward
from psi_tpu.body.vposer import vposer_decode
from psi_tpu.geometry.bodyvec import body_params_encapsulate
from psi_tpu.geometry.camera import verts_transform


def body_vec_to_verts(
    smplx: SMPLXModel,
    vposer_params: Dict[str, Any],
    x72: jax.Array,
    cam_ext: Optional[jax.Array] = None,
    precision: str = "high",
    joints_direct=None,
) -> Tuple[jax.Array, jax.Array]:
    """x72: [B, 72] (axis-angle rot) -> (verts [B, V, 3], joints [B, J, 3]).

    cam_ext (optional [B, 4, 4]) applies the camera extrinsics to the
    vertices, matching GeometryTransformer.verts_transform usage.
    precision: forwarded to lbs() ('high' split-bf16 default; 'fast'
    single-pass bf16 for throughput-critical optimization loops).
    joints_direct: forwarded to lbs() — required when ``smplx`` is a
    vertex-subset model from ``smplx_vertex_subset``.
    """
    p = body_params_encapsulate(x72)
    pose_aa = vposer_decode(vposer_params, p["body_pose_vp"])
    verts, joints = smplx_forward(
        smplx,
        transl=p["transl"],
        global_orient=p["global_orient"],
        betas=p["betas"],
        body_pose=pose_aa,
        left_hand_pose=p["left_hand_pose"],
        right_hand_pose=p["right_hand_pose"],
        precision=precision,
        joints_direct=joints_direct,
    )
    if cam_ext is not None:
        verts = verts_transform(verts, cam_ext)
        joints = verts_transform(joints, cam_ext)
    return verts, joints
