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
    fused_bundle=None,
    fused_mesh=None,
) -> Tuple[jax.Array, jax.Array]:
    """x72: [B, 72] (axis-angle rot) -> (verts [B, V, 3], joints [B, J, 3]).

    cam_ext (optional [B, 4, 4]) applies the camera extrinsics to the
    vertices, matching GeometryTransformer.verts_transform usage.
    precision: forwarded to lbs() ('high' split-bf16 default; 'fast'
    single-pass bf16 for throughput-critical optimization loops;
    'fused' runs the whole vertex path — blendshapes, skinning,
    transl, camera — as ONE Pallas kernel at the 'fast' precision
    tier, see ops/fused_skinning.py).
    joints_direct: forwarded to lbs() — required when ``smplx`` is a
    vertex-subset model from ``smplx_vertex_subset``. Subset models
    fall back from 'fused' to 'fast' (the subset decode is already
    small; no bundle is built for it).
    fused_bundle: precomputed ``make_fused_bundle(smplx)`` for the
    'fused' path. Pass it when calling inside an optimization loop —
    building it per loss evaluation re-pads ~60 MB of model tensors.
    fused_mesh: when the body axis is sharded over a device mesh, the
    fused Pallas call must run under shard_map (a pallas_call is
    unpartitionable to GSPMD) — pass the mesh here; ignored for the
    einsum tiers, which GSPMD partitions on its own.
    """
    p = body_params_encapsulate(x72)
    pose_aa = vposer_decode(vposer_params, p["body_pose_vp"])
    if precision == "fused":
        if joints_direct is not None:
            precision = "fast"  # vertex-subset decode: einsum path
        else:
            from psi_tpu.body.smplx_model import smplx_forward_fused

            verts, joints = smplx_forward_fused(
                smplx,
                transl=p["transl"],
                global_orient=p["global_orient"],
                betas=p["betas"],
                body_pose=pose_aa,
                left_hand_pose=p["left_hand_pose"],
                right_hand_pose=p["right_hand_pose"],
                cam_ext=cam_ext,
                bundle=fused_bundle,
                mesh=fused_mesh,
            )
            return verts, joints
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
