"""Linear blend skinning, TPU-native.

Re-derivation of the SMPL-family LBS forward used by the reference
(vendored at human_body_prior/body_model/lbs.py:34-261, and the
external smplx package): shape blendshapes -> joint regression ->
Rodrigues -> pose-corrective blendshapes -> kinematic-chain rigid
transform -> skinning. All steps are batched jnp; the kinematic-chain
walk is unrolled at trace time (static 55-joint tree) into a sequence
of [B, 4, 4] matmuls, which XLA schedules as one fused program — there
is no per-joint Python in the hot path at runtime.

Vertex-coordinate matmuls need better than single-pass bf16 (1 cm
errors at metre scale); the two FLOP-heavy ones — pose-corrective
blendshapes and the skinning-transform blend — run as split-bf16
contractions (ops/precision.py: ~16-bit-mantissa accuracy, sub-0.1 mm,
at bf16 MXU throughput); the small ones stay f32-HIGHEST.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

from psi_tpu.geometry.rot6d import aa_to_matrix
from psi_tpu.ops.precision import einsum_f32x3, matmul_f32x3

_P = jax.lax.Precision.HIGHEST


def blend_shapes(betas: jax.Array, shape_disps: jax.Array) -> jax.Array:
    """betas [B, L], shape_disps [V, 3, L] -> per-vertex displacement [B, V, 3].

    (reference: human_body_prior/body_model/lbs.py:141-162)
    """
    return jnp.einsum("bl,mkl->bmk", betas, shape_disps, precision=_P)


def vertices2joints(J_regressor: jax.Array, vertices: jax.Array) -> jax.Array:
    """J_regressor [J, V], vertices [B, V, 3] -> joints [B, J, 3].

    (reference: human_body_prior/body_model/lbs.py:121-138)
    """
    return jnp.einsum("bik,ji->bjk", vertices, J_regressor, precision=_P)


def batch_rigid_transform(
    rot_mats: jax.Array, joints: jax.Array, parents: Tuple[int, ...]
) -> Tuple[jax.Array, jax.Array]:
    """Compose per-joint rotations down the kinematic tree.

    rot_mats: [B, J, 3, 3]; joints: [B, J, 3] rest positions;
    parents: static tuple, parents[0] == -1.
    Returns (posed_joints [B, J, 3], rel_transforms [B, J, 4, 4]) where
    rel_transforms are the skinning transforms relative to the rest pose
    (reference: human_body_prior/body_model/lbs.py:207-261).
    """
    B, J = joints.shape[:2]
    dtype = joints.dtype

    rel = joints.at[:, 1:].add(-joints[:, list(parents[1:])])  # joint offsets from parent

    # [B, J, 4, 4] local transforms
    pad_row = jnp.broadcast_to(
        jnp.array([0.0, 0.0, 0.0, 1.0], dtype=dtype), (B, J, 1, 4)
    )
    local = jnp.concatenate(
        [jnp.concatenate([rot_mats, rel[..., None]], axis=-1), pad_row], axis=-2
    )

    # tree walk batched by depth level: all joints at the same depth
    # compose in ONE batched matmul (SMPL-X is ~10 levels deep), instead
    # of 55 sequential tiny matmuls — far fewer, larger TPU ops.
    depth = [0] * J
    for j in range(1, J):
        depth[j] = depth[parents[j]] + 1
    transforms = jnp.zeros((B, J, 4, 4), dtype=joints.dtype)
    transforms = transforms.at[:, 0].set(local[:, 0])
    for lvl in range(1, max(depth) + 1):
        ids = tuple(j for j in range(J) if depth[j] == lvl)
        par = tuple(parents[j] for j in ids)
        comp = jnp.matmul(transforms[:, list(par)], local[:, list(ids)], precision=_P)
        transforms = transforms.at[:, list(ids)].set(comp)

    posed_joints = transforms[:, :, :3, 3]

    # subtract the transform of the rest-pose joint location so the
    # skinning transform maps rest -> posed
    rot_j = jnp.einsum("bjxy,bjy->bjx", transforms[:, :, :3, :3], joints, precision=_P)
    rel_transforms = transforms.at[:, :, :3, 3].add(-rot_j)
    return posed_joints, rel_transforms


def joint_regressor_direct(
    J_regressor: jax.Array, v_template: jax.Array, shapedirs: jax.Array
) -> Tuple[jax.Array, jax.Array]:
    """Fold the joint regression through the shape blend.

    joints(betas) = J_reg @ (v_template + shapedirs·betas) is linear in
    betas, so it factors exactly into a [J, 3] rest-joint template plus
    a [J, 3, L] joint blendshape basis — letting a VERTEX-SUBSET decode
    (fitting's cheap iterations) compute joints without touching the
    full vertex set. Returns (j_template, j_shapedirs)."""
    j_template = jnp.einsum("jv,vk->jk", J_regressor, v_template, precision=_P)
    j_shapedirs = jnp.einsum("jv,vkl->jkl", J_regressor, shapedirs, precision=_P)
    return j_template, j_shapedirs


def lbs(
    betas: jax.Array,
    pose_aa: jax.Array,
    v_template: jax.Array,
    shapedirs: jax.Array,
    posedirs: jax.Array,
    J_regressor: jax.Array,
    parents: Tuple[int, ...],
    lbs_weights: jax.Array,
    exact: bool = False,
    precision: str = "high",
    joints_direct: Tuple[jax.Array, jax.Array] | None = None,
) -> Tuple[jax.Array, jax.Array]:
    """Full LBS forward.

    betas:       [B, L] shape coefficients
    pose_aa:     [B, J*3] axis-angle pose (joint 0 = global orient)
    v_template:  [V, 3]
    shapedirs:   [V, 3, L]
    posedirs:    [(J-1)*9, V*3] pose-corrective basis (or None)
    J_regressor: [J, V]
    parents:     static tuple of J ints
    lbs_weights: [V, J]
    exact:       run the two split-bf16 contractions at full input
                 precision instead (slower; used for f64 parity tests
                 against the reference human_body_prior/body_model/lbs.py)
    precision:   'high' (default) — split-bf16 for the two FLOP-heavy
                 contractions, ~16-bit-mantissa vertex accuracy;
                 'fast' — single-pass bf16 MXU with f32 accumulation
                 (~2^-8-relative vertex error, mm-scale at metre scale;
                 measured fit-protocol impact recorded in PARITY.md).
                 The tiny tree-compose matmuls stay f32-HIGHEST in all
                 modes. `exact=True` overrides to full input precision.
    joints_direct: optional (j_template [J,3], j_shapedirs [J,3,L]) from
                 ``joint_regressor_direct`` — compute joints from betas
                 directly (exact: the regression is linear in betas).
                 Required when v_template/shapedirs/posedirs/lbs_weights
                 are a VERTEX SUBSET of the model (J_regressor is then
                 ignored and may be None).
    Returns (verts [B, V, 3], joints [B, J, 3]).
    """
    B = betas.shape[0]
    J = len(parents)

    v_shaped = v_template[None] + blend_shapes(betas, shapedirs)
    if joints_direct is not None:
        j_template, j_shapedirs = joints_direct
        joints = j_template[None] + blend_shapes(betas, j_shapedirs)
    elif not exact and precision == "fast":
        # single-pass bf16 joint regression (f32 accumulate): ~mm-scale
        # joint error, measured fit impact in PARITY.md
        joints = jnp.einsum(
            "bik,ji->bjk", v_shaped, J_regressor, preferred_element_type=jnp.float32
        )
    else:
        joints = vertices2joints(J_regressor, v_shaped)

    rot_mats = aa_to_matrix(pose_aa.reshape(B, J, 3))  # [B, J, 3, 3]

    if posedirs is not None:
        ident = jnp.eye(3, dtype=v_shaped.dtype)
        pose_feature = (rot_mats[:, 1:] - ident).reshape(B, -1)  # [B, (J-1)*9]
        if exact:
            pose_offsets = jnp.matmul(pose_feature, posedirs, precision=_P).reshape(B, -1, 3)
        elif precision == "fast":
            pose_offsets = jnp.matmul(
                pose_feature, posedirs, preferred_element_type=jnp.float32
            ).reshape(B, -1, 3)
        else:
            pose_offsets = matmul_f32x3(pose_feature, posedirs).reshape(B, -1, 3)
        v_posed = v_shaped + pose_offsets
    else:
        v_posed = v_shaped

    posed_joints, A = batch_rigid_transform(rot_mats, joints, parents)

    # skinning: T[b, v] = sum_j w[v, j] * A[b, j]  (split-bf16 blend).
    # Only the top 3x4 of each 4x4 transform is needed (the last row is
    # constant [0,0,0,1]) — blending 12 instead of 16 values cuts the
    # largest intermediate ([B, V, ...]) by 25%.
    A12 = A[:, :, :3, :].reshape(B, J, 12)  # rows interleave (R | t)
    if exact:
        T = jnp.einsum("vj,bjz->bvz", lbs_weights, A12, precision=_P)
    elif precision == "fast":
        T = jnp.einsum("vj,bjz->bvz", lbs_weights, A12, preferred_element_type=jnp.float32)
    else:
        T = einsum_f32x3("vj,bjz->bvz", lbs_weights, A12, a_axis=1, b_axis=1)
    T34 = T.reshape(B, -1, 3, 4)
    verts = jnp.einsum("bvxy,bvy->bvx", T34[..., :3], v_posed, precision=_P) + T34[..., 3]
    return verts, posed_joints
