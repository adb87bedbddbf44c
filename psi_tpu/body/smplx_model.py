"""SMPL-X body model: asset loading and the differentiable forward.

TPU-native equivalent of the external ``smplx`` package as instantiated
by the reference (source/train_s1.py:66-89: model_type='smplx',
gender='neutral', num_pca_comps=12, batch_size=B) plus the vendored
BodyModel wrapper (human_body_prior/body_model/body_model.py:34-185).

The model is a frozen pytree of constant arrays (``SMPLXModel``);
``smplx_forward`` is a pure function over it — jit/vmap/grad-friendly,
compiled once per batch shape. Real SMPL-X npz assets load via
``load_smplx_npz``; ``synthetic_smplx`` builds a structurally-identical
random asset (any vertex/joint count) so tests and benchmarks run
without the licensed download.

SMPL-X topology: 10475 vertices, 55 joints =
1 pelvis + 21 body + jaw + 2 eyes + 2x15 fingers; body_pose is the 21
body joints' axis-angle (63-D); hand poses enter as PCA coefficients
over the model's hands_components, with the hands mean folded into the
pose (flat_hand_mean=False), matching smplx defaults.
"""

from __future__ import annotations

from typing import Optional, Tuple

import flax.struct
import jax
import jax.numpy as jnp
import numpy as np

from psi_tpu.body.lbs import lbs

NUM_SMPLX_VERTS = 10475
NUM_SMPLX_JOINTS = 55
NUM_BODY_JOINTS = 21


@flax.struct.dataclass
class SMPLXModel:
    """Constant pytree of SMPL-X model data. Static fields are hashable
    so the model can close over jit boundaries cleanly."""

    v_template: jax.Array  # [V, 3]
    shapedirs: jax.Array  # [V, 3, n_betas]
    exprdirs: Optional[jax.Array]  # [V, 3, n_expr] or None
    posedirs: Optional[jax.Array]  # [(J-1)*9, V*3] or None
    J_regressor: jax.Array  # [J, V]
    lbs_weights: jax.Array  # [V, J]
    hands_components_l: jax.Array  # [n_pca, 45]
    hands_components_r: jax.Array  # [n_pca, 45]
    pose_mean: jax.Array  # [J*3] (zeros except hand means unless flat_hand_mean)
    # faces is a pytree NODE (device int32 array): static metadata fields
    # must be hashable for jit-argument pytree comparison, and the asset
    # bundle is passed as a traced jit argument throughout the framework.
    faces: jax.Array  # [F, 3] int32
    parents: Tuple[int, ...] = flax.struct.field(pytree_node=False)

    @property
    def num_verts(self) -> int:
        return self.v_template.shape[0]

    @property
    def num_joints(self) -> int:
        return len(self.parents)


def _build_pose_mean(
    num_joints: int, hands_mean_l: np.ndarray, hands_mean_r: np.ndarray, flat_hand_mean: bool
) -> np.ndarray:
    pose_mean = np.zeros(num_joints * 3, dtype=np.float32)
    if not flat_hand_mean:
        # hands are the last 30 joints: 15 left then 15 right
        pose_mean[-90:-45] = hands_mean_l
        pose_mean[-45:] = hands_mean_r
    return pose_mean


def load_smplx_npz(
    npz_path: str,
    num_betas: int = 10,
    num_pca_comps: int = 12,
    num_expression_coeffs: int = 10,
    flat_hand_mean: bool = False,
    use_posedirs: bool = True,
) -> SMPLXModel:
    """Load a SMPLX_{GENDER}.npz asset into an SMPLXModel pytree.

    Field semantics follow the smplx package (and the vendored
    human_body_prior/body_model/body_model.py:34-185): shapedirs columns
    [0:num_betas] are shape, [300:300+n_expr] are expression (when the
    asset carries the 400-wide basis).
    """
    data = np.load(npz_path, allow_pickle=True)
    v_template = np.asarray(data["v_template"], dtype=np.float32)
    shapedirs_all = np.asarray(data["shapedirs"], dtype=np.float32)
    shapedirs = shapedirs_all[:, :, :num_betas]
    exprdirs = None
    if shapedirs_all.shape[-1] >= 300 + num_expression_coeffs:
        exprdirs = jnp.asarray(shapedirs_all[:, :, 300 : 300 + num_expression_coeffs])

    posedirs = None
    if use_posedirs and "posedirs" in data:
        pd = np.asarray(data["posedirs"], dtype=np.float32)  # [V, 3, (J-1)*9]
        posedirs = jnp.asarray(pd.reshape(-1, pd.shape[-1]).T)  # [(J-1)*9, V*3]

    kintree = np.asarray(data["kintree_table"], dtype=np.int64)
    parents = tuple(int(p) if p < 2**31 else -1 for p in kintree[0])
    parents = (-1,) + parents[1:]

    n_j = len(parents)
    hands_l = np.asarray(data["hands_componentsl"], dtype=np.float32)[:num_pca_comps]
    hands_r = np.asarray(data["hands_componentsr"], dtype=np.float32)[:num_pca_comps]
    pose_mean = _build_pose_mean(
        n_j,
        np.asarray(data["hands_meanl"], dtype=np.float32),
        np.asarray(data["hands_meanr"], dtype=np.float32),
        flat_hand_mean,
    )

    return SMPLXModel(
        v_template=jnp.asarray(v_template),
        shapedirs=jnp.asarray(shapedirs),
        exprdirs=exprdirs,
        posedirs=posedirs,
        J_regressor=jnp.asarray(np.asarray(data["J_regressor"], dtype=np.float32)),
        lbs_weights=jnp.asarray(np.asarray(data["weights"], dtype=np.float32)),
        hands_components_l=jnp.asarray(hands_l),
        hands_components_r=jnp.asarray(hands_r),
        pose_mean=jnp.asarray(pose_mean),
        faces=jnp.asarray(np.asarray(data["f"], dtype=np.int32).reshape(-1, 3)),
        parents=parents,
    )


def synthetic_smplx(
    num_verts: int = NUM_SMPLX_VERTS,
    num_joints: int = NUM_SMPLX_JOINTS,
    num_betas: int = 10,
    num_pca_comps: int = 12,
    seed: int = 0,
    use_posedirs: bool = True,
) -> SMPLXModel:
    """Random but structurally-faithful SMPL-X asset for tests/benchmarks.

    The kinematic tree, regressor/weight normalization, and array
    shapes match the real asset; values are seeded random, so LBS
    invariants (rigid equivariance, blendshape linearity) are testable
    without licensed data.
    """
    rng = np.random.default_rng(seed)
    # tree: pelvis root, then a mix of chains (binary-ish tree keeps depth low)
    parents = (-1,) + tuple(int(rng.integers(0, max(1, j))) for j in range(1, num_joints))

    v_template = rng.normal(0, 0.3, size=(num_verts, 3)).astype(np.float32)
    v_template[:, 1] += np.linspace(-0.8, 0.8, num_verts).astype(np.float32)  # vaguely body-like extent

    # joints placed near cluster centers of vertices
    J_reg = rng.random((num_joints, num_verts)).astype(np.float32) ** 8
    J_reg /= J_reg.sum(axis=1, keepdims=True)

    # skinning weights: peaked on a "closest" joint per vertex
    w = rng.random((num_verts, num_joints)).astype(np.float32) ** 6
    w /= w.sum(axis=1, keepdims=True)

    shapedirs = (rng.normal(0, 0.01, size=(num_verts, 3, num_betas))).astype(np.float32)
    posedirs = None
    if use_posedirs:
        pd = rng.normal(0, 1e-3, size=(num_verts, 3, (num_joints - 1) * 9)).astype(np.float32)
        posedirs = jnp.asarray(pd.reshape(-1, pd.shape[-1]).T)

    hands_l = rng.normal(0, 0.1, size=(num_pca_comps, 45)).astype(np.float32)
    hands_r = rng.normal(0, 0.1, size=(num_pca_comps, 45)).astype(np.float32)
    pose_mean = _build_pose_mean(
        num_joints,
        rng.normal(0, 0.05, size=45).astype(np.float32),
        rng.normal(0, 0.05, size=45).astype(np.float32),
        flat_hand_mean=False,
    ) if num_joints == NUM_SMPLX_JOINTS else np.zeros(num_joints * 3, np.float32)

    n_faces = max(1, num_verts - 2)
    faces = np.stack(
        [np.arange(n_faces), np.arange(1, n_faces + 1), np.arange(2, n_faces + 2)], axis=1
    ).astype(np.int32) % num_verts

    return SMPLXModel(
        v_template=jnp.asarray(v_template),
        shapedirs=jnp.asarray(shapedirs),
        exprdirs=None,
        posedirs=posedirs,
        J_regressor=jnp.asarray(J_reg),
        lbs_weights=jnp.asarray(w),
        hands_components_l=jnp.asarray(hands_l),
        hands_components_r=jnp.asarray(hands_r),
        pose_mean=jnp.asarray(pose_mean),
        faces=jnp.asarray(faces),
        parents=parents,
    )


def smplx_vertex_subset(
    model: SMPLXModel, vert_ids: jax.Array
) -> Tuple[SMPLXModel, Tuple[jax.Array, jax.Array]]:
    """Slice the model to a vertex subset, with exact joints preserved.

    Returns (sub_model, joints_direct) where sub_model's per-vertex
    tensors (v_template, shapedirs, exprdirs, posedirs, lbs_weights)
    keep only ``vert_ids`` rows, and joints_direct is the folded
    (j_template, j_shapedirs) pair from ``joint_regressor_direct`` —
    joint locations depend only on betas (linearly), so the subset
    forward reproduces the full model's vertices at those rows exactly
    (same math, same contraction shapes per row). Used by the fitting
    cheap iterations (FitConfig.cheap_collision_verts): the skinning /
    pose-corrective / camera chains scale with rows, so a ~3.5k-row
    subset cuts the dominant fit-iter cost ~3x. faces are NOT remapped
    (meaningless on a subset) — the sub model is for losses, not viz.
    """
    from psi_tpu.body.lbs import joint_regressor_direct

    jd = joint_regressor_direct(model.J_regressor, model.v_template, model.shapedirs)
    P = model.posedirs
    if P is not None:
        V = model.v_template.shape[0]
        P = P.reshape(-1, V, 3)[:, vert_ids, :].reshape(P.shape[0], -1)
    sub = model.replace(
        v_template=model.v_template[vert_ids],
        shapedirs=model.shapedirs[vert_ids],
        exprdirs=model.exprdirs[vert_ids] if model.exprdirs is not None else None,
        posedirs=P,
        J_regressor=model.J_regressor[:, vert_ids],  # unused with joints_direct
        lbs_weights=model.lbs_weights[vert_ids],
    )
    return sub, jd


def _assemble_pose_shape(
    model: SMPLXModel,
    global_orient: jax.Array,
    body_pose: jax.Array,
    betas: jax.Array,
    left_hand_pose: Optional[jax.Array],
    right_hand_pose: Optional[jax.Array],
    expression: Optional[jax.Array],
    jaw_pose: Optional[jax.Array],
    leye_pose: Optional[jax.Array],
    reye_pose: Optional[jax.Array],
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Shared smplx preamble: (full_pose [B, J*3], shape_coeffs, shapedirs)."""
    B = betas.shape[0]
    J = model.num_joints
    dt = model.v_template.dtype
    zeros3 = jnp.zeros((B, 3), dtype=dt)

    jaw = jaw_pose if jaw_pose is not None else zeros3
    leye = leye_pose if leye_pose is not None else zeros3
    reye = reye_pose if reye_pose is not None else zeros3

    if left_hand_pose is not None:
        lh = jnp.matmul(left_hand_pose, model.hands_components_l, precision=jax.lax.Precision.HIGHEST)
    else:
        lh = jnp.zeros((B, 45), dtype=dt)
    if right_hand_pose is not None:
        rh = jnp.matmul(right_hand_pose, model.hands_components_r, precision=jax.lax.Precision.HIGHEST)
    else:
        rh = jnp.zeros((B, 45), dtype=dt)

    if J == NUM_SMPLX_JOINTS:
        full_pose = jnp.concatenate([global_orient, body_pose, jaw, leye, reye, lh, rh], axis=1)
    else:
        # reduced synthetic models: global + (J-1) joints from body_pose
        need = (J - 1) * 3
        full_pose = jnp.concatenate([global_orient, body_pose[:, :need]], axis=1)
    full_pose = full_pose + model.pose_mean[None]

    shapedirs = model.shapedirs
    shape_coeffs = betas
    if expression is not None and model.exprdirs is not None:
        shapedirs = jnp.concatenate([model.shapedirs, model.exprdirs], axis=-1)
        shape_coeffs = jnp.concatenate([betas, expression], axis=-1)
    return full_pose, shape_coeffs, shapedirs


def smplx_forward(
    model: SMPLXModel,
    transl: jax.Array,  # [B, 3]
    global_orient: jax.Array,  # [B, 3] axis-angle
    betas: jax.Array,  # [B, n_betas]
    body_pose: jax.Array,  # [B, 63] axis-angle (21 joints)
    left_hand_pose: Optional[jax.Array] = None,  # [B, n_pca]
    right_hand_pose: Optional[jax.Array] = None,  # [B, n_pca]
    expression: Optional[jax.Array] = None,  # [B, n_expr]
    jaw_pose: Optional[jax.Array] = None,  # [B, 3]
    leye_pose: Optional[jax.Array] = None,
    reye_pose: Optional[jax.Array] = None,
    precision: str = "high",
    joints_direct: Optional[Tuple[jax.Array, jax.Array]] = None,
) -> Tuple[jax.Array, jax.Array]:
    """SMPL-X forward: body params -> (vertices [B, V, 3], joints [B, J, 3]).

    Matches smplx.SMPLX.forward as configured by the reference
    (train_s1.py:66-81): hand poses are PCA coefficients projected
    through hands_components; unspecified face/eye poses are zero; the
    (non-flat) hands mean is added via pose_mean; transl is added last.
    """
    full_pose, shape_coeffs, shapedirs = _assemble_pose_shape(
        model, global_orient, body_pose, betas,
        left_hand_pose, right_hand_pose, expression, jaw_pose, leye_pose, reye_pose,
    )
    verts, joints = lbs(
        shape_coeffs,
        full_pose,
        model.v_template,
        shapedirs,
        model.posedirs,
        model.J_regressor,
        model.parents,
        model.lbs_weights,
        precision=precision,
        joints_direct=joints_direct,
    )
    verts = verts + transl[:, None, :]
    joints = joints + transl[:, None, :]
    return verts, joints


def make_fused_bundle(model: SMPLXModel):
    """Constant operand bundle for ``smplx_forward_fused``.

    Build this ONCE outside any optimization loop (e.g. before the
    fitting scan) and pass it in — rebuilding it per loss evaluation
    would re-pad/transpose ~60 MB of model tensors every iteration.
    Pure traced device math: safe inside jit, nothing baked as an
    executable constant."""
    from psi_tpu.ops.fused_skinning import make_skinning_bundle

    return make_skinning_bundle(
        model.v_template, model.shapedirs, model.posedirs, model.lbs_weights
    )


def smplx_forward_fused(
    model: SMPLXModel,
    transl: jax.Array,  # [B, 3]
    global_orient: jax.Array,  # [B, 3]
    betas: jax.Array,  # [B, n_betas]
    body_pose: jax.Array,  # [B, 63]
    left_hand_pose: Optional[jax.Array] = None,
    right_hand_pose: Optional[jax.Array] = None,
    jaw_pose: Optional[jax.Array] = None,
    leye_pose: Optional[jax.Array] = None,
    reye_pose: Optional[jax.Array] = None,
    cam_ext: Optional[jax.Array] = None,  # [B, 4, 4], folded into the kernel
    bundle=None,
    mesh=None,
) -> Tuple[jax.Array, jax.Array]:
    """smplx_forward with the vertex path in ONE Pallas kernel.

    Same semantics as ``smplx_forward`` followed by
    ``verts_transform(verts, cam_ext)``, at the single-pass-bf16
    precision tier of ``lbs(precision='fast')`` (~2^-8-relative vertex
    error; see ops/fused_skinning.py). The small-tensor stages (pose
    assembly, Rodrigues, kinematic tree, joints) stay in plain JAX at
    f32; joints use the exact folded joint regressor
    (lbs.joint_regressor_direct), so they match the einsum path.
    Expression blendshapes are not supported on this tier (the bundle
    folds model.shapedirs only).
    """
    from psi_tpu.body.lbs import (
        batch_rigid_transform,
        blend_shapes,
        joint_regressor_direct,
    )
    from psi_tpu.geometry.rot6d import aa_to_matrix
    from psi_tpu.ops.fused_skinning import fused_skinning_apply

    full_pose, shape_coeffs, shapedirs = _assemble_pose_shape(
        model, global_orient, body_pose, betas,
        left_hand_pose, right_hand_pose, None, jaw_pose, leye_pose, reye_pose,
    )
    B = betas.shape[0]
    J = model.num_joints

    rot_mats = aa_to_matrix(full_pose.reshape(B, J, 3))
    j_template, j_shapedirs = joint_regressor_direct(
        model.J_regressor, model.v_template, shapedirs
    )
    joints_rest = j_template[None] + blend_shapes(shape_coeffs, j_shapedirs)
    posed_joints, A = batch_rigid_transform(rot_mats, joints_rest, model.parents)

    # the coefficient row matches the bundle's basis layout exactly:
    # [1 | shape_coeffs | pose_feature], with the pose block present
    # only when the model carries pose-corrective blendshapes (the
    # bundle folds posedirs only when model.posedirs is not None)
    cb_parts = [jnp.ones((B, 1), shape_coeffs.dtype), shape_coeffs]
    if model.posedirs is not None:
        ident = jnp.eye(3, dtype=shape_coeffs.dtype)
        cb_parts.append((rot_mats[:, 1:] - ident).reshape(B, -1))
    cb = jnp.concatenate(cb_parts, axis=1)
    A12 = A[:, :, :3, :].reshape(B, J, 12)

    if cam_ext is None:
        camR = jnp.broadcast_to(jnp.eye(3, dtype=transl.dtype), (B, 3, 3))
        camT = jnp.zeros((B, 3), transl.dtype)
    else:
        camR, camT = cam_ext[:, :3, :3], cam_ext[:, :3, 3]
    t_eff = jnp.einsum("bxy,by->bx", camR, transl) + camT
    cam12 = jnp.concatenate([camR, t_eff[:, :, None]], axis=-1).reshape(B, 12)

    if bundle is None:
        bundle = make_fused_bundle(model)
    # a stale bundle with compatible PADDED shapes (built from another
    # model, or from this model with a different posedirs setting) would
    # produce silently wrong vertices — fail loudly instead
    if bundle.n_verts != model.num_verts:
        raise ValueError(
            f"fused bundle was built for a {bundle.n_verts}-vertex model, "
            f"got model.num_verts={model.num_verts}"
        )
    if bundle.n_feat != cb.shape[1]:
        raise ValueError(
            f"fused bundle basis has n_feat={bundle.n_feat} coefficient rows "
            f"but the assembled coefficient vector has {cb.shape[1]} "
            "(posedirs presence or n_betas mismatch between the bundle's "
            "model and this one)"
        )
    verts = fused_skinning_apply(cb, A12, cam12, bundle, mesh=mesh)

    joints = posed_joints + transl[:, None, :]
    if cam_ext is not None:
        joints = jnp.einsum("bjy,bxy->bjx", joints, camR) + camT[:, None, :]
    return verts, joints
