"""Body-model layer tests: LBS invariants + independent numpy golden,
SMPL-X forward semantics, VPoser decode shapes/round-trips."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from psi_tpu.body import (
    lbs,
    synthetic_smplx,
    smplx_forward,
    VPoser,
    vposer_decode,
    synthetic_vposer_params,
)
from psi_tpu.geometry.rot6d import aa_to_matrix


def _numpy_lbs(betas, pose, v_template, shapedirs, posedirs, J_reg, parents, weights):
    """Independent per-sample loop transcription of the LBS math
    (golden for the vectorized jnp implementation)."""
    B = betas.shape[0]
    V = v_template.shape[0]
    J = len(parents)
    out_v = np.zeros((B, V, 3))
    out_j = np.zeros((B, J, 3))
    for b in range(B):
        v_shaped = v_template + shapedirs @ betas[b]
        joints = J_reg @ v_shaped
        R = np.asarray(aa_to_matrix(jnp.asarray(pose[b].reshape(J, 3))))
        if posedirs is not None:
            feat = (R[1:] - np.eye(3)).reshape(-1)
            v_posed = v_shaped + (feat @ posedirs).reshape(V, 3)
        else:
            v_posed = v_shaped
        # kinematic chain
        G = np.zeros((J, 4, 4))
        for j in range(J):
            local = np.eye(4)
            local[:3, :3] = R[j]
            local[:3, 3] = joints[j] - (joints[parents[j]] if parents[j] >= 0 else 0)
            G[j] = (G[parents[j]] @ local) if parents[j] >= 0 else local
        out_j[b] = G[:, :3, 3]
        # remove rest-pose joint contribution
        A = G.copy()
        for j in range(J):
            A[j, :3, 3] -= G[j, :3, :3] @ joints[j]
        for v in range(V):
            T = np.einsum("j,jxy->xy", weights[v], A)
            out_v[b, v] = T[:3, :3] @ v_posed[v] + T[:3, 3]
    return out_v, out_j


@pytest.fixture(scope="module")
def small_model():
    return synthetic_smplx(num_verts=40, num_joints=7, seed=1)


def test_lbs_matches_numpy_golden(small_model, rng):
    m = small_model
    B, J = 3, 7
    betas = rng.normal(size=(B, 10)).astype(np.float32)
    pose = (rng.normal(size=(B, J * 3)) * 0.4).astype(np.float32)
    pd = np.asarray(m.posedirs) if m.posedirs is not None else None
    verts, joints = lbs(
        jnp.asarray(betas), jnp.asarray(pose), m.v_template, m.shapedirs,
        m.posedirs, m.J_regressor, m.parents, m.lbs_weights,
    )
    ev, ej = _numpy_lbs(
        betas, pose, np.asarray(m.v_template), np.asarray(m.shapedirs), pd,
        np.asarray(m.J_regressor), m.parents, np.asarray(m.lbs_weights),
    )
    np.testing.assert_allclose(np.asarray(verts), ev, atol=1e-4)
    np.testing.assert_allclose(np.asarray(joints), ej, atol=1e-4)


def test_lbs_rest_pose_is_template(small_model):
    m = small_model
    B, J = 2, 7
    verts, joints = lbs(
        jnp.zeros((B, 10)), jnp.zeros((B, J * 3)), m.v_template, m.shapedirs,
        m.posedirs, m.J_regressor, m.parents, m.lbs_weights,
    )
    np.testing.assert_allclose(np.asarray(verts), np.tile(np.asarray(m.v_template), (B, 1, 1)), atol=1e-5)


def test_lbs_global_rotation_equivariance(small_model, rng):
    """Rotating only the root rotates the mesh about the root joint."""
    m = small_model
    J = 7
    aa = rng.normal(size=(1, 3)).astype(np.float32)
    pose = np.zeros((1, J * 3), np.float32)
    pose[:, :3] = aa
    verts_r, _ = lbs(jnp.zeros((1, 10)), jnp.asarray(pose), m.v_template, m.shapedirs,
                     m.posedirs, m.J_regressor, m.parents, m.lbs_weights)
    verts_0, joints_0 = lbs(jnp.zeros((1, 10)), jnp.zeros((1, J * 3)), m.v_template, m.shapedirs,
                            m.posedirs, m.J_regressor, m.parents, m.lbs_weights)
    R = np.asarray(aa_to_matrix(jnp.asarray(aa)))[0]
    j0 = np.asarray(joints_0)[0, 0]
    expected = (np.asarray(verts_0)[0] - j0) @ R.T + j0
    np.testing.assert_allclose(np.asarray(verts_r)[0], expected, atol=1e-4)


def test_lbs_beta_linearity(small_model, rng):
    m = small_model
    betas = rng.normal(size=(1, 10)).astype(np.float32)
    v1, _ = lbs(jnp.asarray(betas), jnp.zeros((1, 21)), m.v_template, m.shapedirs,
                m.posedirs, m.J_regressor, m.parents, m.lbs_weights)
    v0, _ = lbs(jnp.zeros((1, 10)), jnp.zeros((1, 21)), m.v_template, m.shapedirs,
                m.posedirs, m.J_regressor, m.parents, m.lbs_weights)
    delta = np.einsum("l,mkl->mk", betas[0], np.asarray(m.shapedirs))
    np.testing.assert_allclose(np.asarray(v1 - v0)[0], delta, atol=1e-4)


def test_smplx_forward_shapes_and_transl(rng):
    m = synthetic_smplx(num_verts=100, num_joints=55, seed=2)
    B = 4
    transl = rng.normal(size=(B, 3)).astype(np.float32)
    verts, joints = smplx_forward(
        m,
        transl=jnp.asarray(transl),
        global_orient=jnp.zeros((B, 3)),
        betas=jnp.zeros((B, 10)),
        body_pose=jnp.zeros((B, 63)),
        left_hand_pose=jnp.zeros((B, 12)),
        right_hand_pose=jnp.zeros((B, 12)),
    )
    assert verts.shape == (B, 100, 3)
    assert joints.shape == (B, 55, 3)
    # translation shifts everything
    verts0, _ = smplx_forward(
        m, transl=jnp.zeros((B, 3)), global_orient=jnp.zeros((B, 3)),
        betas=jnp.zeros((B, 10)), body_pose=jnp.zeros((B, 63)),
        left_hand_pose=jnp.zeros((B, 12)), right_hand_pose=jnp.zeros((B, 12)),
    )
    np.testing.assert_allclose(np.asarray(verts), np.asarray(verts0) + transl[:, None], atol=1e-5)


def test_smplx_hand_pca_projection(rng):
    """Hand PCA coefficients act through hands_components (smplx semantics)."""
    m = synthetic_smplx(num_verts=60, num_joints=55, seed=3)
    B = 2
    lh = rng.normal(size=(B, 12)).astype(np.float32)
    v1, _ = smplx_forward(
        m, transl=jnp.zeros((B, 3)), global_orient=jnp.zeros((B, 3)),
        betas=jnp.zeros((B, 10)), body_pose=jnp.zeros((B, 63)),
        left_hand_pose=jnp.asarray(lh), right_hand_pose=jnp.zeros((B, 12)),
    )
    v2, _ = smplx_forward(
        m, transl=jnp.zeros((B, 3)), global_orient=jnp.zeros((B, 3)),
        betas=jnp.zeros((B, 10)), body_pose=jnp.zeros((B, 63)),
        left_hand_pose=jnp.zeros((B, 12)), right_hand_pose=jnp.zeros((B, 12)),
    )
    assert float(jnp.abs(v1 - v2).max()) > 1e-6  # hands move the mesh
    # zero coefficients == zero projected pose (mean still applies): identical
    v3, _ = smplx_forward(
        m, transl=jnp.zeros((B, 3)), global_orient=jnp.zeros((B, 3)),
        betas=jnp.zeros((B, 10)), body_pose=jnp.zeros((B, 63)),
    )
    np.testing.assert_allclose(np.asarray(v2), np.asarray(v3), atol=1e-6)


def test_smplx_forward_jit_grad(rng):
    m = synthetic_smplx(num_verts=64, num_joints=55, seed=4)

    def loss(body_pose):
        v, _ = smplx_forward(
            m, transl=jnp.zeros((1, 3)), global_orient=jnp.zeros((1, 3)),
            betas=jnp.zeros((1, 10)), body_pose=body_pose,
            left_hand_pose=jnp.zeros((1, 12)), right_hand_pose=jnp.zeros((1, 12)),
        )
        return jnp.sum(v ** 2)

    g = jax.jit(jax.grad(loss))(jnp.asarray(rng.normal(size=(1, 63)).astype(np.float32) * 0.1))
    assert np.all(np.isfinite(np.asarray(g)))
    assert float(jnp.abs(g).max()) > 0


def test_vposer_decode_shapes():
    params = synthetic_vposer_params(seed=0)
    z = jnp.asarray(np.random.default_rng(0).normal(size=(5, 32)).astype(np.float32))
    aa = vposer_decode(params, z)
    assert aa.shape == (5, 63)
    assert np.all(np.isfinite(np.asarray(aa)))


def test_vposer_decode_valid_rotations():
    """Decoded 6D blocks produce orthonormal rotation matrices."""
    params = synthetic_vposer_params(seed=1)
    mdl = VPoser()
    z = jnp.asarray(np.random.default_rng(1).normal(size=(3, 32)).astype(np.float32))
    R = mdl.apply(params, z, method=VPoser.decode_matrot)
    assert R.shape == (3, 21, 3, 3)
    eye = jnp.einsum("bjik,bjlk->bjil", R, R)
    np.testing.assert_allclose(np.asarray(eye), np.tile(np.eye(3), (3, 21, 1, 1)), atol=1e-5)


def test_vposer_encode_decode_consistency():
    params = synthetic_vposer_params(seed=2)
    mdl = VPoser()
    pose = jnp.asarray(np.random.default_rng(2).normal(size=(4, 63)).astype(np.float32) * 0.3)
    out = mdl.apply(params, pose, deterministic=True)
    assert out["mean"].shape == (4, 32)
    assert out["std"].shape == (4, 32)
    assert np.all(np.asarray(out["std"]) > 0)
    assert out["pose_aa"].shape == (4, 63)


def test_lbs_fast_precision_close():
    """'fast' (single-pass bf16 MXU) verts stay within mm-scale of the
    'high' (split-bf16) path — the measured-accuracy contract behind
    FitConfig.lbs_precision='fast'."""
    import jax.numpy as jnp
    from psi_tpu.body.decode import body_vec_to_verts
    from psi_tpu.body.smplx_model import synthetic_smplx
    from psi_tpu.body.vposer import synthetic_vposer_params

    m = synthetic_smplx(num_verts=512, num_joints=22, seed=0)
    vp = synthetic_vposer_params(seed=0)
    rng = np.random.default_rng(0)
    x72 = jnp.asarray((rng.normal(size=(4, 72)) * 0.3).astype(np.float32))
    v_hi, j_hi = body_vec_to_verts(m, vp, x72, precision="high")
    v_fast, j_fast = body_vec_to_verts(m, vp, x72, precision="fast")
    scale = float(np.abs(np.asarray(v_hi)).max())
    assert float(np.abs(np.asarray(v_fast) - np.asarray(v_hi)).max()) < 0.02 * scale
    assert float(np.abs(np.asarray(j_fast) - np.asarray(j_hi)).max()) < 0.02 * scale


def test_smplx_vertex_subset_matches_full_rows():
    """smplx_vertex_subset: the subset forward reproduces the full
    model's vertices at the selected rows (same per-row math), and the
    folded joint regressor is exact (joints are linear in betas)."""
    import jax.numpy as jnp

    from psi_tpu.body.decode import body_vec_to_verts
    from psi_tpu.body.smplx_model import smplx_vertex_subset, synthetic_smplx
    from psi_tpu.body.vposer import synthetic_vposer_params

    m = synthetic_smplx(num_verts=512, num_joints=22, seed=0)
    vp = synthetic_vposer_params(seed=0)
    rng = np.random.default_rng(0)
    x72 = jnp.asarray(rng.normal(size=(3, 72)).astype(np.float32) * 0.3)
    cam = jnp.asarray(np.tile(np.eye(4, dtype=np.float32), (3, 1, 1)))

    rows = jnp.asarray(np.unique(rng.integers(0, 512, 100)), jnp.int32)
    sub, jd = smplx_vertex_subset(m, rows)

    v_full, j_full = body_vec_to_verts(m, vp, x72, cam)
    v_sub, j_sub = body_vec_to_verts(sub, vp, x72, cam, joints_direct=jd)
    # joints: exact linear fold (f32 rounding only)
    np.testing.assert_allclose(np.asarray(j_sub), np.asarray(j_full), rtol=1e-5, atol=1e-5)
    # verts: same per-row contractions; split-bf16 summands associate
    # identically row-wise, tolerance covers contraction-order variance
    np.testing.assert_allclose(
        np.asarray(v_sub), np.asarray(v_full)[:, np.asarray(rows)], rtol=1e-4, atol=1e-5
    )
