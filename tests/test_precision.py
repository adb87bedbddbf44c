"""Split-bf16 matmul utilities: accuracy vs f32-HIGHEST."""

import numpy as np
import jax
import jax.numpy as jnp

from psi_tpu.ops.precision import einsum_f32x3, matmul_f32x3


def test_matmul_split_accuracy(rng):
    a = rng.normal(size=(64, 486)).astype(np.float32)
    b = rng.normal(size=(486, 300)).astype(np.float32)
    out = np.asarray(matmul_f32x3(jnp.asarray(a), jnp.asarray(b)))
    ref = a.astype(np.float64) @ b.astype(np.float64)
    # ~16-bit mantissa: relative error well under 1e-4 of the magnitude
    scale = np.abs(ref).max()
    assert np.abs(out - ref).max() < 2e-4 * scale


def test_matmul_split_batched(rng):
    a = rng.normal(size=(4, 32, 55)).astype(np.float32)
    b = rng.normal(size=(4, 55, 16)).astype(np.float32)
    out = np.asarray(matmul_f32x3(jnp.asarray(a), jnp.asarray(b)))
    ref = np.einsum("bij,bjk->bik", a.astype(np.float64), b.astype(np.float64))
    assert np.abs(out - ref).max() < 2e-4 * np.abs(ref).max()


def test_einsum_split_accuracy(rng):
    w = rng.random((200, 55)).astype(np.float32)
    A = rng.normal(size=(3, 55, 16)).astype(np.float32)
    out = np.asarray(einsum_f32x3("vj,bjz->bvz", jnp.asarray(w), jnp.asarray(A), a_axis=1, b_axis=1))
    ref = np.einsum("vj,bjz->bvz", w.astype(np.float64), A.astype(np.float64))
    assert np.abs(out - ref).max() < 2e-4 * np.abs(ref).max()


def test_lbs_still_accurate_after_split(rng):
    """LBS with split-bf16 heavy matmuls still matches the numpy golden to
    sub-0.5mm at the synthetic model's ~metre scale."""
    from psi_tpu.body import lbs, synthetic_smplx
    from tests.test_body import _numpy_lbs

    m = synthetic_smplx(num_verts=40, num_joints=7, seed=1)
    betas = rng.normal(size=(2, 10)).astype(np.float32)
    pose = (rng.normal(size=(2, 21)) * 0.4).astype(np.float32)
    verts, _ = lbs(jnp.asarray(betas), jnp.asarray(pose), m.v_template, m.shapedirs,
                   m.posedirs, m.J_regressor, m.parents, m.lbs_weights)
    ev, _ = _numpy_lbs(betas, pose, np.asarray(m.v_template), np.asarray(m.shapedirs),
                       np.asarray(m.posedirs) if m.posedirs is not None else None,
                       np.asarray(m.J_regressor), m.parents, np.asarray(m.lbs_weights))
    assert np.abs(np.asarray(verts) - ev).max() < 5e-4
