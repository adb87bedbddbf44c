"""BodyModel wrappers + L-BFGS optimizer tests."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from psi_tpu.body.body_model import BodyModel, BodyModelWithPoser
from psi_tpu.body.smplx_model import synthetic_smplx
from psi_tpu.body.vposer import synthetic_vposer_params
from psi_tpu.utils.lbfgs import lbfgs_minimize


def test_lbfgs_quadratic():
    A = jnp.asarray(np.diag([1.0, 10.0, 100.0]).astype(np.float32))
    b = jnp.asarray(np.array([1.0, -2.0, 3.0], np.float32))

    def f(x):
        return 0.5 * x @ A @ x - b @ x

    res = lbfgs_minimize(f, jnp.zeros(3), max_iter=50)
    expected = np.linalg.solve(np.asarray(A), np.asarray(b))
    np.testing.assert_allclose(np.asarray(res.x), expected, atol=1e-4)
    assert res.converged


def test_lbfgs_rosenbrock():
    def f(x):
        return jnp.sum(100.0 * (x[1:] - x[:-1] ** 2) ** 2 + (1 - x[:-1]) ** 2)

    res = lbfgs_minimize(f, jnp.zeros(4), max_iter=200)
    np.testing.assert_allclose(np.asarray(res.x), 1.0, atol=1e-3)


def test_body_model_forward():
    bm = BodyModel(synthetic_smplx(num_verts=100, num_joints=55, seed=0), batch_size=2)
    out = bm()
    assert out.v.shape == (2, 100, 3)
    assert out.Jtr.shape == (2, 55, 3)
    out2 = bm(transl=np.ones((2, 3), np.float32))
    np.testing.assert_allclose(np.asarray(out2.v), np.asarray(out.v) + 1.0, atol=1e-5)


def test_body_model_with_poser():
    m = synthetic_smplx(num_verts=80, num_joints=55, seed=1)
    vp = synthetic_vposer_params(seed=1)
    bm = BodyModelWithPoser(m, vp, batch_size=1)
    out0 = bm()
    bm.randomize_pose(jax.random.PRNGKey(3))
    out1 = bm()
    assert float(jnp.abs(out1.v - out0.v).max()) > 1e-5  # pose changed the mesh
    # untangler runs and returns finite latents
    bm.untangle_interpenetrations(max_iter=3, n_samples=64)
    assert np.all(np.isfinite(np.asarray(bm.poZ_body)))
