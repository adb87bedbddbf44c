"""Latent line sweep + VPoser trainer visualization tests."""

import os

import numpy as np
import jax
import jax.numpy as jnp


def test_generate_bodies_line(rng):
    from psi_tpu.gen.sample import generate_bodies_line
    from psi_tpu.models import HumanCVAES1

    mdl = HumanCVAES1(latentD=32)
    variables = mdl.init(jax.random.PRNGKey(0), jnp.zeros((1, 75)), jnp.zeros((1, 128, 128, 2)))
    xs = jnp.zeros((1, 128, 128, 2))
    cam_int = jnp.asarray(np.eye(3, dtype=np.float32) * 500)[None].at[0, 2, 2].set(1.0)
    x72, eps = generate_bodies_line(mdl, variables, xs, cam_int, jnp.asarray([6.0]), 8)
    assert x72.shape == (8, 72)
    assert eps.shape == (8, 32)
    # eps sweeps monotonically
    assert float(eps[0, 0]) < float(eps[-1, 0])
    np.testing.assert_allclose(np.asarray(eps[0]), -3.0, atol=1e-5)


def test_vposer_trainer_vis(tmp_path):
    from psi_tpu.body.smplx_model import synthetic_smplx
    from psi_tpu.data.amass import make_synthetic_amass
    from psi_tpu.train.vposer_trainer import VPoserTrainConfig, VPoserTrainer

    make_synthetic_amass(str(tmp_path / "data"), n_train=32, n_val=16)
    bm = synthetic_smplx(num_verts=60, num_joints=22, seed=0)
    cfg = VPoserTrainConfig(num_neurons=32, batch_size=8, num_epochs=1, num_joints=21)
    tr = VPoserTrainer(str(tmp_path / "w"), cfg, str(tmp_path / "data"), bm)
    poses = np.random.default_rng(0).normal(0, 0.3, (4, 63)).astype(np.float32)
    out = tr.vis_results(poses, str(tmp_path / "vis.png"), n_show=2)
    assert os.path.exists(out)
