"""VPoser trainer + AMASS prep tests."""

import os

import numpy as np
import pytest

from psi_tpu.body.smplx_model import synthetic_smplx
from psi_tpu.data.amass import (
    VPoserDS,
    make_synthetic_amass,
    prepare_vposer_datasets,
    subsample_amass_npz,
)
from psi_tpu.train.vposer_trainer import VPoserTrainConfig, VPoserTrainer
from psi_tpu.utils.tools import EarlyStopping


def test_subsample_amass(tmp_path, rng):
    poses = rng.normal(size=(200, 156)).astype(np.float32)
    np.savez(tmp_path / "mocap.npz", poses=poses)
    out = subsample_amass_npz(str(tmp_path / "mocap.npz"), keep_rate=0.5)
    assert out is not None
    assert out.shape[1] == 156
    # trimming removes 10% head+tail, keep ~50%
    assert 40 < out.shape[0] < 120


def test_prepare_and_dataset(tmp_path, rng):
    amass = tmp_path / "amass" / "SubA"
    os.makedirs(amass)
    for i in range(2):
        np.savez(amass / f"m{i}.npz", poses=rng.normal(size=(100, 156)).astype(np.float32))
    counts = prepare_vposer_datasets(
        str(tmp_path / "amass"), str(tmp_path / "prepared"),
        splits={"train": ["SubA"], "vald": ["SubA"], "test": []},
    )
    assert counts["train"] > 0
    ds = VPoserDS(str(tmp_path / "prepared" / "train"))
    assert ds[0]["pose_aa"].shape == (63,)
    batches = list(ds.batches(4, np.random.default_rng(0)))
    assert batches[0].shape == (4, 63)


def test_vposer_trainer_descends(tmp_path):
    make_synthetic_amass(str(tmp_path / "data"), n_train=64, n_val=32)
    bm = synthetic_smplx(num_verts=80, num_joints=22, seed=0)
    cfg = VPoserTrainConfig(
        num_neurons=64, batch_size=16, num_epochs=3, base_lr=1e-3, num_joints=21
    )
    tr = VPoserTrainer(str(tmp_path / "work"), cfg, str(tmp_path / "data"), bm)
    e0 = tr.evaluate()
    best = tr.perform_training()
    assert np.isfinite(best)
    assert best < e0["loss_total"]  # training reduced the val loss
    assert tr.best_model_fname is not None and os.path.exists(tr.best_model_fname)
    # snapshot naming convention
    assert "TR00_E" in os.path.basename(tr.best_model_fname)
    # reload round-trip
    tr.load_best()


def test_early_stopping():
    es = EarlyStopping(patience=2)
    assert not es(1.0)
    assert not es(0.5)
    assert not es(0.6)
    assert es(0.7)  # two non-improvements -> stop


def test_vposer_trainer_dp_mesh_equivalence(tmp_path):
    """One epoch on an 8-device DP mesh == one epoch single-device (same
    seeds, same data): params replicated + batch sharded must reproduce
    the unsharded parameter trajectory within float tolerance."""
    import jax
    import jax.numpy as jnp

    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")

    from psi_tpu.parallel.mesh import make_mesh

    make_synthetic_amass(str(tmp_path / "data"), n_train=64, n_val=32)
    bm = synthetic_smplx(num_verts=80, num_joints=22, seed=0)
    cfg = VPoserTrainConfig(num_neurons=64, batch_size=16, num_epochs=1, num_joints=21)

    tr_single = VPoserTrainer(str(tmp_path / "w1"), cfg, str(tmp_path / "data"), bm)
    tr_mesh = VPoserTrainer(
        str(tmp_path / "w2"), cfg, str(tmp_path / "data"), bm, mesh=make_mesh(8)
    )
    l1 = tr_single.train_epoch()
    l2 = tr_mesh.train_epoch()
    assert abs(l1["loss_total"] - l2["loss_total"]) < 1e-3 * max(1.0, abs(l1["loss_total"]))
    flat1 = jax.tree_util.tree_leaves(tr_single.variables["params"])
    flat2 = jax.tree_util.tree_leaves(tr_mesh.variables["params"])
    for a, b in zip(flat1, flat2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=5e-5, rtol=5e-4)
