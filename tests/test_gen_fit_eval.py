"""Generation, fitting, and evaluation tests on synthetic assets.

The key assertion: batched fitting actually *reduces* the scene losses
(collision/contact) it optimizes — the end-to-end semantics of
fitting_proxe.py — and pickle IO is reference-compatible.
"""

import os
import pickle

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from psi_tpu.data.synthetic import (
    SyntheticBatchGenerator,
    make_synthetic_assets,
    random_camera_batch,
)
from psi_tpu.fit import FittingOP, fit_bodies
from psi_tpu.gen import TestOP, generate_bodies
from psi_tpu.eval import diversity_metrics, collision_contact_scores
from psi_tpu.models import HumanCVAES1
from psi_tpu.utils.config import FitConfig


@pytest.fixture(scope="module")
def assets():
    a, reg = make_synthetic_assets(
        num_verts=128, num_joints=12, num_scenes=3, sdf_dim=16, scene_points=300, n_contact=32
    )
    return a, reg


@pytest.fixture(scope="module")
def gen_setup():
    mdl = HumanCVAES1(latentD=32)
    variables = mdl.init(jax.random.PRNGKey(0), jnp.zeros((1, 75)), jnp.zeros((1, 128, 128, 2)))
    return mdl, variables


def _test_batch(rng, n=1):
    gen = SyntheticBatchGenerator(num_scenes=3, batches_per_epoch=2, seed=7)
    b = gen.next_batch(n)
    return b


def test_generate_bodies(gen_setup, rng):
    mdl, variables = gen_setup
    b = _test_batch(rng)
    out = generate_bodies(
        mdl, variables, jnp.asarray(b["xs"][:1]), jnp.asarray(b["cam_int"][:1]),
        jnp.asarray(b["max_d"][:1]), 16, jax.random.PRNGKey(0),
    )
    assert out.shape == (16, 72)
    assert np.all(np.isfinite(np.asarray(out)))
    # samples differ from each other
    assert float(jnp.std(out[:, 0])) > 1e-8


def test_testop_pickle_roundtrip(gen_setup, rng, tmp_path):
    mdl, variables = gen_setup
    b = _test_batch(rng)
    batch = {
        "xs": b["xs"][:1],
        "cam_int": b["cam_int"][:1],
        "cam_ext": b["cam_ext"][:1],
        "max_d": b["max_d"][:1],
    }
    op = TestOP(mdl, variables, n_samples=5)
    n = op.test(batch, str(tmp_path), "SynthScene00")
    assert n == 5
    files = sorted(os.listdir(tmp_path / "SynthScene00"))
    assert files[0] == "body_gen_000900.pkl"  # reference numbering offset
    with open(tmp_path / "SynthScene00" / files[0], "rb") as f:
        rec = pickle.load(f)
    for k, shape in [("transl", (1, 3)), ("global_orient", (1, 3)), ("betas", (1, 10)),
                     ("body_pose", (1, 32)), ("left_hand_pose", (1, 12)), ("right_hand_pose", (1, 12))]:
        assert rec[k].shape == shape, k
    assert rec["cam_ext"].shape == (1, 4, 4)


def test_fitting_reduces_scene_losses(assets, rng):
    """Bodies shoved below the synthetic scene's floor: fitting must pull
    the collision loss down (the fitting_proxe semantics)."""
    a, reg = assets
    N = 8
    x72 = (rng.normal(size=(N, 72)) * 0.3).astype(np.float32)
    # translate bodies toward the scene floor so vertices penetrate
    floor_region = np.asarray(reg.grid_mins[0]) * 0.8
    x72[:, 0:3] = floor_region[None, :] + rng.normal(0, 0.1, (N, 3)).astype(np.float32)
    cam_ext = np.tile(np.eye(4, dtype=np.float32), (N, 1, 1))
    scene_idx = np.zeros(N, np.int32)

    from psi_tpu.fit.fitting import _per_body_losses
    from psi_tpu.geometry.bodyvec import convert_to_6D_rot

    cfg = FitConfig(num_iter=40, contact_denom_offset=1.0)
    xhr0 = convert_to_6D_rot(jnp.asarray(x72))
    _, (m0, _) = _per_body_losses(a, xhr0, xhr0, jnp.asarray(cam_ext), jnp.asarray(scene_idx), cfg)
    assert float(m0["collision"].sum()) > 0  # setup sanity: we start penetrating

    x_fit, metrics, hist = fit_bodies(a, jnp.asarray(x72), jnp.asarray(cam_ext), jnp.asarray(scene_idx), cfg)
    assert x_fit.shape == (N, 72)
    assert np.all(np.isfinite(np.asarray(x_fit)))
    # collision strictly reduced by the refinement
    assert float(metrics["collision"].sum()) < float(m0["collision"].sum())


def test_fitting_rec_anchor(assets, rng):
    """With only the reconstruction term, the optimum is the init."""
    a, _ = assets
    x72 = (rng.normal(size=(4, 72)) * 0.3).astype(np.float32)
    cam_ext = np.tile(np.eye(4, dtype=np.float32), (4, 1, 1))
    cfg = FitConfig(num_iter=40, weight_contact=0.0, weight_collision=0.0, weight_loss_vposer=0.0)
    x_fit, metrics, _ = fit_bodies(a, jnp.asarray(x72), jnp.asarray(cam_ext), jnp.zeros(4, jnp.int32), cfg)
    # rec term pulls back toward init; since we *start* at init, it stays close
    assert float(np.abs(np.asarray(x_fit) - x72).mean()) < 0.05


def test_fittingop_file_driver(assets, rng, tmp_path):
    a, _ = assets
    gen_dir = tmp_path / "gen" / "S"
    fit_dir = tmp_path / "fit" / "S"
    os.makedirs(gen_dir)
    # write reference-format pickles
    for i in range(3):
        rec = {
            "transl": rng.normal(size=(1, 3)).astype(np.float32),
            "global_orient": (rng.normal(size=(1, 3)) * 0.3).astype(np.float32),
            "betas": rng.normal(size=(1, 10)).astype(np.float32),
            "body_pose": rng.normal(size=(1, 32)).astype(np.float32),
            "left_hand_pose": rng.normal(size=(1, 12)).astype(np.float32),
            "right_hand_pose": rng.normal(size=(1, 12)).astype(np.float32),
            "cam_ext": np.eye(4, dtype=np.float32)[None],
            "cam_int": np.eye(3, dtype=np.float32)[None],
        }
        with open(gen_dir / f"body_gen_{i:06d}.pkl", "wb") as f:
            pickle.dump(rec, f)
    op = FittingOP(a, FitConfig(num_iter=5), scene_idx=0)
    n = op.fitting_files(str(gen_dir), str(fit_dir))
    assert n == 3
    assert len(os.listdir(fit_dir)) == 3
    # idempotent resume: second run fits nothing
    assert op.fitting_files(str(gen_dir), str(fit_dir)) == 0


def test_diversity_metrics(rng):
    # two well-separated blobs -> entropy near ln(2) with k=2
    a = rng.normal(size=(100, 5)) + 10
    b = rng.normal(size=(100, 5)) - 10
    x = np.concatenate([a, b]).astype(np.float32)
    entropy, mean_dist = diversity_metrics(x, k=2)
    assert abs(entropy - np.log(2)) < 0.05
    assert 0 < mean_dist < 5
    # degenerate data -> entropy ~ 0
    e2, _ = diversity_metrics(np.zeros((50, 5), np.float32) + rng.normal(0, 1e-4, (50, 5)).astype(np.float32), k=2)
    assert e2 < np.log(2)


def test_collision_contact_scores(assets, rng):
    a, _ = assets
    N = 6
    x72 = (rng.normal(size=(N, 72)) * 0.3).astype(np.float32)
    cam_ext = np.tile(np.eye(4, dtype=np.float32), (N, 1, 1))
    nc, ct = collision_contact_scores(a, x72, cam_ext, np.zeros(N, np.int32))
    assert 0.0 <= nc <= 1.0
    assert 0.0 <= ct <= 1.0


def test_fittingop_chunked_population(assets, rng):
    """Populations beyond max_population fit in padded chunks through one
    compiled program; results cover every body exactly once."""
    a, _ = assets
    op = FittingOP(a, FitConfig(num_iter=2), scene_idx=0, max_population=4)
    N = 10  # 3 chunks: 4 + 4 + 2(padded)
    x72 = (rng.normal(size=(N, 72)) * 0.3).astype(np.float32)
    x72[:, 2] += 3.0
    cam = np.tile(np.eye(4, dtype=np.float32), (N, 1, 1))
    x_fit, metrics = op.fit_population(x72, cam)
    assert x_fit.shape == (N, 72)
    assert metrics["total"].shape == (N,)
    assert np.all(np.isfinite(x_fit))
