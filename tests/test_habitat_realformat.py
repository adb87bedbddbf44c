"""Habitat real-format sensor-dump fixtures (VERDICT item 9).

Builds cam_/depth_/seg_*.npy fixtures matching the reference's on-disk
format EXACTLY — cam_*.npy is a pickled dict read via
``np.load(f, allow_pickle=True, encoding='latin1').item()`` with
``cam_ext`` [4,4] / ``cam_int`` [3,3] keys (test_habitat_s1.py:173-180),
depth/seg are raw [H,W] sensor maps — and drives the generation CLI and
the habitat fitting driver through them. Also pins HABITAT_T_MAT
(fitting_habitat.py:177-184) against a hand-computed case.
"""

import glob
import os
import pickle

import numpy as np
import pytest

ROOM = "17DRP5sb8fy-bedroom"  # member of cli.fitting.MP3D_ROOMS
H, W = 240, 320  # habitat sensor resolution (landscape: exercises the w>h canvas branch)


def _write_fixture_room(room_dir, n_cams=2, seed=0):
    rng = np.random.RandomState(seed)
    os.makedirs(room_dir, exist_ok=True)
    for i in range(n_cams):
        depth = rng.uniform(0.5, 8.0, size=(H, W)).astype(np.float32)  # metric, >6 present
        seg = rng.randint(0, 42, size=(H, W)).astype(np.int32)  # mpcat40 labels
        # habitat camera: y-up/-z-forward world->cam rigid transform
        theta = rng.uniform(0, 2 * np.pi)
        c, s = np.cos(theta), np.sin(theta)
        cam_ext = np.eye(4, dtype=np.float32)
        cam_ext[:3, :3] = np.array([[c, 0, s], [0, 1, 0], [-s, 0, c]], np.float32)
        cam_ext[:3, 3] = rng.uniform(-2, 2, size=3).astype(np.float32)
        f = max(H, W) / 2.0
        cam_int = np.array([[f, 0, W / 2.0], [0, f, H / 2.0], [0, 0, 1.0]], np.float32)
        np.save(os.path.join(room_dir, f"depth_{i}.npy"), depth)
        np.save(os.path.join(room_dir, f"seg_{i}.npy"), seg)
        np.save(
            os.path.join(room_dir, f"cam_{i}.npy"),
            {"cam_ext": cam_ext, "cam_int": cam_int},
        )


def test_cam_npy_reference_read_idiom(tmp_path):
    """The fixture must load with the reference's exact np.load idiom."""
    room = tmp_path / ROOM
    _write_fixture_room(str(room), n_cams=1)
    cam_params = np.load(str(room / "cam_0.npy"), allow_pickle=True, encoding="latin1").item()
    assert isinstance(cam_params, dict)
    assert cam_params["cam_ext"].shape == (4, 4)
    assert cam_params["cam_int"].shape == (3, 3)
    assert cam_params["cam_ext"].dtype == np.float32


def test_load_habitat_snapshot_realformat(tmp_path):
    from psi_tpu.data.matfile import load_habitat_snapshot
    from psi_tpu.data.preprocessing import data_preprocessing

    room = tmp_path / ROOM
    _write_fixture_room(str(room), n_cams=2, seed=3)
    batch = load_habitat_snapshot(str(room), 1)

    assert batch["xs"].shape == (1, 128, 128, 2)
    assert batch["cam_ext"].shape == (1, 4, 4)
    assert batch["cam_int"].shape == (1, 3, 3)
    # intrinsics must come from the dict, not be re-synthesized
    cam_params = np.load(str(room / "cam_1.npy"), allow_pickle=True).item()
    np.testing.assert_allclose(batch["cam_int"][0], cam_params["cam_int"], rtol=0, atol=0)
    np.testing.assert_allclose(batch["cam_ext"][0], cam_params["cam_ext"], rtol=0, atol=0)

    # depth clamp at 6.0 -> max_d == 6.0 since the fixture exceeds it
    assert float(batch["max_d"][0]) == pytest.approx(6.0)

    # reference quirk: seg preprocessed with modality='depth'
    # (test_habitat_s1.py:181-184) — labels >6 clamp at 6 before rescale
    seg_raw = np.load(str(room / "seg_1.npy")).astype(np.float32)
    expect_seg, _, _ = data_preprocessing(seg_raw, "depth")
    np.testing.assert_allclose(batch["xs"][0, :, :, 1], expect_seg, atol=1e-6)
    wrong_seg, _, _ = data_preprocessing(seg_raw, "seg")
    assert not np.allclose(batch["xs"][0, :, :, 1], wrong_seg)


def test_habitat_t_mat_hand_computed():
    """T_mat composition (fitting_habitat.py:177-184): trans = cam_ext @ T_mat,
    so a habitat-frame point (x, y, z) enters the camera frame as (x, -y, -z)
    before cam_ext applies."""
    from psi_tpu.data.matfile import HABITAT_T_MAT

    # identity extrinsics: habitat's y-up/-z-forward -> camera's y-down/+z-forward
    p_habitat = np.array([0.5, 0.2, -2.0, 1.0], np.float32)
    p_cam = HABITAT_T_MAT @ p_habitat
    np.testing.assert_allclose(p_cam, [0.5, -0.2, 2.0, 1.0], atol=0)

    # with a nontrivial cam_ext the right-composition must equal flipping
    # the point first: (E @ T) p == E (T p)
    rng = np.random.RandomState(0)
    E = np.eye(4, dtype=np.float32)
    E[:3, :3] = np.linalg.qr(rng.randn(3, 3))[0].astype(np.float32)
    E[:3, 3] = rng.randn(3).astype(np.float32)
    trans = E @ HABITAT_T_MAT
    np.testing.assert_allclose(trans @ p_habitat, E @ (HABITAT_T_MAT @ p_habitat), atol=1e-6)


def test_fittingop_cam_post_equivalence():
    """FittingOP(cam_post=T) on cam_ext E == FittingOP(cam_post=None) on E @ T."""
    from psi_tpu.data.matfile import HABITAT_T_MAT
    from psi_tpu.data.synthetic import make_synthetic_assets
    from psi_tpu.fit import FittingOP
    from psi_tpu.utils.config import FitConfig

    assets, _ = make_synthetic_assets(num_scenes=1, seed=0)
    cfg = FitConfig(num_iter=2, contact_denom_offset=1.0)
    rng = np.random.RandomState(1)
    x72 = rng.randn(4, 72).astype(np.float32) * 0.1
    x72[:, 2] += 2.0
    cam_ext = np.tile(np.eye(4, dtype=np.float32)[None], (4, 1, 1))
    cam_ext[:, :3, 3] = rng.randn(4, 3).astype(np.float32) * 0.1

    op_post = FittingOP(assets, cfg, scene_idx=0, cam_post=HABITAT_T_MAT)
    op_plain = FittingOP(assets, cfg, scene_idx=0)
    out_post, _ = op_post.fit_population(x72, cam_ext)
    out_plain, _ = op_plain.fit_population(x72, cam_ext @ HABITAT_T_MAT)
    np.testing.assert_allclose(out_post, out_plain, atol=0)


def test_habitat_pipeline_on_realformat_fixture(tmp_path):
    """End-to-end: real-format dumps -> generation CLI -> habitat fitting CLI."""
    from psi_tpu.cli import fitting as cli_fit
    from psi_tpu.cli import test_habitat as cli_hab

    dump_root = tmp_path / "mp3d-rooms"
    _write_fixture_room(str(dump_root / ROOM), n_cams=2, seed=5)

    gen_dir = str(tmp_path / "results_habitat")
    cli_hab.main([
        "--dump_root", str(dump_root), "--output_dir", gen_dir,
        "--n_samples", "3", "--latentD", "32",
    ])
    pkls = sorted(glob.glob(os.path.join(gen_dir, ROOM, "body_gen_*.pkl")))
    assert len(pkls) == 6  # 2 cams x 3 samples, contiguous numbering
    assert os.path.basename(pkls[0]) == "body_gen_000000.pkl"
    assert os.path.basename(pkls[-1]) == "body_gen_000005.pkl"
    with open(pkls[0], "rb") as f:
        rec = pickle.load(f)
    # pkl carries the dump's cam params (the fitting stage composes T_mat)
    cam_params = np.load(str(dump_root / ROOM / "cam_0.npy"), allow_pickle=True).item()
    np.testing.assert_allclose(np.asarray(rec["cam_ext"]).reshape(4, 4), cam_params["cam_ext"])

    fit_dir = str(tmp_path / "fitted_habitat")
    cli_fit.main([gen_dir, fit_dir, "--dataset", "habitat", "--num_iter", "2", "--synthetic"])
    fitted = sorted(glob.glob(os.path.join(fit_dir, ROOM, "body_gen_*.pkl")))
    assert len(fitted) == 6
    with open(fitted[0], "rb") as f:
        frec = pickle.load(f)
    assert np.asarray(frec["transl"]).shape == (1, 3)
    assert np.isfinite(np.asarray(frec["transl"])).all()
