"""show_generated_results end-to-end: pickles -> decoded bodies -> PNGs;
plus mixed-scene population fitting."""

import os
import pickle

import numpy as np
import jax.numpy as jnp
import pytest

from psi_tpu.data.synthetic import make_synthetic_assets


@pytest.fixture(scope="module")
def assets():
    return make_synthetic_assets(
        num_verts=120, num_joints=12, num_scenes=3, sdf_dim=16, scene_points=400, n_contact=48
    )


def test_show_generated_results(assets, tmp_path, rng):
    a, reg = assets
    res_dir = tmp_path / "results"
    os.makedirs(res_dir)
    for i in range(3):
        rec = {
            "transl": np.array([[0.0, 0.0, 3.0]], np.float32) + rng.normal(0, 0.2, (1, 3)).astype(np.float32),
            "global_orient": (rng.normal(size=(1, 3)) * 0.3).astype(np.float32),
            "betas": np.zeros((1, 10), np.float32),
            "body_pose": (rng.normal(size=(1, 32)) * 0.2).astype(np.float32),
            "left_hand_pose": np.zeros((1, 12), np.float32),
            "right_hand_pose": np.zeros((1, 12), np.float32),
            "cam_ext": np.eye(4, dtype=np.float32)[None],
            "cam_int": np.eye(3, dtype=np.float32)[None],
        }
        with open(res_dir / f"body_gen_{i:06d}.pkl", "wb") as f:
            pickle.dump(rec, f)

    from psi_tpu.viz.show_results import show_generated_results

    scene_pts = reg.verts_stack[0, : reg.n_verts[0]]
    labels = np.full(len(scene_pts), 3, np.int32)
    cam_int = np.array([[300, 0, 160], [0, 300, 120], [0, 0, 1]], np.float32)
    view = np.eye(4, dtype=np.float32)
    view[2, 3] = 8.0
    outs = show_generated_results(
        a, str(res_dir), scene_pts, labels, cam_int, str(tmp_path / "imgs"),
        image_hw=(240, 320), view_cam_ext=view,
    )
    assert len(outs) == 4  # 3 bodies + combined
    for o in outs:
        assert os.path.exists(o)
    from PIL import Image

    img = np.asarray(Image.open(outs[-1]))
    assert img.shape == (240, 320, 3)
    assert (img < 250).any()  # something rendered


def test_mixed_scene_fitting(assets, rng):
    """A single fit program over bodies assigned to DIFFERENT scenes."""
    a, reg = assets
    from psi_tpu.fit import fit_bodies
    from psi_tpu.utils.config import FitConfig

    N = 6
    x72 = (rng.normal(size=(N, 72)) * 0.3).astype(np.float32)
    x72[:, 2] += 3.0
    cam_ext = np.tile(np.eye(4, dtype=np.float32), (N, 1, 1))
    scene_idx = np.array([0, 1, 2, 0, 1, 2], np.int32)
    x_fit, metrics, _ = fit_bodies(
        a, jnp.asarray(x72), jnp.asarray(cam_ext), jnp.asarray(scene_idx), FitConfig(num_iter=4)
    )
    assert np.all(np.isfinite(np.asarray(x_fit)))
    assert metrics["total"].shape == (N,)
