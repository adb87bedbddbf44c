"""Full data-production integration: synthetic scene + body fits ->
virtual-camera snapshots -> HDF5 -> training batch generator."""

import numpy as np
import pytest

from psi_tpu.body.smplx_model import synthetic_smplx
from psi_tpu.body.vposer import synthetic_vposer_params
from psi_tpu.data.snapshots import SnapshotHDF5Writer, produce_virtualcam_snapshots


def test_virtualcam_production_to_training(tmp_path, rng):
    pytest.importorskip("h5py")
    smplx = synthetic_smplx(num_verts=80, num_joints=55, seed=0)
    vp = synthetic_vposer_params(0)

    # a room: dense floor plane + a couple of box clusters
    g = np.stack(np.meshgrid(np.linspace(-4, 4, 50), np.linspace(-4, 4, 50), [0.0]), -1).reshape(-1, 3)
    clutter = rng.uniform([-2, -2, 0], [2, 2, 2.5], size=(600, 3))
    scene_verts = np.concatenate([g, clutter]).astype(np.float32)
    scene_verts[:, 2] += 0.0
    scene_labels = np.concatenate([np.full(len(g), 2), np.full(len(clutter), 5)]).astype(np.int32)

    bodies = []
    for _ in range(2):
        bodies.append({
            "transl": np.array([[0.0, 0.0, 1.0]], np.float32) + rng.normal(0, 0.3, (1, 3)).astype(np.float32),
            "global_orient": (rng.normal(size=(1, 3)) * 0.3).astype(np.float32),
            "betas": np.zeros((1, 10), np.float32),
            "body_pose": (rng.normal(size=(1, 32)) * 0.3).astype(np.float32),
            "left_hand_pose": np.zeros((1, 12), np.float32),
            "right_hand_pose": np.zeros((1, 12), np.float32),
        })

    path = str(tmp_path / "vircams.hdf5")
    writer = SnapshotHDF5Writer(path)
    n = produce_virtualcam_snapshots(
        scene_verts, scene_labels, bodies, smplx, vp, writer, sceneid=0,
        max_cams_per_frame=4, seed=0,
    )
    writer.close()
    assert n > 0, "no snapshots produced"

    from psi_tpu.data import BatchGeneratorWithSceneMesh, synthetic_scene_registry
    from psi_tpu.data.hdf5 import PROX_SCENES

    reg = synthetic_scene_registry(num_scenes=12, dim=8, num_verts=50)
    reg.names = list(PROX_SCENES)
    gen = BatchGeneratorWithSceneMesh(path, mode="all", registry=reg)
    assert gen.n_samples == n
    bs = min(2, n)
    batch = gen.next_batch(bs)
    assert batch is not None
    assert batch["xs"].shape == (bs, 128, 128, 2)
    # depth canvas is normalized to [-1, 1]
    assert batch["xs"].min() >= -1.001 and batch["xs"].max() <= 1.001
    # bodies are in the camera frame with positive depth
    assert np.all(batch["xh"][:, 2] > 0)
