"""Data layer tests: preprocessing parity with the reference recipe,
scene registry padding exactness, HDF5 reader round-trip, PLY IO."""

import json
import os

import numpy as np
import jax.numpy as jnp
import pytest

from psi_tpu.data import (
    BatchGeneratorWithSceneMesh,
    PROX_SCENES,
    PROX_TEST_SCENES,
    PROX_TRAIN_SCENES,
    data_preprocessing,
    synthetic_scene_registry,
)
from psi_tpu.data.scenes import build_registry
from psi_tpu.data.plyio import read_ply
from psi_tpu.ops.sdf import sdf_trilinear, sdf_trilinear_stacked


def test_preprocessing_matches_reference_recipe(rng):
    """Pin against a torch transcription of batch_gen_hdf5.py:359-441."""
    torch = pytest.importorskip("torch")
    import torch.nn.functional as tF

    for shape in [(240, 320), (320, 240), (128, 128)]:
        img = rng.uniform(0, 8, size=shape).astype(np.float32)
        canvas, factor, max_val = data_preprocessing(img, "depth")

        t = torch.tensor(img)
        t[t > 6.0] = 6.0
        mv = torch.max(t)
        ts = 2 * t / mv - 1.0
        h, w = shape
        ref_canvas = torch.zeros(1, 1, 128, 128)
        if h >= w:
            f = 128.0 / h
            twid = int(w * f) // 2 * 2
            r = tF.interpolate(ts.view(1, 1, h, w), size=[128, twid], mode="bilinear", align_corners=False)
            lo = 64 - twid // 2
            ref_canvas[:, :, :, lo : lo + twid] = r
        else:
            f = 128.0 / w
            tht = int(h * f) // 2 * 2
            r = tF.interpolate(ts.view(1, 1, h, w), size=[tht, 128], mode="bilinear", align_corners=False)
            lo = 64 - tht // 2
            ref_canvas[:, :, lo : lo + tht, :] = r
        np.testing.assert_allclose(canvas, ref_canvas.view(128, 128).numpy(), atol=1e-5)
        assert abs(max_val - float(mv)) < 1e-6


def test_seg_clamp():
    img = np.array([[50.0, 10.0], [41.0, 80.0]], np.float32)
    canvas, _, max_val = data_preprocessing(img, "seg", target_domain_size=[4, 4])
    assert max_val == 41.0


def test_registry_padding_is_exact(rng):
    """A grid padded to a larger dim + adjusted max samples identically."""
    reg = synthetic_scene_registry(num_scenes=3, dim=16, num_verts=100, seed=1, varied_dims=True)
    # scene 1 has dim 20 before stacking to 24... rebuild by hand:
    dims = [16, 20, 24]
    rngx = np.random.default_rng(3)
    sdfs = [rngx.normal(size=(d, d, d)).astype(np.float32) for d in dims]
    mins = [np.array([-2.0, -2.0, 0.0], np.float32)] * 3
    maxs = [np.array([2.0, 2.0, 4.0], np.float32)] * 3
    verts = [rngx.normal(size=(50, 3)).astype(np.float32)] * 3
    reg = build_registry(["a", "b", "c"], verts, sdfs, mins, maxs)

    pts = rngx.uniform(-2.5, 4.5, size=(1, 64, 3)).astype(np.float32)
    for i, d in enumerate(dims):
        direct = sdf_trilinear(
            jnp.asarray(sdfs[i][None]), jnp.asarray(pts),
            jnp.asarray(mins[i][None]), jnp.asarray(maxs[i][None]),
        )
        stacked = sdf_trilinear_stacked(
            jnp.asarray(reg.sdf_stack), jnp.asarray(np.array([i], np.int32)),
            jnp.asarray(pts), jnp.asarray(reg.grid_mins), jnp.asarray(reg.grid_maxs),
        )
        np.testing.assert_allclose(np.asarray(stacked), np.asarray(direct), atol=1e-5)


def test_prox_scene_split_constants():
    assert len(PROX_SCENES) == 12
    assert set(PROX_TRAIN_SCENES) | set(PROX_TEST_SCENES) == set(PROX_SCENES)
    assert not set(PROX_TRAIN_SCENES) & set(PROX_TEST_SCENES)


def _write_synthetic_hdf5(path, n, scene_ids, rng):
    import h5py

    with h5py.File(path, "w") as f:
        # row 0 is a placeholder, matching the packer convention
        f["depth"] = rng.uniform(-1, 1, size=(n + 1, 1, 128, 128)).astype(np.float32)
        f["seg"] = rng.uniform(-1, 1, size=(n + 1, 1, 128, 128)).astype(np.float32)
        body = rng.normal(size=(n + 1, 1, 72)).astype(np.float32)
        body[:, :, 2] = 3.0
        f["body"] = body
        f["cam_ext"] = np.tile(np.eye(4, dtype=np.float32), (n + 1, 1, 1, 1))
        f["cam_int"] = np.tile(np.eye(3, dtype=np.float32), (n + 1, 1, 1, 1))
        f["max_d"] = np.full((n + 1, 1), 6.0, np.float32)
        f["sceneid"] = np.concatenate([[0], scene_ids]).astype(np.float64).reshape(-1, 1)


def test_hdf5_generator(tmp_path, rng):
    pytest.importorskip("h5py")
    n = 20
    # scenes: alternate between train scene 0 (Basement...) and test scene 4 (MPH16)
    scene_ids = np.array([0, 4] * (n // 2))
    path = str(tmp_path / "synthetic.hdf5")
    _write_synthetic_hdf5(path, n, scene_ids, rng)

    registry = synthetic_scene_registry(num_scenes=12, dim=8, num_verts=50)
    registry.names = list(PROX_SCENES)  # name registry rows after PROX scenes
    gen = BatchGeneratorWithSceneMesh(path, mode="train", registry=registry)
    assert gen.n_samples == 10  # only train-scene rows
    batch = gen.next_batch(4)
    assert batch["xs"].shape == (4, 128, 128, 2)
    assert batch["xh"].shape == (4, 72)
    assert batch["cam_ext"].shape == (4, 4, 4)
    assert np.all(batch["scene_idx"] == 0)
    # iterate to exhaustion
    count = 1
    while gen.has_next_batch():
        b = gen.next_batch(4)
        if b is not None:
            count += 1
    assert count == 2  # 10 samples -> 2 full batches of 4
    gen.reset()
    assert gen.has_next_batch()

    # multi-file concat
    gen2 = BatchGeneratorWithSceneMesh([path, path], mode="all", registry=registry)
    assert gen2.n_samples == 40


def test_plyio_roundtrip(tmp_path, rng):
    verts = rng.normal(size=(10, 3)).astype(np.float32)
    faces = np.array([[0, 1, 2], [3, 4, 5]], np.int32)
    # write a binary_little_endian ply by hand
    p = tmp_path / "m.ply"
    header = (
        "ply\nformat binary_little_endian 1.0\n"
        f"element vertex {len(verts)}\n"
        "property float x\nproperty float y\nproperty float z\n"
        f"element face {len(faces)}\n"
        "property list uchar int vertex_indices\nend_header\n"
    ).encode()
    body = verts.astype("<f4").tobytes()
    fb = b""
    for f in faces:
        fb += np.uint8(3).tobytes() + f.astype("<i4").tobytes()
    p.write_bytes(header + body + fb)
    v, fc = read_ply(str(p))
    np.testing.assert_allclose(v, verts, atol=1e-6)
    np.testing.assert_array_equal(fc, faces)
