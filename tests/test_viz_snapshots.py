"""Software renderer, viz tools, and snapshot-production tests."""

import os

import numpy as np
import jax.numpy as jnp
import pytest

from psi_tpu.viz.render import project_points, render_depth_semantics, upsample_mesh
from psi_tpu.viz.sphere import icosphere, points_to_spheres
from psi_tpu.viz.colors import mpcat40_color
from psi_tpu.data.labelmap import ADE20K_TO_MPCAT40, look_up_ade2mp3d
from psi_tpu.data.snapshots import (
    SnapshotHDF5Writer,
    get_new_cams,
    is_body_occluded,
    look_at_body,
    render_scene_snapshot,
    room_box_planes,
    update_globalRT_for_smplx,
)


def _cam_int(f=500.0, px=320.0, py=240.0):
    return np.array([[f, 0, px], [0, f, py], [0, 0, 1]], np.float32)


def test_project_points_center():
    cam = _cam_int()
    pts = jnp.asarray(np.array([[0, 0, 2.0], [0.4, 0, 2.0]], np.float32))
    uv, z = project_points(pts, jnp.asarray(cam))
    np.testing.assert_allclose(np.asarray(uv[0]), [320, 240], atol=1e-4)
    np.testing.assert_allclose(np.asarray(uv[1]), [320 + 0.4 * 500 / 2, 240], atol=1e-4)
    np.testing.assert_allclose(np.asarray(z), [2.0, 2.0])


def test_render_depth_semantics_zbuffer():
    cam = _cam_int(f=100, px=32, py=32)
    # two points on the same pixel ray, different depth/label: nearer wins
    pts = jnp.asarray(np.array([[0, 0, 2.0], [0, 0, 1.0]], np.float32))
    labels = jnp.asarray(np.array([5, 9], np.int32))
    depth, seg = render_depth_semantics(pts, labels, jnp.asarray(cam), 64, 64, splat_radius=0)
    assert abs(float(depth[32, 32]) - 1.0) < 2e-3
    assert int(seg[32, 32]) == 9
    # empty pixels are zero
    assert float(depth[0, 0]) == 0.0


def test_upsample_mesh_counts():
    v = np.array([[0, 0, 0], [1, 0, 0], [0, 1, 0]], np.float64)
    f = np.array([[0, 1, 2]])
    v2, f2 = upsample_mesh(v, f, 2)
    assert f2.shape[0] == 16
    assert v2.shape[0] == 15  # 3 + 3 mids + 9 second-level


def test_icosphere():
    v, f = icosphere(radius=2.0, subdivisions=1)
    np.testing.assert_allclose(np.linalg.norm(v, axis=1), 2.0, atol=1e-9)
    v2, f2 = points_to_spheres(np.zeros((3, 3)), radius=0.1)
    assert len(v2) == 3 * len(v) // 1 or len(v2) > 0


def test_labelmap():
    assert ADE20K_TO_MPCAT40.shape == (150,)
    seg = np.array([[0, 5], [149, 200]])
    out = look_up_ade2mp3d(seg)
    assert out[0, 0] == 0 and out[0, 1] == 14
    assert out.shape == seg.shape
    assert mpcat40_color(out).shape == (2, 2, 3)


def test_room_planes_and_cams(rng):
    planes = room_box_planes(np.array([-3, -3, 0.0]), np.array([3, 3, 3.0]))
    body_T = np.array([0.0, 0.0, 1.0])
    cams = get_new_cams(planes, np.array([-3, -3, 0.0]), np.array([3, 3, 3.0]), body_T,
                        rng=np.random.default_rng(0))
    assert len(cams) > 0
    for c in cams[:5]:
        T = c[:3, 3]
        d = np.linalg.norm(T - body_T)
        assert 1.0 < d < 7.5  # distance filter (with jitter slack)
        # rotation is orthonormal and +z looks at the body
        R = c[:3, :3]
        np.testing.assert_allclose(R.T @ R, np.eye(3), atol=1e-6)
        z = R[:, 2]
        toward = (body_T - T) / np.linalg.norm(body_T - T)
        assert np.dot(z, toward) > 0.95


def test_look_at_degenerate():
    R = look_at_body(np.array([0.0, 0, 0]), np.array([0.0, 0, 2.0]))  # straight ahead
    assert np.all(np.isfinite(R))


def test_update_globalRT_identity(rng):
    from psi_tpu.body.smplx_model import synthetic_smplx
    from psi_tpu.body.vposer import synthetic_vposer_params

    smplx = synthetic_smplx(num_verts=60, num_joints=55, seed=0)
    vp = synthetic_vposer_params(0)
    params = {
        "transl": rng.normal(size=(1, 3)).astype(np.float32),
        "global_orient": (rng.normal(size=(1, 3)) * 0.3).astype(np.float32),
        "betas": np.zeros((1, 10), np.float32),
        "body_pose": np.zeros((1, 32), np.float32),
        "left_hand_pose": np.zeros((1, 12), np.float32),
        "right_hand_pose": np.zeros((1, 12), np.float32),
    }
    out, delta_T = update_globalRT_for_smplx(params, [np.eye(4)], smplx, vp)
    np.testing.assert_allclose(out[0]["transl"], params["transl"], atol=1e-4)
    np.testing.assert_allclose(out[0]["global_orient"], params["global_orient"], atol=1e-4)
    # a pure translation moves transl by exactly that amount
    tr = np.eye(4)
    tr[:3, 3] = [1.0, 2.0, 3.0]
    out2, _ = update_globalRT_for_smplx(params, [tr], smplx, vp, delta_T=delta_T)
    np.testing.assert_allclose(out2[0]["transl"], params["transl"] + [[1, 2, 3]], atol=1e-4)


def test_update_globalRT_rotation_consistency(rng):
    """Transforming params then decoding == decoding then transforming verts."""
    from psi_tpu.body.smplx_model import synthetic_smplx, smplx_forward
    from psi_tpu.body.vposer import synthetic_vposer_params, vposer_decode
    from psi_tpu.geometry.rot6d import aa_to_matrix

    smplx = synthetic_smplx(num_verts=60, num_joints=55, seed=1)
    vp = synthetic_vposer_params(1)
    params = {
        "transl": rng.normal(size=(1, 3)).astype(np.float32),
        "global_orient": (rng.normal(size=(1, 3)) * 0.5).astype(np.float32),
        "betas": np.zeros((1, 10), np.float32),
        "body_pose": (rng.normal(size=(1, 32)) * 0.3).astype(np.float32),
    }

    def decode(p):
        pose_aa = vposer_decode(vp, jnp.asarray(p["body_pose"]))
        v, _ = smplx_forward(
            smplx, transl=jnp.asarray(p["transl"]), global_orient=jnp.asarray(p["global_orient"]),
            betas=jnp.asarray(p["betas"]), body_pose=pose_aa,
        )
        return np.asarray(v[0])

    aa = (rng.normal(size=3) * 0.6).astype(np.float32)
    tr = np.eye(4)
    tr[:3, :3] = np.asarray(aa_to_matrix(jnp.asarray(aa[None])))[0]
    tr[:3, 3] = rng.normal(size=3)

    out, _ = update_globalRT_for_smplx(params, [tr], smplx, vp)
    v_param = decode(out[0])
    v_orig = decode(params)
    v_expected = v_orig @ tr[:3, :3].T + tr[:3, 3]
    np.testing.assert_allclose(v_param, v_expected, atol=1e-3)


def test_is_body_occluded():
    cam = _cam_int(f=100, px=32, py=32)
    depth_far = np.full((64, 64), 10.0, np.float32)
    depth_near = np.full((64, 64), 1.0, np.float32)
    T = np.array([[0.0, 0.0, 3.0]])
    assert not is_body_occluded(T, cam, depth_far)
    assert is_body_occluded(T, cam, depth_near)
    # out of frame
    assert is_body_occluded(np.array([[50.0, 0, 1.0]]), cam, depth_far)


def test_render_snapshot_and_hdf5_roundtrip(tmp_path, rng):
    pytest.importorskip("h5py")
    # a simple textured plane scene
    verts = np.stack(np.meshgrid(np.linspace(-2, 2, 60), np.linspace(-2, 2, 60), [4.0]), -1).reshape(-1, 3)
    labels = np.full(len(verts), 2, np.int32)
    cam2world = np.eye(4)
    cam_int = _cam_int()
    snap = render_scene_snapshot(verts, labels, cam2world, cam_int, height=120, width=160)
    assert snap["depth"].shape == (128, 128)
    assert 3.5 < snap["max_d"] <= 6.0  # the plane is at depth 4
    assert np.any(snap["depth_raw"] > 0)

    # pack + read back through the training generator
    path = str(tmp_path / "packed.hdf5")
    w = SnapshotHDF5Writer(path)
    for i in range(6):
        w.append(snap["depth"], snap["seg"], rng.normal(size=72).astype(np.float32),
                 snap["cam_ext"], snap["cam_int"], snap["max_d"], sceneid=0)
    w.close()

    from psi_tpu.data import BatchGeneratorWithSceneMesh, synthetic_scene_registry
    from psi_tpu.data.hdf5 import PROX_SCENES

    reg = synthetic_scene_registry(num_scenes=12, dim=8, num_verts=50)
    reg.names = list(PROX_SCENES)
    gen = BatchGeneratorWithSceneMesh(path, mode="all", registry=reg)
    assert gen.n_samples == 6
    batch = gen.next_batch(2)
    assert batch is not None and batch["xs"].shape == (2, 128, 128, 2)
