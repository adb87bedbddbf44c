"""Triangle rasterizer tests: exact plane depth, watertight coverage,
z-buffer ordering, winding independence."""

import numpy as np
import jax.numpy as jnp

from psi_tpu.viz.render import rasterize_mesh


def _cam(f=100.0, px=32.0, py=32.0):
    return jnp.asarray([[f, 0, px], [0, f, py], [0, 0, 1]], jnp.float32)


def test_fullscreen_quad_exact_depth():
    # a quad at z=2 covering the whole view
    z = 2.0
    s = 2.0  # half-extent large enough to cover 64x64 at f=100
    verts = np.array([[-s, -s, z], [s, -s, z], [s, s, z], [-s, s, z]], np.float32)
    faces = np.array([[0, 1, 2], [0, 2, 3]], np.int32)
    labels = np.array([7, 7, 7, 7], np.int32)
    depth, seg = rasterize_mesh(jnp.asarray(verts), jnp.asarray(faces), jnp.asarray(labels), _cam(), 64, 64)
    d = np.asarray(depth)
    # watertight: every pixel covered, exact depth (to mm quantization)
    assert (d > 0).all()
    np.testing.assert_allclose(d, z, atol=2e-3)
    assert (np.asarray(seg) == 7).all()


def test_zbuffer_ordering_and_labels():
    # near triangle (z=1, label 3) in front of far quad (z=4, label 9)
    s = 3.0
    verts = np.array(
        [[-s, -s, 4], [s, -s, 4], [s, s, 4], [-s, s, 4],
         [-0.2, -0.2, 1], [0.2, -0.2, 1], [0.0, 0.25, 1]], np.float32)
    faces = np.array([[0, 1, 2], [0, 2, 3], [4, 5, 6]], np.int32)
    labels = np.array([9, 9, 9, 9, 3, 3, 3], np.int32)
    depth, seg = rasterize_mesh(jnp.asarray(verts), jnp.asarray(faces), jnp.asarray(labels), _cam(), 64, 64)
    d, l = np.asarray(depth), np.asarray(seg)
    cy, cx = 32, 32  # center: inside the near triangle
    assert abs(d[cy, cx] - 1.0) < 2e-3
    assert l[cy, cx] == 3
    assert abs(d[2, 2] - 4.0) < 4e-3  # corner: far quad
    assert l[2, 2] == 9


def test_winding_independence():
    z = 2.0
    verts = np.array([[-1, -1, z], [1, -1, z], [0, 1, z]], np.float32)
    ccw = np.array([[0, 1, 2]], np.int32)
    cw = np.array([[0, 2, 1]], np.int32)
    labels = np.array([5, 5, 5], np.int32)
    d1, _ = rasterize_mesh(jnp.asarray(verts), jnp.asarray(ccw), jnp.asarray(labels), _cam(), 64, 64)
    d2, _ = rasterize_mesh(jnp.asarray(verts), jnp.asarray(cw), jnp.asarray(labels), _cam(), 64, 64)
    np.testing.assert_array_equal(np.asarray(d1 > 0), np.asarray(d2 > 0))


def test_behind_camera_culled():
    verts = np.array([[-1, -1, -2], [1, -1, -2], [0, 1, -2]], np.float32)
    faces = np.array([[0, 1, 2]], np.int32)
    labels = np.array([5, 5, 5], np.int32)
    depth, _ = rasterize_mesh(jnp.asarray(verts), jnp.asarray(faces), jnp.asarray(labels), _cam(), 32, 32)
    assert float(jnp.max(depth)) == 0.0


def test_snapshot_with_faces_is_hole_free(rng):
    from psi_tpu.data.snapshots import render_scene_snapshot

    # coarse quad mesh of a plane at z=4: splatting would leave holes at
    # this vertex density; rasterization must not
    n = 6
    xs = np.linspace(-3, 3, n)
    verts = np.stack(np.meshgrid(xs, xs, [4.0]), -1).reshape(-1, 3)
    faces = []
    for i in range(n - 1):
        for j in range(n - 1):
            a = i * n + j
            faces.append([a, a + 1, a + n])
            faces.append([a + 1, a + n + 1, a + n])
    faces = np.asarray(faces, np.int32)
    labels = np.full(len(verts), 2, np.int32)
    cam_int = np.array([[100, 0, 60], [0, 100, 40], [0, 0, 1]], np.float32)
    snap = render_scene_snapshot(verts, labels, np.eye(4), cam_int, height=80, width=120,
                                 scene_faces=faces)
    d = snap["depth_raw"]
    assert (d > 0).all()
    np.testing.assert_allclose(d, 4.0, atol=5e-3)
