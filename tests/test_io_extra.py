"""Coverage for remaining IO branches: ascii PLY, PROX contact JSONs,
verbose fitting trace."""

import json
import os

import numpy as np
import pytest


def test_plyio_ascii(tmp_path):
    from psi_tpu.data.plyio import read_ply

    verts = [(0.0, 0.0, 0.0), (1.0, 0.0, 0.0), (0.0, 1.0, 0.0), (1.0, 1.0, 1.0)]
    txt = (
        "ply\nformat ascii 1.0\n"
        "element vertex 4\n"
        "property float x\nproperty float y\nproperty float z\n"
        "element face 2\n"
        "property list uchar int vertex_indices\nend_header\n"
        + "".join(f"{x} {y} {z}\n" for x, y, z in verts)
        + "3 0 1 2\n3 1 3 2\n"
    )
    p = tmp_path / "a.ply"
    p.write_text(txt)
    v, f = read_ply(str(p))
    np.testing.assert_allclose(v, np.asarray(verts), atol=1e-9)
    np.testing.assert_array_equal(f, [[0, 1, 2], [1, 3, 2]])


def test_get_contact_ids_prox_format(tmp_path):
    from psi_tpu.geometry.contact import get_contact_ids

    # PROX body_segments JSON format: {"verts_ind": [...], "faces_ind": [...]}
    for part, vids in [("L_Hand", [5, 3, 5, 9]), ("butt", [100, 2, 100])]:
        with open(tmp_path / f"{part}.json", "w") as f:
            json.dump({"verts_ind": vids, "faces_ind": [1, 2, 1]}, f)
    verts, faces = get_contact_ids(str(tmp_path), ["L_Hand", "butt"])
    np.testing.assert_array_equal(verts, [3, 5, 9, 2, 100])  # deduped per part
    assert faces.shape == (4,)


def test_fitting_verbose_trace(capsys, rng):
    from psi_tpu.data.synthetic import make_synthetic_assets
    from psi_tpu.fit import FittingOP
    from psi_tpu.utils.config import FitConfig

    a, _ = make_synthetic_assets(
        num_verts=80, num_joints=12, num_scenes=2, sdf_dim=8, scene_points=100, n_contact=16
    )
    op = FittingOP(a, FitConfig(num_iter=3), scene_idx=0, verbose=True)
    x72 = (rng.normal(size=(2, 72)) * 0.3).astype(np.float32)
    cam = np.tile(np.eye(4, dtype=np.float32), (2, 1, 1))
    op.fit_population(x72, cam)
    out = capsys.readouterr().out
    assert "[fitting]" in out and "iter=" in out
