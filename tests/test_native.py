"""Native C++ runtime tests: build, chamfer parity, pack/loader round-trip."""

import numpy as np
import pytest

from psi_tpu.data import native_loader as nl

pytestmark = pytest.mark.skipif(not nl.native_available(), reason="no C++ toolchain")


def test_chamfer_nn_cpu_matches_numpy(rng):
    x = rng.normal(size=(200, 3)).astype(np.float32)
    y = rng.normal(size=(333, 3)).astype(np.float32)
    dist, idx = nl.chamfer_nn_cpu(x, y)
    d = ((x[:, None, :] - y[None, :, :]) ** 2).sum(-1)
    np.testing.assert_allclose(dist, d.min(1), atol=1e-5)
    np.testing.assert_array_equal(idx, d.argmin(1))


def _make_pack(tmp_path, rng, n=20):
    depth = rng.normal(size=(n, 128 * 128)).astype(np.float32)
    seg = rng.normal(size=(n, 128 * 128)).astype(np.float32)
    body = rng.normal(size=(n, 72)).astype(np.float32)
    cam_ext = np.tile(np.eye(4, dtype=np.float32).reshape(1, 16), (n, 1))
    cam_int = np.tile(np.eye(3, dtype=np.float32).reshape(1, 9), (n, 1))
    max_d = np.full(n, 6.0, np.float32)
    sceneid = (np.arange(n) % 3).astype(np.int32)
    path = str(tmp_path / "data.psipack")
    nl.pack_dataset(path, depth, seg, body, cam_ext, cam_int, max_d, sceneid)
    return path, body, sceneid


def test_pack_loader_roundtrip(tmp_path, rng):
    path, body, sceneid = _make_pack(tmp_path, rng, n=20)
    gen = nl.NativeBatchGenerator(path, batch_size=4, seed=0)
    assert gen.n_samples == 20

    seen_bodies = []
    count = 0
    while gen.has_next_batch():
        b = gen.next_batch()
        if b is None:
            break
        assert b["xs"].shape == (4, 128, 128, 2)
        assert b["xh"].shape == (4, 72)
        assert b["cam_ext"].shape == (4, 4, 4)
        assert set(np.unique(b["scene_idx"])) <= {0, 1, 2}
        seen_bodies.append(b["xh"])
        count += 1
    assert count == 5  # 20 / 4
    # every sample delivered exactly once (shuffled)
    seen = np.concatenate(seen_bodies, axis=0)
    seen_sorted = seen[np.lexsort(seen.T)]
    orig_sorted = body[np.lexsort(body.T)]
    np.testing.assert_allclose(seen_sorted, orig_sorted, atol=0)

    # reset reshuffles and serves again
    gen.reset()
    assert gen.has_next_batch()
    b2 = gen.next_batch()
    assert b2 is not None


def test_hdf5_to_pack(tmp_path, rng):
    pytest.importorskip("h5py")
    import h5py

    n = 8
    p = str(tmp_path / "x.hdf5")
    with h5py.File(p, "w") as f:
        f["depth"] = rng.normal(size=(n + 1, 1, 128, 128)).astype(np.float32)
        f["seg"] = rng.normal(size=(n + 1, 1, 128, 128)).astype(np.float32)
        f["body"] = rng.normal(size=(n + 1, 72)).astype(np.float32)
        f["cam_ext"] = np.tile(np.eye(4, dtype=np.float32), (n + 1, 1, 1))
        f["cam_int"] = np.tile(np.eye(3, dtype=np.float32), (n + 1, 1, 1))
        f["max_d"] = np.full((n + 1, 1), 6.0, np.float32)
        f["sceneid"] = np.zeros((n + 1, 1))
    pack = nl.hdf5_to_pack(p, str(tmp_path / "x.psipack"))
    gen = nl.NativeBatchGenerator(pack, batch_size=2)
    assert gen.n_samples == n
    assert gen.next_batch() is not None
