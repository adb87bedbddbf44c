"""load_smplx_npz against a real-format SMPLX_NEUTRAL.npz (synthetic
values, authentic key layout incl. 400-wide shapedirs with expression
block, kintree with the uint32(-1) root, hand PCA + means), plus
native-loader -> TrainOP integration."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest


def _write_real_format_npz(path, rng, V=150, J=55):
    kintree = np.zeros((2, J), np.uint32)
    kintree[0, 0] = np.uint32(2**32 - 1)  # root parent = -1 as uint32
    parents = [0] * J
    for j in range(1, J):
        kintree[0, j] = rng.integers(0, j)
    kintree[1] = np.arange(J)
    np.savez(
        path,
        v_template=rng.normal(0, 0.3, (V, 3)).astype(np.float64),
        shapedirs=rng.normal(0, 0.01, (V, 3, 400)).astype(np.float64),
        posedirs=rng.normal(0, 1e-3, (V, 3, (J - 1) * 9)).astype(np.float64),
        J_regressor=np.abs(rng.normal(0, 1, (J, V))).astype(np.float64),
        kintree_table=kintree.astype(np.int64),
        weights=np.abs(rng.normal(0, 1, (V, J))).astype(np.float64),
        hands_componentsl=rng.normal(0, 0.1, (45, 45)).astype(np.float64),
        hands_componentsr=rng.normal(0, 0.1, (45, 45)).astype(np.float64),
        hands_meanl=rng.normal(0, 0.05, 45).astype(np.float64),
        hands_meanr=rng.normal(0, 0.05, 45).astype(np.float64),
        f=rng.integers(0, V, (200, 3)).astype(np.int64),
    )


def test_load_real_format_npz(tmp_path, rng):
    from psi_tpu.body.smplx_model import load_smplx_npz, smplx_forward

    p = str(tmp_path / "SMPLX_NEUTRAL.npz")
    _write_real_format_npz(p, rng)
    m = load_smplx_npz(p, num_betas=10, num_pca_comps=12)
    assert m.num_verts == 150
    assert m.num_joints == 55
    assert m.parents[0] == -1
    assert m.shapedirs.shape == (150, 3, 10)
    assert m.exprdirs is not None and m.exprdirs.shape == (150, 3, 10)
    assert m.hands_components_l.shape == (12, 45)
    # non-flat hand mean folded into pose_mean
    assert float(jnp.abs(m.pose_mean[-90:]).max()) > 0
    assert float(jnp.abs(m.pose_mean[:3]).max()) == 0

    B = 2
    verts, joints = smplx_forward(
        m, transl=jnp.zeros((B, 3)), global_orient=jnp.zeros((B, 3)),
        betas=jnp.zeros((B, 10)), body_pose=jnp.zeros((B, 63)),
        left_hand_pose=jnp.zeros((B, 12)), right_hand_pose=jnp.zeros((B, 12)),
        expression=jnp.asarray(np.random.default_rng(1).normal(size=(B, 10)).astype(np.float32)),
        jaw_pose=jnp.zeros((B, 3)),
    )
    assert verts.shape == (B, 150, 3)
    assert np.all(np.isfinite(np.asarray(verts)))
    # flat_hand_mean=True removes the mean
    m2 = load_smplx_npz(p, flat_hand_mean=True)
    assert float(jnp.abs(m2.pose_mean).max()) == 0


def test_native_loader_feeds_trainop(tmp_path, rng):
    from psi_tpu.data import native_loader as nl

    if not nl.native_available():
        pytest.skip("no C++ toolchain")
    import optax

    from psi_tpu.data.synthetic import make_synthetic_assets
    from psi_tpu.train.loop import build_model, init_state, make_train_step
    from psi_tpu.utils.config import LossConfig, TrainConfig

    n = 8
    pack = nl.pack_dataset(
        str(tmp_path / "d.psipack"),
        rng.uniform(-1, 1, (n, 128 * 128)).astype(np.float32),
        rng.uniform(-1, 1, (n, 128 * 128)).astype(np.float32),
        (rng.normal(size=(n, 72)) * 0.3 + np.eye(1, 72, 2) * 3).astype(np.float32),
        np.tile(np.eye(4, dtype=np.float32).reshape(1, 16), (n, 1)),
        np.tile(
            np.array([[500, 0, 320], [0, 500, 240], [0, 0, 1]], np.float32).reshape(1, 9),
            (n, 1),
        ),
        np.full(n, 6.0, np.float32),
        (np.arange(n) % 2).astype(np.int32),
    )
    gen = nl.NativeBatchGenerator(pack, batch_size=4)

    assets, _ = make_synthetic_assets(
        num_verts=100, num_joints=12, num_scenes=2, sdf_dim=16, scene_points=200, n_contact=32
    )
    cfg = TrainConfig(model_type="s1", latentD=32)
    model = build_model(cfg)
    opt = optax.adam(1e-4)
    state = init_state(model, cfg, opt, jax.random.PRNGKey(0))
    step = make_train_step(model, opt, assets, LossConfig(), "s1")

    count = 0
    while gen.has_next_batch():
        b = gen.next_batch()
        if b is None:
            break
        state, metrics = step(
            state, {k: jnp.asarray(v) for k, v in b.items()},
            jax.random.PRNGKey(count), jnp.float32(1.0), jnp.float32(1.0),
        )
        assert np.isfinite(float(metrics["loss"]))
        count += 1
    assert count == 2
