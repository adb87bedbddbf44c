"""Worker for the 2-process distributed test (tests/test_multiprocess.py).

Each process (JAX_PROCESS_ID 0/1) initializes jax.distributed through
``ensure_distributed()``, builds the GLOBAL 2-device mesh (one CPU
device per process), runs ONE data-parallel train step of the real
stage-1 objective over it, and writes its view of the updated params to
``{out_dir}/params_p{pid}.npz``. The test asserts both processes agree
with each other and with a single-process run of the same step.

This is the multi-host rung of SURVEY.md §2.3 (the reference scales
across machines only via HTCondor job fan-out,
cluster_mpi/htcondor_submission.sub; here one SPMD program spans the
processes and XLA runs the gradient all-reduce through the distributed
runtime — on a TPU pod the same code rides ICI).
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")  # axon plugin overrides the env var

import numpy as np


def main():
    out_dir = sys.argv[1]
    mode = sys.argv[2] if len(sys.argv) > 2 else "train"
    from psi_tpu.parallel.distributed import ensure_distributed, global_mesh, is_primary

    assert ensure_distributed() is True, "coordinator env not picked up"
    assert jax.process_count() == 2, jax.process_count()
    assert len(jax.devices()) == 2, jax.devices()  # global view: 1 CPU per process

    import jax.numpy as jnp
    import optax
    from jax.sharding import NamedSharding, PartitionSpec as P

    from psi_tpu.data.synthetic import SyntheticBatchGenerator, make_synthetic_assets
    from psi_tpu.parallel.mesh import replicate
    from psi_tpu.train.loop import build_model, init_state, make_train_step
    from psi_tpu.utils.config import LossConfig, TrainConfig

    # identical on both processes (same seeds)
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

    mesh = global_mesh()
    state = replicate(state, mesh)
    assets_r = replicate(assets, mesh)
    dp = NamedSharding(mesh, P("dp"))

    def shard(x):
        x = np.asarray(x)
        # every process holds the full (deterministic) batch; hand jax
        # each shard through the addressable-shard callback
        return jax.make_array_from_callback(x.shape, dp, lambda idx: x[idx])

    if mode == "fit":
        # population-sharded FIT across the 2-process mesh (SURVEY §2.3:
        # the generation/fitting sweep is the throughput-critical path;
        # this is its multi-host variant — round-4 verdict next #6).
        # Exercises the refresh-block schedule so the frozen-state scan
        # carries cross the process boundary too.
        from psi_tpu.fit.fitting import make_fit_step
        from psi_tpu.utils.config import FitConfig

        rng = np.random.default_rng(0)
        n_bodies = 8
        x72 = (rng.normal(size=(n_bodies, 72)) * 0.3).astype(np.float32)
        x72[:, 2] += 3.0
        cam_ext = np.tile(np.eye(4, dtype=np.float32), (n_bodies, 1, 1))
        scene_idx = (np.arange(n_bodies) % 2).astype(np.int32)
        fit = make_fit_step(
            assets_r, FitConfig(num_iter=4, refresh_every=2, refresh_warmup=1)
        )
        xf, fmetrics, _ = fit(shard(x72), shard(cam_ext), shard(scene_idx))
        # each process saves its addressable rows of the global result
        out = {}
        for i, s in enumerate(xf.addressable_shards):
            rows = s.index[0]
            out[f"shard{i}_start"] = np.asarray(rows.start or 0)
            out[f"shard{i}_data"] = np.asarray(s.data)
        # metrics are population-sharded too: save the addressable rows
        for i, s in enumerate(fmetrics["total"].addressable_shards):
            out[f"total{i}_start"] = np.asarray(s.index[0].start or 0)
            out[f"total{i}_data"] = np.asarray(s.data)
        np.savez(os.path.join(out_dir, f"fit_p{jax.process_index()}.npz"), **out)
        if is_primary():
            print("PRIMARY_OK", flush=True)
        print(f"DONE p{jax.process_index()}", flush=True)
        return

    gbatch = {k: shard(v) for k, v in batch.items()}
    step = make_train_step(model, opt, assets_r, LossConfig(), "s1")
    state, metrics = step(
        state, gbatch, jax.random.PRNGKey(1), jnp.float32(1.0), jnp.float32(1.0)
    )

    # pull the (replicated) updated params back to host on every process
    params_host = jax.tree.map(lambda x: np.asarray(jax.device_get(x)), state.params)
    flat, _ = jax.tree_util.tree_flatten_with_path(params_host)
    out = {"/".join(str(p) for p in path): leaf for path, leaf in flat}
    out["__loss__"] = np.asarray(float(metrics["loss"]))
    np.savez(os.path.join(out_dir, f"params_p{jax.process_index()}.npz"), **out)
    if is_primary():
        print("PRIMARY_OK", flush=True)
    print(f"DONE p{jax.process_index()}", flush=True)


if __name__ == "__main__":
    main()
