"""Multi-chip correctness: not just "runs and is finite" but EQUAL to
the single-device computation.

Equivalence is asserted at two levels:

* GRADIENTS (tight, atol ~1e-6): one loss/grad evaluation on the
  sharded inputs must match the unsharded one — GSPMD's psum is the
  same batch sum, only f32 reduction order differs.
* END-TO-END PARAMETERS (bounded drift): after K Adam steps the params
  must stay close, but Adam's g/sqrt(v) normalization amplifies
  reduction-order noise, and near-zero gradient elements can flip the
  update SIGN (|delta| = 2*lr for those elements, regardless of how
  tiny the underlying difference was). So the end-to-end check uses
  atol > 2*lr*K for the max and a much tighter bound on the MEAN
  (a systematic sharding bug shifts the mean; tie-flips don't).

Plus the driver's dryrun path as a regression test.
"""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P


def _need_devices(n=8):
    if len(jax.devices()) < n:
        pytest.skip(f"needs {n} (virtual) devices")


def test_dryrun_multichip_8():
    _need_devices()
    import __graft_entry__ as g

    g.dryrun_multichip(8)


def test_entry_compiles():
    import __graft_entry__ as g

    fn, args = g.entry()
    out = jax.jit(fn)(*args)
    assert float(out[0]) > 0


def test_dp_train_gradients_equal_single_device():
    """One loss+grad evaluation: 8-device sharded batch == unsharded,
    gradient-for-gradient (tight: pure function, no optimizer)."""
    _need_devices()
    import __graft_entry__ as g
    from psi_tpu.parallel.mesh import make_mesh, replicate, shard_batch
    from psi_tpu.train.loop import init_state
    from psi_tpu.train.objective import cvae_loss

    assets, cfg, model, gen, loss_cfg = g._tiny_setup()
    state = init_state(model, cfg, optax.adam(cfg.init_lr_h), jax.random.PRNGKey(0))
    batch = {k: jnp.asarray(v) for k, v in gen.next_batch(16).items()}
    key = jax.random.PRNGKey(7)
    ones = jnp.float32(1.0)

    @jax.jit
    def loss_and_grad(params, batch_stats, batch, assets):
        def f(p):
            total, _, _ = cvae_loss(
                model, {"params": p, "batch_stats": batch_stats}, batch, assets,
                key, ones, ones, loss_cfg, model_type=cfg.model_type, train=True,
            )
            return total

        return jax.value_and_grad(f)(params)

    loss_1, grads_1 = loss_and_grad(state.params, state.batch_stats, batch, assets)

    mesh = make_mesh(8)
    loss_8, grads_8 = loss_and_grad(
        replicate(state.params, mesh),
        replicate(state.batch_stats, mesh),
        shard_batch(batch, mesh),
        replicate(assets, mesh),
    )

    np.testing.assert_allclose(float(loss_8), float(loss_1), rtol=1e-5)
    # per-leaf relative-norm: backprop reductions cancel large terms, so
    # elementwise tolerances are dominated by cancellation noise (~0.3%
    # observed on BN-adjacent biases); a real sharding bug (wrong psum
    # scale, missing all-reduce) shows up as O(1) relative error
    for a, b in zip(jax.tree.leaves(grads_1), jax.tree.leaves(grads_8)):
        a, b = np.asarray(a, np.float64), np.asarray(b, np.float64)
        rel = np.linalg.norm(b - a) / (np.linalg.norm(a) + 1e-12)
        assert rel < 5e-3, f"gradient relative-norm error {rel} (shape {a.shape})"


def test_dp_train_step_equals_single_device():
    """Two optimizer steps on an 8-device DP mesh stay equal to the same
    two steps on one device, within Adam's noise-amplification bound
    (see module docstring: max < 2*lr*K tie-flip bound, tight mean)."""
    _need_devices()
    import __graft_entry__ as g
    from psi_tpu.parallel.mesh import make_mesh, replicate, shard_batch
    from psi_tpu.train.loop import init_state, make_train_step

    assets, cfg, model, gen, loss_cfg = g._tiny_setup()
    optimizer = optax.adam(cfg.init_lr_h)
    batches = [
        {k: jnp.asarray(v) for k, v in gen.next_batch(16).items()} for _ in range(2)
    ]
    keys = [jax.random.PRNGKey(7 + i) for i in range(2)]
    ones = jnp.float32(1.0)

    # single-device run
    state_1 = init_state(model, cfg, optimizer, jax.random.PRNGKey(0))
    step_1 = make_train_step(model, optimizer, assets, loss_cfg, cfg.model_type)
    for b, k in zip(batches, keys):
        state_1, metrics_1 = step_1(state_1, b, k, ones, ones)

    # 8-device DP run on the SAME batches
    mesh = make_mesh(8)
    state_8 = init_state(model, cfg, optimizer, jax.random.PRNGKey(0))
    state_8 = replicate(state_8, mesh)
    assets_8 = replicate(assets, mesh)
    step_8 = make_train_step(model, optimizer, assets_8, loss_cfg, cfg.model_type)
    for b, k in zip(batches, keys):
        state_8, metrics_8 = step_8(state_8, shard_batch(b, mesh), k, ones, ones)

    np.testing.assert_allclose(
        float(metrics_8["loss"]), float(metrics_1["loss"]), rtol=1e-4
    )
    lr, steps = cfg.init_lr_h, 2
    for a, b in zip(jax.tree.leaves(state_1.params), jax.tree.leaves(state_8.params)):
        d = np.abs(np.asarray(b) - np.asarray(a))
        assert d.max() < 2.5 * lr * steps, f"max param drift {d.max()}"
        assert d.mean() < 0.05 * lr, f"mean param drift {d.mean()}"


def test_population_sharded_fitting_equals_unsharded():
    """Fitting a 32-body population sharded over 8 devices == unsharded."""
    _need_devices()
    import __graft_entry__ as g
    from psi_tpu.fit.fitting import make_fit_step
    from psi_tpu.parallel.mesh import make_mesh, replicate
    from psi_tpu.utils.config import FitConfig

    assets, *_ = g._tiny_setup()
    rng = np.random.default_rng(3)
    n = 32
    x72 = (rng.normal(size=(n, 72)) * 0.3).astype(np.float32)
    x72[:, 2] += 3.0
    cam_ext = np.tile(np.eye(4, dtype=np.float32), (n, 1, 1))
    scene_idx = np.zeros(n, np.int32)

    cfg = FitConfig(num_iter=5)
    fit = make_fit_step(assets, cfg)
    x_unsharded, m_unsharded, _ = fit(
        jnp.asarray(x72), jnp.asarray(cam_ext), jnp.asarray(scene_idx)
    )

    mesh = make_mesh(8)
    assets_r = replicate(assets, mesh)
    fit_sh = make_fit_step(assets_r, cfg)
    sh = NamedSharding(mesh, P("dp"))
    x_sharded, m_sharded, _ = fit_sh(
        jax.device_put(jnp.asarray(x72), sh),
        jax.device_put(jnp.asarray(cam_ext), sh),
        jax.device_put(jnp.asarray(scene_idx), sh),
    )

    # bounded Adam drift (module docstring): per-step math matches to
    # f32 rounding; 5 Adam steps amplify it to ~1e-4 max observed
    d = np.abs(np.asarray(x_sharded) - np.asarray(x_unsharded))
    assert d.max() < 2.5 * cfg.init_lr_h, f"max fitted-param drift {d.max()}"
    assert d.mean() < 1e-4, f"mean fitted-param drift {d.mean()}"
    np.testing.assert_allclose(
        np.asarray(m_sharded["total"]), np.asarray(m_unsharded["total"]), atol=1e-4, rtol=1e-4
    )


def test_multihost_helpers_single_process():
    """Single-process behavior of the multi-host entry: initialize is a
    no-op, and the global mesh matches the local one."""
    from psi_tpu.parallel.distributed import ensure_distributed, global_mesh

    assert ensure_distributed() is False  # no coordinator configured -> no-op
    mesh = global_mesh()
    assert mesh.devices.size == len(jax.devices())
    assert mesh.axis_names == ("dp",)
