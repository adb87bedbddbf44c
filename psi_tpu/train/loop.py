"""Training loop: jit-compiled train step + the TrainOP driver.

Rebuild of the reference's TrainOP (source/train_s1.py:38-338 /
train_s2.py): same epoch structure, checkpoint cadence (every 2 wall
hours and every 10 epochs), resume-from-newest, and per-step loss
printout — but the step itself is one donated, jit-compiled XLA
program, optionally SPMD over a device mesh (batch sharded on 'dp',
gradients all-reduced over ICI by XLA).
"""

from __future__ import annotations

import functools
import logging
import time
from typing import Any, Callable, Dict, Optional

import flax.struct
import jax
import jax.numpy as jnp
import numpy as np
import optax

from psi_tpu.models import HumanCVAES1, HumanCVAES2
from psi_tpu.parallel.mesh import replicate, shard_batch
from psi_tpu.train.checkpoint import load_newest_checkpoint, save_checkpoint
from psi_tpu.train.objective import SceneAssets, cvae_loss
from psi_tpu.utils.config import LossConfig, TrainConfig

logger = logging.getLogger(__name__)


@flax.struct.dataclass
class TrainState:
    params: Any
    batch_stats: Any
    opt_state: Any
    step: jax.Array


def build_model(cfg: TrainConfig):
    if cfg.model_type == "s1":
        return HumanCVAES1(latentD=cfg.latentD, n_dim_body=cfg.n_dim_body)
    if cfg.model_type == "s2":
        return HumanCVAES2(latentD_g=cfg.latentD, latentD_l=cfg.latentD, n_dim_body=cfg.n_dim_body)
    raise ValueError(f"unknown model_type {cfg.model_type}")


def init_state(model, cfg: TrainConfig, optimizer, key) -> TrainState:
    variables = model.init(
        key,
        jnp.zeros((1, cfg.n_dim_body)),
        jnp.zeros((1, cfg.image_size, cfg.image_size, 2)),
        train=False,
    )
    params = variables["params"]
    batch_stats = variables.get("batch_stats", {})
    return TrainState(
        params=params,
        batch_stats=batch_stats,
        opt_state=optimizer.init(params),
        step=jnp.zeros((), jnp.int32),
    )


def make_train_step(
    model,
    optimizer,
    assets: SceneAssets,
    loss_cfg: LossConfig,
    model_type: str,
) -> Callable:
    """Returns jitted step(state, batch, key, fca, f_scene) -> (state, metrics).

    The asset registry is threaded through as a traced jit argument —
    closing over it would bake the (potentially huge) SDF grids into the
    executable as constants."""

    def loss_fn(params, batch_stats, batch, key, fca, f_scene, assets):
        variables = {"params": params, "batch_stats": batch_stats}
        total, metrics, new_state = cvae_loss(
            model, variables, batch, assets, key, fca, f_scene, loss_cfg,
            model_type=model_type, train=True,
        )
        return total, (metrics, new_state["batch_stats"] if new_state else batch_stats)

    @functools.partial(jax.jit, donate_argnums=(0,))
    def step(state: TrainState, batch, key, fca, f_scene, assets):
        (_, (metrics, new_bs)), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params, state.batch_stats, batch, key, fca, f_scene, assets
        )
        updates, new_opt = optimizer.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        return (
            TrainState(new_params, new_bs, new_opt, state.step + 1),
            metrics,
        )

    def bound(state, batch, key, fca, f_scene):
        return step(state, batch, key, fca, f_scene, assets)

    return bound


def make_epoch_step(
    model,
    optimizer,
    assets: SceneAssets,
    loss_cfg: LossConfig,
    model_type: str,
) -> Callable:
    """Chunk-of-epoch training as ONE XLA program: K batches stacked on a
    leading axis, lax.scan over steps — zero host round-trips per step
    (the python-loop path pays ~2 host<->device trips per batch, which
    dominates on tunneled/dev setups).

    Keys are supplied PER STEP (stacked [K, 2] alongside the batches),
    so a chunked epoch consumes exactly the same key sequence as the
    python loop — chunk size changes memory, never semantics. Returns
    step_epoch(state, stacked_batches, keys, fca, f_scene) ->
    (state, stacked per-step metrics)."""

    def loss_fn(params, batch_stats, batch, key, fca, f_scene, assets):
        variables = {"params": params, "batch_stats": batch_stats}
        total, metrics, new_state = cvae_loss(
            model, variables, batch, assets, key, fca, f_scene, loss_cfg,
            model_type=model_type, train=True,
        )
        return total, (metrics, new_state["batch_stats"] if new_state else batch_stats)

    @functools.partial(jax.jit, donate_argnums=(0,))
    def step_epoch(state: TrainState, batches, keys, fca, f_scene, assets):
        def body(st, xs):
            batch, key = xs
            (_, (metrics, new_bs)), grads = jax.value_and_grad(loss_fn, has_aux=True)(
                st.params, st.batch_stats, batch, key, fca, f_scene, assets
            )
            updates, new_opt = optimizer.update(grads, st.opt_state, st.params)
            new_params = optax.apply_updates(st.params, updates)
            return TrainState(new_params, new_bs, new_opt, st.step + 1), metrics

        state, metrics = jax.lax.scan(body, state, (batches, keys))
        return state, metrics

    def bound(state, batches, keys, fca, f_scene):
        return step_epoch(state, batches, keys, fca, f_scene, assets)

    return bound


def _stage_chunk(group, stage_bf16: bool, sharding=None, attempts: int = 3):
    """Stack a chunk of host batches and transfer it in ONE put per leaf.

    jnp.stack over a list of host arrays issues one device put PER
    ELEMENT (chunk x transfer latency each); np.stack + one jnp.asarray
    is a single transfer per leaf. With stage_bf16 the snapshot images
    go over the wire in bfloat16 (half the bytes; the objective upcasts
    on entry). Transfers retry on transient runtime failures — tunneled
    and remote device backends occasionally fail a put under sustained
    transfer load; quiescing the device and retrying recovers.
    """
    import ml_dtypes

    stacked_np = {k: np.stack([g[k] for g in group]) for k in group[0]}
    if stage_bf16:
        stacked_np["xs"] = stacked_np["xs"].astype(ml_dtypes.bfloat16)
    last_err = None
    for attempt in range(attempts):
        try:
            if sharding is not None:
                return {k: jax.device_put(v, sharding) for k, v in stacked_np.items()}
            return {k: jnp.asarray(v) for k, v in stacked_np.items()}
        except jax.errors.JaxRuntimeError as e:
            last_err = e
            # log every retry so a deterministic failure (e.g. chunk OOM)
            # is visible immediately rather than masked behind ~3 s of
            # silent retries (ADVICE r4)
            logger.warning(
                "device transfer failed (attempt %d/%d): %s",
                attempt + 1, attempts, str(e)[:300],
            )
            # drain every in-flight program/transfer, then back off
            try:
                jax.effects_barrier()
            except Exception:
                pass
            time.sleep(0.5 * (attempt + 1))
    raise last_err


class TrainOP:
    """End-to-end training driver (TrainOP parity, train_s1.py:38-338)."""

    def __init__(
        self,
        cfg: TrainConfig,
        loss_cfg: LossConfig,
        assets: SceneAssets,
        mesh=None,
    ):
        self.cfg = cfg
        self.loss_cfg = loss_cfg
        self.assets = assets
        self.model = build_model(cfg)
        if cfg.grad_clip_norm is not None:
            self.optimizer = optax.chain(
                optax.clip_by_global_norm(cfg.grad_clip_norm), optax.adam(cfg.init_lr_h)
            )
        else:
            self.optimizer = optax.adam(cfg.init_lr_h)
        self.mesh = mesh
        key = jax.random.PRNGKey(cfg.seed)
        self.state = init_state(self.model, cfg, self.optimizer, key)
        if mesh is not None:
            self.state = replicate(self.state, mesh)
            self.assets = replicate(self.assets, mesh)
        self.step_fn = make_train_step(
            self.model, self.optimizer, self.assets, loss_cfg, cfg.model_type
        )
        self.epoch_fn = (
            make_epoch_step(self.model, self.optimizer, self.assets, loss_cfg, cfg.model_type)
            if cfg.scan_epoch
            else None
        )
        self._key = jax.random.PRNGKey(cfg.seed + 1)

    def _next_key(self):
        self._key, k = jax.random.split(self._key)
        return k

    def train(self, batch_gen, log_fn: Optional[Callable[[str], None]] = None) -> Dict[str, float]:
        """batch_gen: iterable protocol matching the data layer
        (has_next_batch / next_batch / reset, SURVEY.md §2 #10).

        Per-step metrics also stream to {save_dir}/metrics.jsonl for
        offline observability (the reference only prints to stdout)."""
        import json
        import os

        cfg = self.cfg
        log = log_fn or (print if cfg.verbose else (lambda *_: None))
        os.makedirs(cfg.save_dir, exist_ok=True)
        metrics_f = open(os.path.join(cfg.save_dir, "metrics.jsonl"), "a")

        starting_ep = 0
        skip_batches = 0  # mid-epoch resume: batches of starting_ep already trained
        if cfg.resume_training:
            restored = load_newest_checkpoint(cfg.save_dir, self.state)
            if restored is not None:
                self.state = restored["state"]
                starting_ep = restored["epoch"]
                skip_batches = int(restored.get("batches_done", 0) or 0)
                if restored.get("key") is not None:
                    # continue the exact per-batch key sequence of the
                    # interrupted run (keys for skipped batches were
                    # consumed before the checkpoint was written)
                    self._key = jnp.asarray(restored["key"])
                log(f"[INFO] --resuming training from {restored['path']}")

        last_metrics: Dict[str, float] = {}
        start_time = time.time()
        for ep in range(starting_ep, cfg.epoch):
            # epoch-dependent gates (train_s1.py:123-128, 171-177, 200-204)
            fca = 1.0
            if self.loss_cfg.loss_weight_anealing:
                fca = min(1.0, max(float(ep) / (cfg.epoch * 0.75), 0.0))
            f_scene = 1.0 if ep > 0.75 * cfg.epoch else 0.0
            fca_arr = jnp.float32(fca)
            fs_arr = jnp.float32(f_scene)

            if self.epoch_fn is not None:
                # run the epoch as chunked scan programs: stack at most
                # scan_chunk_size batches on device at a time (bounds
                # peak HBM). Batches STREAM from the generator chunk by
                # chunk: each scan program is dispatched asynchronously,
                # so the host assembles chunk k+1 (and a prefetching
                # loader like data/native_loader.py fills its next
                # buffer) while the device executes chunk k. Draining
                # the whole epoch up front — the previous structure —
                # held every snapshot of the epoch in host RAM (GBs at
                # PROX scale) and serialized loader IO against device
                # compute. A leftover tail of < chunk batches goes
                # through the per-step path with the same key sequence.
                chunk = max(1, cfg.scan_chunk_size)
                batches_done = skip_batches if ep == starting_ep else 0
                n_skip = batches_done
                skipped = 0
                group = []
                pending_metrics = None  # device handle of the in-flight chunk

                def _drain_metrics(m, n_steps):
                    nonlocal last_metrics
                    vals = {k: np.asarray(v) for k, v in m.items()}
                    last_metrics = {k: float(v[-1]) for k, v in vals.items()}
                    for si in range(n_steps):
                        metrics_f.write(
                            json.dumps({"epoch": ep + 1, **{k: float(v[si]) for k, v in vals.items()}}) + "\n"
                        )

                while batch_gen.has_next_batch():
                    b = batch_gen.next_batch(cfg.batch_size)
                    if b is None:
                        continue
                    if skipped < n_skip:  # mid-epoch resume: already trained
                        skipped += 1
                        continue
                    group.append({k: np.asarray(v) for k, v in b.items()})
                    if len(group) < chunk:
                        continue
                    sh = None
                    if self.mesh is not None:
                        # axis 0 is the scan/step axis; shard the batch axis
                        from jax.sharding import NamedSharding, PartitionSpec as P

                        sh = NamedSharding(self.mesh, P(None, "dp"))
                    stacked = _stage_chunk(group, cfg.stage_bf16, sharding=sh)
                    keys = jnp.stack([self._next_key() for _ in group])
                    if pending_metrics is not None:
                        # sync on the PREVIOUS chunk only now, after the
                        # next chunk is assembled and dispatched inputs
                        # are staged — keeps loader IO off the critical path
                        _drain_metrics(pending_metrics, chunk)
                    self.state, pending_metrics = self.epoch_fn(
                        self.state, stacked, keys, fca_arr, fs_arr
                    )
                    group = []
                    batches_done += chunk
                    # mid-epoch wall-clock cadence at chunk boundaries
                    # (reference: every saving_per_hours INSIDE the
                    # epoch, train_s1.py:303-310 — a preemption must not
                    # eat a long epoch)
                    if (time.time() - start_time) / 3600.0 >= cfg.saving_per_hours:
                        start_time = time.time()
                        save_checkpoint(
                            cfg.save_dir, ep, self.state,
                            key=self._key, batches_done=batches_done,
                        )
                if pending_metrics is not None:
                    _drain_metrics(pending_metrics, chunk)
                for batch in group:  # tail: per-step path
                    if self.mesh is not None:
                        batch = shard_batch(batch, self.mesh)
                    self.state, metrics = self.step_fn(
                        self.state, batch, self._next_key(), fca_arr, fs_arr
                    )
                    last_metrics = {k: float(v) for k, v in metrics.items()}
                    metrics_f.write(json.dumps({"epoch": ep + 1, **last_metrics}) + "\n")
                    batches_done += 1
                    if (time.time() - start_time) / 3600.0 >= cfg.saving_per_hours:
                        start_time = time.time()
                        save_checkpoint(
                            cfg.save_dir, ep, self.state,
                            key=self._key, batches_done=batches_done,
                        )
                batch_gen.reset()
                if (ep + 1) % cfg.saving_per_epochs == 0:
                    save_checkpoint(cfg.save_dir, ep + 1, self.state, key=self._key)
                continue

            batches_done = 0
            n_skip = skip_batches if ep == starting_ep else 0
            while batch_gen.has_next_batch():
                batch = batch_gen.next_batch(cfg.batch_size)
                if batch is None:
                    continue
                if batches_done < n_skip:  # mid-epoch resume: already trained
                    batches_done += 1
                    continue
                batches_done += 1
                if self.mesh is not None:
                    batch = shard_batch(batch, self.mesh)
                self.state, metrics = self.step_fn(
                    self.state, batch, self._next_key(), fca_arr, fs_arr
                )
                last_metrics = {k: float(v) for k, v in metrics.items()}
                metrics_f.write(json.dumps({"epoch": ep + 1, **last_metrics}) + "\n")
                if cfg.verbose:
                    log(
                        "---in [epoch {:d}]: rec_t={:f}, rec_p={:f}, kl={:f}, vp={:f}, "
                        "contact={:f}, collision={:f}".format(
                            ep + 1,
                            last_metrics["rec_t"],
                            last_metrics["rec_p"],
                            last_metrics["kl"],
                            last_metrics["vposer"],
                            last_metrics["contact"],
                            last_metrics["collision"],
                        )
                    )
                if (time.time() - start_time) / 3600.0 >= cfg.saving_per_hours:
                    start_time = time.time()
                    save_checkpoint(
                        cfg.save_dir, ep, self.state,
                        key=self._key, batches_done=batches_done,
                    )
            batch_gen.reset()

            if (ep + 1) % cfg.saving_per_epochs == 0:
                save_checkpoint(cfg.save_dir, ep + 1, self.state, key=self._key)

        metrics_f.close()
        log("[INFO]: Training completes!")
        return last_metrics
