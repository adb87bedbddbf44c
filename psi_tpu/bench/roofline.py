"""Roofline / utilization accounting for the bench of record.

Round-3 verdict weak #1: bodies/s proves "faster than last round", not
"fast in absolute terms". This module turns measured wall times into
%-of-peak numbers: it compiles ONE Adam iteration of each fit-schedule
segment (full pass with SDF gather + NN search; NN-only warmup pass;
cached cheap pass) plus one training step, reads XLA's own accounting
of the optimized HLO (``compiled.cost_analysis()``: 'flops' and 'bytes
accessed'), scales by the static iteration schedule, and divides by the
measured time and the chip's peak MXU FLOP/s / HBM bandwidth.

Caveats (stated in the artifact): XLA's HLO cost analysis counts a
while-loop body once regardless of trip count (verified on hardware,
scripts/probe_cost_analysis.py) — hence the per-iteration compilation
here; 'bytes accessed' is operand+output bytes of the post-fusion HLO,
an HBM-traffic *model* (it cannot see VMEM residency across
instructions), so utilization numbers are ~upper bounds on true HBM
traffic. FLOPs counting is exact for the dominant matmuls.
"""

from __future__ import annotations

from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

# (peak bf16 MXU FLOP/s, peak HBM bytes/s) per chip, public specs
PEAKS = {
    "v5 lite": (197e12, 819e9),  # TPU v5e
    "v5e": (197e12, 819e9),
    "v6 lite": (918e12, 1640e9),  # TPU v6e / Trillium
    "v6e": (918e12, 1640e9),
    "v5p": (459e12, 2765e9),
    "v5": (459e12, 2765e9),  # device_kind "TPU v5" = v5p
    "v4": (275e12, 1228e9),
    "v3": (123e12, 900e9),
}


def device_peaks() -> Optional[Tuple[str, float, float]]:
    kind = jax.devices()[0].device_kind  # e.g. "TPU v5 lite"
    low = kind.lower()
    for key, (fl, bw) in PEAKS.items():
        if key in low:
            return kind, fl, bw
    return None


def _cost(jitted, *args) -> Dict[str, float]:
    ca = jitted.lower(*args).compile().cost_analysis()
    if isinstance(ca, (list, tuple)):
        ca = ca[0]
    return {"flops": float(ca.get("flops", 0.0)),
            "bytes": float(ca.get("bytes accessed", 0.0))}


def analyze_fit_iters(assets, cfg, n_bodies: int) -> Dict[str, Dict[str, float]]:
    """Per-iteration flops/bytes for the three fit-schedule segments at
    the given config: 'full' (real packed-grid gather + NN search),
    'nn_only' (NN search, cached SDF cells), 'cheap' (frozen NN + cached
    cells). Each is value_and_grad of the loss + the Adam update — the
    exact body the fit scan runs. Exact mode uses only 'full'."""
    from psi_tpu.fit.fitting import _per_body_losses
    from psi_tpu.geometry.bodyvec import convert_to_6D_rot

    opt = optax.adam(cfg.init_lr_h)
    n = n_bodies
    n_contact = int(assets.contact_vids.shape[0])
    n_verts = int(assets.smplx.v_template.shape[0])

    xhr = jnp.zeros((n, 75), jnp.float32)
    cam_ext = jnp.tile(jnp.eye(4, dtype=jnp.float32)[None], (n, 1, 1))
    scene_idx = jnp.zeros((n,), jnp.int32)
    y_nn = jnp.zeros((n, n_contact, 3), jnp.float32)
    # corner rows carry in the grid's storage dtype (ops/sdf.py)
    cache = (jnp.zeros((n, n_verts, 8), assets.sdf_packed.dtype),
             jnp.zeros((n, n_verts, 3), jnp.float32))

    if cfg.lbs_precision == "fused":
        from psi_tpu.body.smplx_model import make_fused_bundle

        bundle_fn = lambda a: make_fused_bundle(a.smplx)
    else:
        bundle_fn = lambda a: None

    def make_step(fresh_nn, fresh_sdf):
        def step(assets_, xhr, xhr_init, cam_ext, scene_idx, y_nn, cache, opt_state):
            fb = bundle_fn(assets_)
            sel = None if (fresh_nn and fresh_sdf) and cfg.refresh_every <= 1 else (y_nn, cache)

            def loss_fn(x):
                return _per_body_losses(
                    assets_, x, xhr_init, cam_ext, scene_idx, cfg,
                    sel, fresh_nn, fresh_sdf, None, fb,
                )

            (_, (m, new_sel)), grads = jax.value_and_grad(loss_fn, has_aux=True)(xhr)
            updates, opt_state = opt.update(grads, opt_state, xhr)
            return optax.apply_updates(xhr, updates), opt_state, new_sel

        return jax.jit(step)

    opt_state = opt.init(xhr)
    args = (assets, xhr, xhr, cam_ext, scene_idx, y_nn, cache, opt_state)
    out = {"full": _cost(make_step(True, True), *args)}
    if cfg.refresh_every > 1:
        out["nn_only"] = _cost(make_step(True, False), *args)
        out["cheap"] = _cost(make_step(False, False), *args)
    return out


def fit_schedule_counts(cfg) -> Dict[str, int]:
    """Static (full, nn_only, cheap) iteration counts of the fit scan —
    mirrors the block structure in fit/fitting.py::_fit_program."""
    if cfg.refresh_every <= 1:
        return {"full": cfg.num_iter, "nn_only": 0, "cheap": 0}
    w = min(cfg.refresh_warmup, cfg.num_iter)
    T = cfg.refresh_every
    full = 0
    nn_only = 0
    if w:
        if cfg.sdf_warmup_gathers:
            full += w
        else:
            full += 1
            nn_only += w - 1
    n_blocks, rem = divmod(cfg.num_iter - w, T)
    full += n_blocks + (1 if rem else 0)
    cheap = cfg.num_iter - w - n_blocks - (1 if rem else 0)
    return {"full": full, "nn_only": nn_only, "cheap": cheap}


def fit_program_cost(assets, cfg, n_bodies: int) -> Dict[str, float]:
    """Whole-fit-program flops/bytes = per-segment cost x static counts."""
    seg = analyze_fit_iters(assets, cfg, n_bodies)
    counts = fit_schedule_counts(cfg)
    tot = {"flops": 0.0, "bytes": 0.0}
    for name, c in counts.items():
        if c and name in seg:
            tot["flops"] += c * seg[name]["flops"]
            tot["bytes"] += c * seg[name]["bytes"]
    tot["segments"] = {k: {**seg[k], "iters": counts.get(k, 0)} for k in seg}
    return tot


def train_step_cost(assets, batch_size: int, model_type: str = "s1") -> Dict[str, float]:
    """flops/bytes of one full six-term training step at the given batch."""
    from psi_tpu.data.synthetic import SyntheticBatchGenerator
    from psi_tpu.train.loop import build_model, init_state, make_train_step
    from psi_tpu.utils.config import LossConfig, TrainConfig

    cfg = TrainConfig(model_type=model_type, latentD=256, batch_size=batch_size)
    model = build_model(cfg)
    opt = optax.adam(cfg.init_lr_h)
    state = init_state(model, cfg, opt, jax.random.PRNGKey(0))
    gen = SyntheticBatchGenerator(num_scenes=4, batches_per_epoch=2, seed=0)
    batch = {k: jnp.asarray(v) for k, v in gen.next_batch(batch_size).items()}

    from psi_tpu.train.objective import cvae_loss

    def loss_fn(params, batch_stats, batch, key, assets):
        variables = {"params": params, "batch_stats": batch_stats}
        total, metrics, new_state = cvae_loss(
            model, variables, batch, assets, key, jnp.float32(1.0), jnp.float32(1.0),
            LossConfig(), model_type=model_type, train=True,
        )
        return total, (metrics, new_state["batch_stats"] if new_state else batch_stats)

    def step(state, batch, key, assets):
        (_, (m, bs)), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params, state.batch_stats, batch, key, assets
        )
        updates, new_opt = opt.update(grads, state.opt_state, state.params)
        return optax.apply_updates(state.params, updates), new_opt

    return _cost(jax.jit(step), state, batch, jax.random.PRNGKey(1), assets)


def utilization(cost: Dict[str, float], wall_s: float) -> Dict[str, float]:
    """Achieved GFLOP/s, GB/s and %-of-peak for a measured wall time."""
    pk = device_peaks()
    out = {
        "achieved_tflops": round(cost["flops"] / wall_s / 1e12, 3),
        "achieved_gbs": round(cost["bytes"] / wall_s / 1e9, 1),
    }
    if pk is not None:
        kind, peak_fl, peak_bw = pk
        out["device"] = kind
        out["pct_mxu_peak"] = round(100.0 * cost["flops"] / wall_s / peak_fl, 2)
        out["pct_hbm_peak"] = round(100.0 * cost["bytes"] / wall_s / peak_bw, 1)
        # which wall dominates at 100% efficiency
        t_flops = cost["flops"] / peak_fl
        t_bytes = cost["bytes"] / peak_bw
        out["bound"] = "hbm" if t_bytes > t_flops else "mxu"
        out["lightspeed_s"] = round(max(t_bytes, t_flops), 5)
        out["lightspeed_frac"] = round(max(t_bytes, t_flops) / wall_s, 3)
    return out
