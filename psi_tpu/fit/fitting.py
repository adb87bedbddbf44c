"""Scene-aware fitting refinement — the throughput-critical path.

Rebuild of FittingOP (reference: source/fitting_proxe.py:42-263,
fitting_habitat.py): refine each generated body against the scene with
Adam over  L1-to-initial + VPoser-z^2 + Chamfer contact + SDF
penetration.

TPU-native design: the reference optimizes ONE body at a time
(batch_size=1, fitting_proxe.py:234) with a fresh autograd graph per
iteration, looping over up to 10k pickle files from Python. Here the
entire population is a single jit program:

    x_fitted = jit( lax.scan(adam_step, ...) )   over  [N, 75] bodies

with per-body loss terms (each body's parameters only touch its own
term, so summing is gradient-identical to N independent runs). N
bodies x num_iter Adam steps execute with zero host round-trips; the
population axis shards over a device mesh for multi-chip scale-out.

Semantics notes vs. the reference:
* The reference re-uses one Adam optimizer across bodies, carrying
  moment state from the previous body into the next
  (fitting_proxe.py:73-74,175). Here optimizer state starts fresh per
  population — the cleaner semantics; parity impact is confined to the
  first iterations and is measured in tests rather than replicated.
* Collision/contact means are per-body (batch=1 in the reference makes
  its batch-mean a per-body mean).
"""

from __future__ import annotations

import os
import pickle
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from psi_tpu.body.decode import body_vec_to_verts
from psi_tpu.geometry.bodyvec import convert_to_3D_rot, convert_to_6D_rot
from psi_tpu.ops.chamfer import chamfer_one_sided, chamfer_one_sided_nn
from psi_tpu.ops.prune import select_near_tiles
from psi_tpu.ops.sdf import (
    sdf_trilinear_from_cache,
    sdf_trilinear_packed,
    sdf_trilinear_packed_cached,
)
from psi_tpu.train.objective import SceneAssets
from psi_tpu.utils.config import FitConfig


def _per_body_losses(
    assets: SceneAssets,
    xhr: jax.Array,  # [N, 75]
    xhr_init: jax.Array,  # [N, 75]
    cam_ext: jax.Array,  # [N, 4, 4]
    scene_idx: jax.Array,  # [N]
    cfg: FitConfig,
    sel=None,
    fresh_nn: Optional[bool] = None,
    fresh_sdf: Optional[bool] = None,
    sub: Optional[Dict] = None,
    fused_bundle=None,
    fused_mesh=None,
) -> Tuple[jax.Array, Tuple[Dict[str, jax.Array], Tuple]]:
    """Summed loss with per-body term semantics (fitting_proxe.py:101-162).

    sel=None runs the FULL pass: real NN search over the scene cloud for
    the contact term and one real grid gather per vertex for the
    collision term; when cfg.refresh_every > 1 the pass also emits the
    carried state for the cheap iterations — each contact vert's NN
    scene point (y_nn [N, C, 3]) and the frozen-cell SDF cache (corner
    rows + floor coords, ops.sdf.sdf_trilinear_packed_cached).
    sel=(y_nn, cache) with fresh_nn=fresh_sdf=False runs the CHEAP pass:
    contact against the frozen correspondence (|x - y_nn|^2, the
    ICP-style majorizer of the NN distance), collision against each
    vertex's cached cell patch — pure dense math, no NN search, no
    gathers, no scatters.
    sel=(_, cache) with fresh_nn=True, fresh_sdf=False is the NN-ONLY
    refresh: real NN search (contact correspondences drift fastest) but
    collision against the carried cell cache — skips the gather-engine-
    bound packed-grid fetch, the most expensive half of a full pass
    (FitConfig.sdf_warmup_gathers).
    fresh_nn/fresh_sdf default to "infer from sel" (None -> sel is None),
    preserving the original two-mode call convention.
    sub (FitConfig.cheap_collision_verts): vertex-subset decode bundle
    {smplx, joints_direct, n_contact, rows, coll_rows} — cached-SDF
    passes decode only rows = contact_vids + a stride-uniform collision
    subset (the pose-corrective, skinning and camera chains all scale
    with rows); the collision term averages over the STRIDE rows only
    (contact rows are decoded for the contact term but excluded from
    the collision mean — see the branch comment). Full passes still
    decode every vertex and slice their emitted cell cache to coll_rows.
    """
    if fresh_nn is None:
        fresh_nn = sel is None
    if fresh_sdf is None:
        fresh_sdf = sel is None
    loss_rec = cfg.weight_loss_rec * jnp.mean(jnp.abs(xhr - xhr_init), axis=1)  # [N]

    xh = convert_to_3D_rot(xhr)  # [N, 72]
    loss_vposer = cfg.weight_loss_vposer * jnp.mean(xh[:, 16:48] ** 2, axis=1)

    use_sub = sub is not None and sel is not None and not fresh_sdf
    if use_sub:
        # cached-SDF pass: decode ONLY the subset rows (contact verts
        # first, then the collision stride) — the sliced model tensors
        # are built once per fit call, outside the iteration scans
        def _decode(xh_):
            return body_vec_to_verts(
                sub["smplx"], assets.vposer_params, xh_, cam_ext,
                precision=cfg.lbs_precision, joints_direct=sub["joints_direct"],
            )[0]
    else:
        def _decode(xh_):
            return body_vec_to_verts(
                assets.smplx, assets.vposer_params, xh_, cam_ext,
                precision=cfg.lbs_precision, fused_bundle=fused_bundle,
                fused_mesh=fused_mesh,
            )[0]

    if cfg.remat_decode:
        _decode = jax.checkpoint(_decode)
    verts = _decode(xh)
    contact_verts = (
        verts[:, : sub["n_contact"], :] if use_sub
        else verts[:, assets.contact_vids, :]
    )

    if sel is not None and not fresh_nn:
        y_nn = sel[0]
        # cheap pass: frozen correspondence, frozen cell patches
        d1 = jnp.sum((contact_verts - y_nn) ** 2, axis=-1)  # [N, C]
    else:
        scene_pts = assets.scene_verts[scene_idx]
        ks = cfg.prune_scene_points
        if ks and ks < scene_pts.shape[1]:
            # candidate pruning: the NN search only needs scene points
            # near the body; keep the ~K nearest (tile-granular over
            # the Morton-ordered cloud, ops/prune.py). Cuts the
            # O(B*C*M) argmin ~M/K x.
            centroid = jnp.mean(contact_verts, axis=1)  # [N, 3]
            scene_pts = select_near_tiles(scene_pts, centroid, ks)
        if cfg.refresh_every > 1:
            d1, y_nn = chamfer_one_sided_nn(contact_verts, scene_pts)
        else:
            d1 = chamfer_one_sided(contact_verts, scene_pts)  # [N, C]
            y_nn = jnp.zeros((xhr.shape[0], 1, 3), jnp.float32)  # dummy carry
    s = jnp.sqrt(d1 + 1e-4)
    loss_contact = cfg.weight_contact * jnp.mean(s / (s + cfg.contact_denom_offset), axis=1)

    dims = tuple(assets.sdf_packed.shape[1:4])
    if sel is not None and not fresh_sdf:
        # cheap / nn-only pass: every vertex against its frozen cell's
        # linear patch; the cache carries forward unchanged. With a
        # vertex subset, collision averages over the STRIDE rows only —
        # including the contact rows would triple their relative weight
        # in the mean (1455/3503 vs 1455/10475) and the inflated
        # surface-repulsion measurably degrades the contact score
        # (measured at protocol scale: contact 0.2108 vs 0.1942).
        sdf_cache = sel[1]
        coll_verts = verts[:, sub["n_contact"]:, :] if use_sub else verts
        body_sdf = sdf_trilinear_from_cache(
            sdf_cache, scene_idx, coll_verts, assets.grid_mins, assets.grid_maxs, dims
        )
    elif cfg.refresh_every > 1:
        body_sdf, sdf_cache = sdf_trilinear_packed_cached(
            assets.sdf_packed, scene_idx, verts, assets.grid_mins, assets.grid_maxs
        )
        sdf_cache = jax.lax.stop_gradient(sdf_cache)
        if sub is not None:
            # carry only the rows the subset cheap iterations evaluate
            # (the collision stride; contact rows are excluded above)
            sdf_cache = (
                sdf_cache[0][:, sub["coll_rows"]],
                sdf_cache[1][:, sub["coll_rows"]],
            )
    else:
        body_sdf = sdf_trilinear_packed(
            assets.sdf_packed, scene_idx, verts, assets.grid_mins, assets.grid_maxs
        )
        # dummy cache keeps the scan carry small when refresh is off
        sdf_cache = (
            jnp.zeros((xhr.shape[0], 1, 8), jnp.float32),
            jnp.zeros((xhr.shape[0], 1, 3), jnp.float32),
        )
    neg = jnp.minimum(body_sdf, 0.0)
    cnt = jnp.maximum(jnp.sum(body_sdf < 0, axis=1), 1).astype(xhr.dtype)
    loss_collision = cfg.weight_collision * (-jnp.sum(neg, axis=1) / cnt)

    per_body = loss_rec + loss_vposer + loss_contact + loss_collision
    metrics = {
        "rec": loss_rec,
        "vposer": loss_vposer,
        "contact": loss_contact,
        "collision": loss_collision,
        "total": per_body,
    }
    return jnp.sum(per_body), (metrics, (y_nn, sdf_cache))


def _fit_program(cfg: FitConfig, want_metrics: bool = True, fused_mesh=None):
    """Unjitted fit(assets, x72_init, cam_ext, scene_idx) — shared by the
    standalone and the fused generate+fit programs. Callers MUST pass
    assets as a traced argument (closed-over arrays become compile-time
    constants and the packed SDF registry, hundreds of MB, would explode
    compile time / exceed the remote-compile request limit).

    want_metrics=False skips the final-state metrics evaluation — a FULL
    exact loss pass (scene-cloud NN search + packed-grid gather + full
    LBS forward) that exists only to report per-body final losses. The
    bench pipeline and the serving hot path discard the metrics, but jit
    outputs are always computed, so the pass costs them ~an extra full
    iteration per program; they trace with False and get (x72, None,
    hist). The fitted parameters are bitwise-identical either way (the
    pass happens after the last Adam update)."""
    opt = optax.adam(cfg.init_lr_h)

    def fit(assets, x72_init, cam_ext, scene_idx):
        xhr_init = convert_to_6D_rot(x72_init)

        refresh = cfg.refresh_every > 1

        # Vertex-subset cheap iterations (cfg.cheap_collision_verts):
        # the subset is built AFTER the warmup segment — subh is a
        # trace-time cell, so the warmup iters (traced while it is None)
        # run at full-vertex semantics and the block iters (traced after
        # _build_sub fills it) use the subset. See _build_sub for the
        # selection recipe.
        subh = {"sub": None}

        def _build_sub(x72_now):
            from psi_tpu.body.decode import body_vec_to_verts
            from psi_tpu.body.smplx_model import smplx_vertex_subset

            n_verts_full = assets.smplx.v_template.shape[0]
            s = min(cfg.cheap_collision_verts, n_verts_full)
            if s >= n_verts_full:
                coll_ids = jnp.arange(n_verts_full, dtype=jnp.int32)
            else:
                # Half the row budget is a stride-uniform body cover;
                # half goes to the mesh rows carrying the most
                # penetration mass at the post-warmup state. The
                # collision gradient flows ONLY from penetrating verts
                # (neg = min(sdf, 0)), so a pure uniform subset misses
                # penetration pockets between full passes — measured at
                # protocol scale as a ~0.02 contact-indicator
                # regression. Penetration REGIONS (in mesh-row space)
                # are population-correlated, so scoring a 64-body
                # sample at the post-warmup state (bodies have already
                # taken their largest Adam steps) finds them at ~1/4
                # the cost of a full pass; full passes keep re-scoring
                # every vertex exactly.
                s_stride = s // 2
                stride_ids = jnp.asarray(
                    np.unique(
                        np.round(np.linspace(0, n_verts_full - 1, s_stride)).astype(np.int64)
                    ),
                    jnp.int32,
                )
                n_score = min(64, x72_now.shape[0])
                # one-time 64-row penetration-scoring decode: stays
                # UNSHARDED even under a mesh (fused_mesh is not passed)
                # — n_score may not divide the mesh, and an all-gather
                # of 64 rows once per fit call is noise
                verts0 = body_vec_to_verts(
                    assets.smplx, assets.vposer_params,
                    x72_now[:n_score], cam_ext[:n_score],
                    precision=cfg.lbs_precision, fused_bundle=fused_bundle,
                )[0]
                sdf0 = sdf_trilinear_packed(
                    assets.sdf_packed, scene_idx[:n_score], verts0,
                    assets.grid_mins, assets.grid_maxs,
                )
                pen_mass = jnp.sum(jnp.minimum(sdf0, 0.0), axis=0)  # [V], <= 0
                pen_ids = jax.lax.top_k(-pen_mass, s - s_stride)[1].astype(jnp.int32)
                coll_ids = jnp.concatenate([stride_ids, pen_ids])
            coll_ids = jax.lax.stop_gradient(coll_ids)
            rows = jnp.concatenate([assets.contact_vids.astype(jnp.int32), coll_ids])
            sub_model, jd = smplx_vertex_subset(assets.smplx, rows)
            return {
                "smplx": sub_model,
                "joints_direct": jd,
                "n_contact": int(assets.contact_vids.shape[0]),
                "rows": rows,
                "coll_rows": coll_ids,
                "n_rows": int(coll_ids.shape[0]),
            }

        # fused-Pallas decode: the constant operand bundle is built ONCE
        # per fit call, outside the iteration scans (re-padding ~60 MB of
        # model tensors per loss evaluation would dominate a cheap iter)
        if cfg.lbs_precision == "fused":
            from psi_tpu.body.smplx_model import make_fused_bundle

            fused_bundle = make_fused_bundle(assets.smplx)
        else:
            fused_bundle = None

        def loss_fn(xhr, sel=None, fresh_nn=True, fresh_sdf=True):
            return _per_body_losses(
                assets, xhr, xhr_init, cam_ext, scene_idx, cfg, sel,
                fresh_nn, fresh_sdf, subh["sub"], fused_bundle, fused_mesh,
            )

        n = xhr_init.shape[0]
        # Population chunking for gather/compute overlap
        # (FitConfig.overlap_chunks): the scan carry is a TUPLE of C
        # per-chunk (xhr, opt_state, sel) states and each iteration runs
        # the step per chunk, giving XLA C independent chains whose
        # gather-engine traffic and dense math can overlap (the gather
        # engine runs fully concurrent with the MXU —
        # scripts/probe_overlap.py). C=1 is the plain batched program.
        C = max(1, int(getattr(cfg, "overlap_chunks", 1) or 1))
        if n % C:
            C = 1  # chunking requires equal chunks; fall back to batched
        bounds = [(n * ci // C, n * (ci + 1) // C) for ci in range(C)]

        def loss_fn_c(ci, xhr_c, sel=None, fresh_nn=True, fresh_sdf=True):
            lo, hi = bounds[ci]
            return _per_body_losses(
                assets, xhr_c, xhr_init[lo:hi], cam_ext[lo:hi],
                scene_idx[lo:hi], cfg, sel, fresh_nn, fresh_sdf,
                subh["sub"], fused_bundle, fused_mesh,
            )

        def _one_iter(ci, chunk, kind):
            xhr, opt_state, sel = chunk
            if kind == "full":
                f = lambda x: loss_fn_c(ci, x)
            elif kind == "nn_only":
                # fresh NN correspondences, frozen SDF cell cache — skips
                # the gather-engine-bound packed-grid fetch
                # (sdf_warmup_gathers)
                f = lambda x: loss_fn_c(ci, x, sel, fresh_nn=True, fresh_sdf=False)
            else:  # cheap
                f = lambda x: loss_fn_c(ci, x, sel, fresh_nn=False, fresh_sdf=False)
            (_, (metrics, new_sel)), grads = jax.value_and_grad(f, has_aux=True)(xhr)
            updates, opt_state = opt.update(grads, opt_state, xhr)
            sel_out = sel if kind == "cheap" else new_sel
            return (optax.apply_updates(xhr, updates), opt_state, sel_out), metrics["total"]

        def _lift(kind):
            def it(carry, _):
                outs = [_one_iter(ci, c, kind) for ci, c in enumerate(carry)]
                h = outs[0][1] if C == 1 else jnp.concatenate([o[1] for o in outs])
                return tuple(o[0] for o in outs), h
            return it

        full_iter = _lift("full")
        nn_only_iter = _lift("nn_only")
        cheap_iter = _lift("cheap")
        # carried shapes must match what the full pass emits: real-size
        # frozen state only when refresh is on, tiny dummies otherwise
        # (the warmup segment always carries the FULL vertex cache; the
        # subset transition slices it before the block scans)
        n_contact = assets.contact_vids.shape[0]
        n_verts = assets.smplx.v_template.shape[0]
        cc = n_contact if refresh else 1
        vc = n_verts if refresh else 1
        # corner rows carry in the GRID's storage dtype (bf16 on the
        # production packed grids — lossless, halves the biggest
        # cheap-iter tensor; ops/sdf.py::sdf_trilinear_packed_cached)
        cache_dtype = assets.sdf_packed.dtype if refresh else jnp.float32

        def _sel0(n_c):
            return (
                jnp.zeros((n_c, cc, 3), jnp.float32),
                (jnp.zeros((n_c, vc, 8), cache_dtype),
                 jnp.zeros((n_c, vc, 3), jnp.float32)),
            )

        carry = tuple(
            (xhr_init[lo:hi], opt.init(xhr_init[lo:hi]), _sel0(hi - lo))
            for lo, hi in bounds
        )

        if not refresh:
            carry, loss_hist = jax.lax.scan(full_iter, carry, None, length=cfg.num_iter)
        else:
            # selection-refresh as BLOCK structure instead of a per-iter
            # lax.cond: the schedule "full iff i < w or (i-w) % T == 0"
            # is static, so unroll it as [w warmup full iters] + [blocks
            # of 1 full + (T-1) branch-free cheap iters] + a partial
            # tail block. Identical iterate sequence to the cond form
            # (tests assert it), but the cheap iters carry no cond/
            # branch overhead — measured ~2.7 ms/iter of cond+carry cost
            # at bench shapes (ROUND_NOTES round 2).
            #
            # Full during warmup AND at iter w (the first scheduled
            # refresh lands immediately after warmup). The seemingly
            # redundant back-to-back full pass was measured to matter:
            # starting cheap right at iter w buys ~8% throughput but
            # degrades the L1-to-init term 0.051->0.062 at bench shapes.
            w = min(cfg.refresh_warmup, cfg.num_iter)
            T = cfg.refresh_every
            hists = []
            if w:
                if cfg.sdf_warmup_gathers:
                    carry, h = jax.lax.scan(full_iter, carry, None, length=w)
                    hists.append(h)
                else:
                    # one anchoring gather at iter 0, then NN-only warmup
                    # (collision rides the iter-0 cell cache's linear
                    # extrapolation; contact re-searches every iter)
                    carry, h0 = full_iter(carry, None)
                    hists.append(h0[None])
                    if w > 1:
                        carry, h = jax.lax.scan(nn_only_iter, carry, None, length=w - 1)
                        hists.append(h)
            if cfg.cheap_collision_verts > 0 and cfg.num_iter > w:
                # subset transition: select rows at the post-warmup
                # state (population-wide, over the concatenated chunks),
                # then slice each chunk's carried cell cache so the block
                # iters (traced below, reading subh) see subset shapes
                x72_now = convert_to_3D_rot(
                    carry[0][0] if C == 1 else jnp.concatenate([c[0] for c in carry])
                )
                subh["sub"] = _build_sub(x72_now)
                cr = subh["sub"]["coll_rows"]
                carry = tuple(
                    (xhr_c, opt_c, (y_nn_c, (c0[:, cr], c1[:, cr])))
                    for xhr_c, opt_c, (y_nn_c, (c0, c1)) in carry
                )
            n_blocks, rem = divmod(cfg.num_iter - w, T)

            def block(carry, _, n_cheap):
                carry, h_full = full_iter(carry, None)
                carry, h_cheap = jax.lax.scan(cheap_iter, carry, None, length=n_cheap)
                return carry, jnp.concatenate([h_full[None], h_cheap], axis=0)

            if n_blocks:
                carry, h = jax.lax.scan(
                    lambda c, x: block(c, x, T - 1), carry, None, length=n_blocks
                )
                hists.append(h.reshape(n_blocks * T, n))
            if rem:
                carry, h = block(carry, None, rem - 1)
                hists.append(h)
            loss_hist = jnp.concatenate(hists, axis=0)

        xhr = carry[0][0] if C == 1 else jnp.concatenate([c[0] for c in carry])
        if not want_metrics:
            return convert_to_3D_rot(xhr), None, loss_hist
        # final-state metrics: a full exact pass at full-vertex semantics
        # (bypass any cheap-iter vertex subset so reported losses are the
        # reference-defined quantities)
        subh["sub"] = None
        _, (final_metrics, _) = loss_fn(xhr)
        return convert_to_3D_rot(xhr), final_metrics, loss_hist

    return fit


def make_fit_step(assets: SceneAssets, cfg: FitConfig, want_metrics: bool = True,
                  mesh=None):
    """Returns jitted fit(x72_init [N,72], cam_ext [N,4,4], scene_idx [N])
    -> (x72_fitted [N,72], final per-body metrics, per-iter loss hist).

    The asset pytree is a traced *argument* of the jit, not a closure
    (see _fit_program). want_metrics=False drops the final metrics pass
    (returns None in its slot) — see _fit_program. mesh: pass the device
    mesh when the population axis is sharded AND cfg.lbs_precision is
    'fused' — the fused Pallas call then runs under shard_map over the
    rows instead of forcing a GSPMD all-gather (ops/fused_skinning.py);
    the einsum tiers partition without it."""
    fit = jax.jit(_fit_program(cfg, want_metrics=want_metrics, fused_mesh=mesh))

    def bound(x72_init, cam_ext, scene_idx):
        return fit(assets, x72_init, cam_ext, scene_idx)

    return bound


def make_generate_fit_step(model, assets: SceneAssets, cfg: FitConfig, n_samples: int,
                           want_metrics: bool = True, mesh=None):
    """Sample a population for ONE snapshot and refine it as ONE compiled
    program — no host round-trip between the generator and the fitter
    (each separate dispatch costs ~40 ms through a dev tunnel and
    serializes the two programs' scheduling).

    Returns run(variables, xs [1,H,W,2], cam_int [1,3,3], max_d [1],
    cam_ext [N,4,4], scene_idx [N], key) -> (x72 [N,72], metrics, hist).
    want_metrics=False skips the final metrics pass (see _fit_program)."""
    from psi_tpu.gen.sample import _generate

    fit = _fit_program(cfg, want_metrics=want_metrics, fused_mesh=mesh)

    @jax.jit
    def run(assets_, variables, xs, cam_int, max_d, cam_ext, scene_idx, key):
        x72 = _generate(model, variables, xs, cam_int, max_d, n_samples, key)
        return fit(assets_, x72, cam_ext, scene_idx)

    def bound(variables, xs, cam_int, max_d, cam_ext, scene_idx, key):
        return run(assets, variables, xs, cam_int, max_d, cam_ext, scene_idx, key)

    return bound


def make_generate_fit_rows(model, assets: SceneAssets, cfg: FitConfig,
                           want_metrics: bool = True, mesh=None):
    """Coalesced-serving twin of make_generate_fit_step: sample per-row
    (row r conditioned on snapshot req_idx[r]) and refine, one program."""
    from psi_tpu.gen.sample import _generate_rows

    fit = _fit_program(cfg, want_metrics=want_metrics, fused_mesh=mesh)

    @jax.jit
    def run(assets_, variables, xs_stack, cam_int_stack, max_d_stack, req_idx,
            cam_ext_rows, sidx_rows, key):
        x72 = _generate_rows(model, variables, xs_stack, cam_int_stack, max_d_stack, req_idx, key)
        return fit(assets_, x72, cam_ext_rows, sidx_rows)

    def bound(variables, xs_stack, cam_int_stack, max_d_stack, req_idx,
              cam_ext_rows, sidx_rows, key):
        return run(assets, variables, xs_stack, cam_int_stack, max_d_stack, req_idx,
                   cam_ext_rows, sidx_rows, key)

    return bound


def fit_bodies(
    assets: SceneAssets,
    x72_init: jax.Array,
    cam_ext: jax.Array,
    scene_idx: jax.Array,
    cfg: Optional[FitConfig] = None,
):
    """One-shot convenience wrapper around make_fit_step."""
    cfg = cfg or FitConfig()
    return make_fit_step(assets, cfg)(x72_init, cam_ext, scene_idx)


def make_fit_step_carry_opt_state(assets: SceneAssets, cfg: FitConfig):
    """Reference-quirk mode: ONE Adam state shared serially across bodies.

    The reference constructs a single Adam optimizer per scene and loops
    over body pickles, resetting only the parameter value per body
    (``xhr_rec.data = ...``) while the moments and the bias-correction
    step count carry over (fitting_proxe.py:73-74,175). This mode
    replicates those semantics exactly — a lax.scan over bodies
    (serial, as the reference is) with the opt state threaded through —
    so the impact of the quirk can be *measured* against the clean
    fresh-state-per-body default (see PARITY.md). Not a production
    path: it serializes the population.
    """
    opt = optax.adam(cfg.init_lr_h)

    @jax.jit
    def fit(assets, x72_init, cam_ext, scene_idx):
        xhr_init_all = convert_to_6D_rot(x72_init)  # [N, 75]

        def one_body(opt_state, inputs):
            xhr_init1, cam1, sidx1 = inputs  # [75], [4,4], []

            def loss_fn(xhr):
                return _per_body_losses(
                    assets, xhr, xhr_init1[None], cam1[None], sidx1[None], cfg
                )

            def step(carry, _):
                xhr, opt_state = carry
                (_, (metrics, _)), grads = jax.value_and_grad(loss_fn, has_aux=True)(xhr)
                updates, opt_state = opt.update(grads, opt_state, xhr)
                return (optax.apply_updates(xhr, updates), opt_state), metrics["total"]

            (xhr, opt_state), _ = jax.lax.scan(
                step, (xhr_init1[None], opt_state), None, length=cfg.num_iter
            )
            return opt_state, xhr[0]

        opt_state0 = opt.init(xhr_init_all[0:1])
        _, xhr_all = jax.lax.scan(one_body, opt_state0, (xhr_init_all, cam_ext, scene_idx))
        _, (final_metrics, _) = _per_body_losses(
            assets, xhr_all, xhr_init_all, cam_ext, scene_idx, cfg
        )
        return convert_to_3D_rot(xhr_all), final_metrics

    def bound(x72_init, cam_ext, scene_idx):
        return fit(assets, x72_init, cam_ext, scene_idx)

    return bound


class FittingOP:
    """File-driven driver with reference-compatible pickle IO
    (fitting_proxe.py:167-263): reads body_gen_*.pkl dicts, fits the
    whole population in one program, writes refined pickles.
    """

    def __init__(
        self,
        assets: SceneAssets,
        cfg: FitConfig,
        scene_idx: int,
        verbose: bool = False,
        max_population: int = 512,
        cam_post: Optional[np.ndarray] = None,
    ):
        self.assets = assets
        self.cfg = cfg
        self.scene_idx = scene_idx
        self.verbose = verbose
        # Optional right-composed 4x4 applied to every cam_ext before the
        # loss transforms. The Habitat driver passes HABITAT_T_MAT here,
        # matching the reference's trans = cam_ext @ T_mat
        # (fitting_habitat.py:177-184, utils_eval_collision_habitat.py:163-168).
        self.cam_post = None if cam_post is None else np.asarray(cam_post, np.float32).reshape(4, 4)
        # chunk very large populations to bound HBM (verts + autodiff
        # residuals scale with N); chunks pad to max_population so ONE
        # compiled program serves every chunk.
        self.max_population = max_population
        self._fit = make_fit_step(assets, cfg)

    def fit_population(self, x72: np.ndarray, cam_ext: np.ndarray):
        n = x72.shape[0]
        if self.cam_post is not None:
            cam_ext = np.asarray(cam_ext, np.float32) @ self.cam_post
        if n <= self.max_population:
            scene_idx = jnp.full((n,), self.scene_idx, jnp.int32)
            x_fitted, metrics, hist = self._fit(jnp.asarray(x72), jnp.asarray(cam_ext), scene_idx)
            if self.verbose:
                # per-iteration mean loss trace (fitting_proxe.py:183-186 prints
                # per-iter losses; here one line per iter over the population)
                for ii, row in enumerate(np.asarray(hist)):
                    print(f"[INFO][fitting] iter={ii:d}, mean_total={float(row.mean()):f}")
            return np.asarray(x_fitted), {k: np.asarray(v) for k, v in metrics.items()}

        cap = self.max_population
        outs, mets = [], []
        for lo in range(0, n, cap):
            chunk = x72[lo : lo + cap]
            cams = cam_ext[lo : lo + cap]
            pad = cap - chunk.shape[0]
            if pad:  # pad to the compiled shape; padded rows are discarded
                chunk = np.concatenate([chunk, np.repeat(chunk[-1:], pad, 0)], 0)
                cams = np.concatenate([cams, np.repeat(cams[-1:], pad, 0)], 0)
            scene_idx = jnp.full((cap,), self.scene_idx, jnp.int32)
            x_fitted, metrics, _ = self._fit(jnp.asarray(chunk), jnp.asarray(cams), scene_idx)
            keep = min(cap, n - lo)
            outs.append(np.asarray(x_fitted)[:keep])
            mets.append({k: np.asarray(v)[:keep] for k, v in metrics.items()})
        out = np.concatenate(outs, axis=0)
        merged = {k: np.concatenate([m[k] for m in mets], axis=0) for k in mets[0]}
        return out, merged

    def fitting_files(self, gen_dir: str, fit_dir: str, max_files: int = 1200) -> int:
        """Batch-read body_gen_{i:06d}.pkl, fit all at once, write results.
        Skips outputs that already exist (idempotent resume,
        fitting_proxe.py:257-260). Returns number fitted."""
        from psi_tpu.geometry.bodyvec import body_params_parse

        items = []
        for ii in range(max_files):
            inp = os.path.join(gen_dir, f"body_gen_{ii:06d}.pkl")
            out = os.path.join(fit_dir, f"body_gen_{ii:06d}.pkl")
            if not os.path.exists(inp) or os.path.exists(out):
                continue
            with open(inp, "rb") as f:
                d = pickle.load(f)
            items.append((ii, d))
        if not items:
            return 0

        x72 = np.concatenate([np.asarray(body_params_parse(d)) for _, d in items], axis=0)
        # reference pkls store cam_ext tiled [n_samples,4,4]; the parser
        # keeps row 0 (cvae.py body_params_parse_fitting takes [:1])
        cam_ext = np.concatenate(
            [np.asarray(d["cam_ext"], np.float32).reshape(-1, 4, 4)[:1] for _, d in items]
        )
        x_fitted, _ = self.fit_population(x72, cam_ext)

        os.makedirs(fit_dir, exist_ok=True)
        from psi_tpu.geometry.bodyvec import body_params_encapsulate_list

        out_list = body_params_encapsulate_list(x_fitted)
        for (ii, d), rec in zip(items, out_list):
            rec["cam_ext"] = np.asarray(d["cam_ext"])
            rec["cam_int"] = np.asarray(d.get("cam_int"))
            with open(os.path.join(fit_dir, f"body_gen_{ii:06d}.pkl"), "wb") as f:
                pickle.dump(rec, f)
        return len(items)
