"""Configuration dataclasses — one typed tree replacing the reference's
three config mechanisms (argparse + setattr'd dicts + .ini files,
reference: source/train_s1.py:345-423). CLI overrides map 1:1 onto the
reference's flags (see psi_tpu.cli).
"""

from __future__ import annotations

import dataclasses
import json
from typing import Optional, Tuple


@dataclasses.dataclass(frozen=True)
class LossConfig:
    """Loss weights (reference train_s1.py:416-423, train_js.sh:9-27)."""

    weight_loss_rec_h: float = 1.0
    weight_loss_vposer: float = 1e-3
    weight_loss_kl: float = 0.1
    weight_contact: float = 1e-2
    weight_collision: float = 1e-1
    loss_weight_anealing: bool = True  # reference spelling kept in CLI
    contact_denom_offset: float = 1.0
    # contact-chamfer candidate pruning for the TRAINING loss, same
    # scheme as FitConfig.prune_scene_points (K nearest scene points to
    # the batch's contact centroid feed the NN kernel). Default 0 =
    # exact reference semantics; set ~1024 for faster steps (NN winners
    # preserved in practice, tests/test_fit_prune.py).
    prune_scene_points: int = 0


@dataclasses.dataclass(frozen=True)
class TrainConfig:
    """Training loop configuration (reference train_s1.py:392-413)."""

    model_type: str = "s1"  # 's1' | 's2'
    image_size: int = 128  # snapshot canvas side (batch_gen_hdf5.py:359)
    batch_size: int = 32
    epoch: int = 30
    init_lr_h: float = 3e-4
    latentD: int = 256
    use_cont_rot: bool = True
    save_dir: str = "checkpoints"
    resume_training: bool = True
    saving_per_hours: float = 2.0  # wall-clock checkpoint cadence (train_s1.py:303-310)
    saving_per_epochs: int = 10  # epoch checkpoint cadence (train_s1.py:316-321)
    contact_part: Tuple[str, ...] = (
        "back", "butt", "L_Hand", "R_Hand", "L_Leg", "R_Leg", "thighs",
    )
    verbose: bool = True
    seed: int = 0
    # data paths (None -> synthetic fixture)
    train_data_path: Optional[str] = None
    scene_verts_path: Optional[str] = None
    scene_sdf_path: Optional[str] = None
    human_model_path: Optional[str] = None
    vposer_ckpt_path: Optional[str] = None
    contact_id_folder: Optional[str] = None
    scene_model_ckpt: Optional[str] = None
    # optimizer robustness (off by default = reference parity; the raw
    # Adam + exp(logvar) KL objective can spike early in training)
    grad_clip_norm: Optional[float] = None
    # run each epoch as chunked lax.scan programs (zero per-step host
    # trips within a chunk). scan_chunk_size bounds device memory: only
    # chunk_size batches are stacked on device at once (a whole PROX
    # epoch of 128x128x2 snapshots would be GBs of HBM). Leftover
    # batches (< chunk) run through the per-step path — identical
    # semantics, the per-batch key sequence is shared.
    scan_epoch: bool = False
    scan_chunk_size: int = 32
    # stage snapshot images to the device in bfloat16 (half the
    # host->device bytes per chunk; the model upcasts to f32 on entry).
    # Lossy for the depth channel at ~3 decimal digits — opt-in.
    stage_bf16: bool = False
    # parallelism
    num_devices: Optional[int] = None  # None -> all available

    @property
    def n_dim_body(self) -> int:
        return 75 if self.use_cont_rot else 72


@dataclasses.dataclass(frozen=True)
class FitConfig:
    """Fitting refinement configuration (reference fitting_proxe.py:227-247).

    The dataclass DEFAULTS are the reference-exact loss semantics (full
    NN search + real SDF gathers every iteration, split-bf16 LBS) — the
    parity contract for library callers. Every user-facing entry point
    (cli.fitting, cli.serve, the serving engine, bench.py, demo.py)
    defaults to ``FitConfig.production()`` — the selection-refresh +
    fused-Pallas-LBS configuration protocol-validated score-identical
    to exact at both protocol shapes (EVAL_SYNTH.md round 3/4) at ~3x
    the throughput — with an ``--exact`` escape hatch mapping to
    ``FitConfig.exact()``.
    """

    init_lr_h: float = 0.1
    num_iter: int = 20
    weight_loss_rec: float = 1.0
    weight_loss_vposer: float = 0.01
    weight_contact: float = 0.1
    weight_collision: float = 0.5
    contact_denom_offset: float = 0.01  # 1.0 for habitat (fitting_habitat.py:141)
    # contact chamfer: per-iteration candidate pruning — keep the ~K
    # scene points nearest each body's contact centroid before the NN
    # kernel, selected tile-granularly over the Morton-ordered scene
    # cloud (ops/prune.py::select_near_tiles — dense reduces + one tiny
    # exact top_k + one-hot MXU fetch; the earlier approx_min_k
    # formulation lowered to the ApproxTopK custom call, which
    # hard-faulted the TPU inside some refresh-scan structures). The
    # selection re-runs every full pass with K >> the NN's
    # centroid-distance rank; fitted-parameter equality vs the exact
    # path is asserted in tests/test_fit_prune.py and at protocol scale
    # in EVAL_SYNTH.md. 0 = exact full set. Default 2048, NOT 1024:
    # K=1024 compiles 50-iter refresh-block programs at population
    # >=200 into a TPU hard-fault (a compiler/runtime bug bisected in
    # round 3 — every selection formulation faulted at K=1024 while
    # K=2048 and prune=0 run clean; see ops/prune.py).
    prune_scene_points: int = 2048
    # rematerialize the VPoser-decode -> LBS chain in the backward pass
    # instead of storing its [N, V, ...] residuals (HBM-bound path —
    # trades MXU FLOPs, which are underutilized here, for HBM traffic)
    remat_decode: bool = False
    # selection-refresh mode (refresh_every > 1): a FULL loss pass — one
    # real packed-grid gather per vertex (the gather-engine-latency-bound
    # cost) and a tile-pruned NN search over the scene cloud — runs only
    # every refresh_every-th fit iteration. In between, the collision
    # term re-evaluates EVERY vertex against the frozen trilinear patch
    # of the grid cell it occupied at the last refresh (corner rows are
    # carried from the refresh gather; ops/sdf.py::sdf_trilinear_from_cache)
    # and the contact term evaluates |x - y_nn|^2 against each contact
    # vert's frozen NN scene point (the ICP-style majorizer of the true
    # NN distance; ops/chamfer.py::chamfer_one_sided_nn). Cheap iters
    # are therefore pure dense math — no NN search, no gathers, no
    # scatters. Exact at each refresh point; between refreshes the error
    # is second-order in the per-iter vertex displacement (cells are
    # ~4-6cm; Adam moves verts ~mm/iter) and the contact majorizer is an
    # upper bound. Accuracy vs the every-iter path is measured in
    # scripts/validate_refresh_fit.py and tests/test_fit_refresh.py.
    # 1 disables (full pass every iteration, exact reference path).
    refresh_every: int = 1
    # first refresh_warmup iterations always run the full pass: Adam's
    # early steps are the largest (~lr per coordinate regardless of
    # gradient scale), so frozen state is stalest exactly then; freezing
    # only after the step size settles keeps the cheap iters honest.
    refresh_warmup: int = 4
    # LBS precision inside the fit loss: 'high' = split-bf16 (~16-bit
    # mantissa, sub-0.1mm verts) — the parity-grade default; 'fast' =
    # single-pass bf16 MXU with f32 accumulation for the three
    # FLOP-heavy LBS contractions (~2^-8-relative ≈ mm-scale vertex
    # error — well under the SDF cell size and the contact-loss scale;
    # protocol-score impact measured in PARITY.md); 'fused' = the whole
    # LBS vertex path (blendshapes + skinning + transl + camera) as ONE
    # Pallas kernel at the 'fast' precision tier — removes the [N,V,*]
    # HBM intermediates that floor the cheap iterations
    # (ops/fused_skinning.py; accuracy/throughput record in PARITY.md).
    lbs_precision: str = "high"
    # Packed-SDF gather cadence WITHIN the full passes. The gather is
    # the gather-engine-latency-bound half of a full pass (~8ns/index x
    # N*V indices, scripts/profile_gather.py); the NN search is the
    # other half. With refresh_every=10 / warmup=4 at num_iter=20, 4 of
    # the 6 full passes are warmup — so the warmup gathers dominate.
    # sdf_warmup_gathers=False keeps the real gather at iter 0 and at
    # every post-warmup refresh, but warmup iters 1..w-1 re-use the
    # iter-0 cell cache for the collision term (NN correspondences are
    # still re-searched every warmup iter — those DO move fast early).
    # The frozen patch is the cell's trilinear extrapolation: first-
    # order-exact in the displacement, and |grad SDF| ~= 1 keeps it
    # honest several cells out. Protocol-validated at both shapes
    # (EVAL_SYNTH.md round 3): PROX-E 655 -> 882 bodies/s, MP3D-R
    # 400 -> 480, non-collision identical to 4 decimals, contact within
    # the +-0.003 variant noise band — hence the False default (only
    # consulted when refresh_every > 1; exact mode is untouched).
    sdf_warmup_gathers: bool = False
    # Vertex-subset cheap iterations. profile_lbs.py attributes the
    # cheap-iter floor (~5.9 ms at N=256) almost entirely to the
    # VPoser->LBS chain, whose three dominant stages (pose-corrective
    # matmul, skinning blend, camera transform) all scale with the
    # number of vertex ROWS decoded. Cached-SDF iterations only consume
    # verts through (a) the contact term (the 1455 contact_vids) and
    # (b) the collision term — and (b) tolerates a body-covering
    # subset between the exact full passes, which still score every
    # vertex. cheap_collision_verts = K > 0 decodes contact_vids plus a
    # K-vertex subset on cached-SDF iterations — half stride-uniform,
    # half the rows with the most post-warmup penetration mass (joints
    # stay exact via the folded joint regressor,
    # body/lbs.py::joint_regressor_direct); the collision term then
    # averages over those rows. 0 = every vertex (reference semantics
    # on every iteration). Full/refresh passes are unaffected either
    # way. Protocol record (EVAL_SYNTH.md round 3, PROX-E shape,
    # identical initial samples): K=2048 gives +17-23% fit throughput
    # (883 -> ~1030-1090 bodies/s) with non-collision/entropy/contact-
    # TERM identical, but the thresholded contact INDICATOR pays
    # ~+0.013 (0.194 -> 0.206-0.217 across selection recipes) — hence
    # OPT-IN, default 0: the production config keeps reference-grade
    # scores and this knob is the documented next speed tier.
    cheap_collision_verts: int = 0
    # Software-pipeline the population over C independent chunks inside
    # every fit iteration. The full/exact passes are bound by the
    # gather ENGINE (the packed-SDF corner fetch, ~8 ns/row), which
    # scripts/probe_overlap.py measures as fully concurrent with dense
    # MXU/VPU work (overlap fraction ~1.0: 36.7 ms of gathers + 35.4 ms
    # of matmuls complete in 35.6 ms when data-independent). Splitting
    # the body axis into C chunks makes each iteration C independent
    # chains, so XLA's latency-hiding scheduler can run chunk A's
    # gather under chunk B's LBS/NN/backward math. Per-body results are
    # unchanged (every loss term is per-body; chunking only re-groups
    # the batch dims — equality asserted in tests/test_fit_overlap.py).
    # 1 disables. Measured A/B on the real chip in ROUND_NOTES.md r5.
    overlap_chunks: int = 1

    @classmethod
    def production(cls, **overrides) -> "FitConfig":
        """The throughput configuration of record: selection-refresh
        blocks (full loss every 10th iter after a 4-iter NN-only warmup)
        + the fused Pallas decode+LBS kernel; 7.6 vs 32.2 ms/iter at
        bench shapes (scripts/profile_fused.py). Protocol-score cost
        quantified by 6-seed PAIRED runs vs exact (EVAL_SYNTH.md round
        5): non-collision bias ≤0.0009 absolute at both protocol
        shapes; contact bias +0.0060±0.0032 at PROX-E / −0.0035±0.0034
        at MP3D-R (95% CI) — 3–5% relative, well under the cross-seed
        spread of the metrics. Pair with bf16 packed SDF grids
        (make_assets(sdf_dtype=bfloat16)) for the full production
        stack. refresh_every=20 is a measured +17%-throughput opt-in
        whose PROX-E contact bias is 2.6x larger (same EVAL_SYNTH
        table); FitConfig.exact() restores reference semantics."""
        kw = dict(refresh_every=10, lbs_precision="fused")
        kw.update(overrides)
        return cls(**kw)

    @classmethod
    def exact(cls, **overrides) -> "FitConfig":
        """Reference-exact loss semantics (= the dataclass defaults,
        spelled explicitly): full scene-cloud NN search + real packed-
        grid SDF gathers every Adam iteration, split-bf16 ('high') LBS.
        prune_scene_points=2048 is kept — protocol-validated identical
        to the full scene cloud (EVAL_SYNTH.md); pass
        prune_scene_points=0 for the fully-exact NN search."""
        kw = dict(refresh_every=1, lbs_precision="high")
        kw.update(overrides)
        return cls(**kw)


def save_config(cfg, path: str) -> None:
    with open(path, "w") as f:
        json.dump(dataclasses.asdict(cfg), f, indent=2, default=str)


def load_config(cls, path: str):
    with open(path) as f:
        d = json.load(f)
    if "contact_part" in d and isinstance(d["contact_part"], list):
        d["contact_part"] = tuple(d["contact_part"])
    return cls(**d)
