"""Protocol-scale fit-config accuracy/throughput sweep (run on real TPU).

Runs the PROX-E evaluation protocol (4 scenes x 300 bodies, 20 Adam
iters each — test_proxe_s1.py:154 / fitting_proxe.py:233) once per fit
configuration from IDENTICAL initial CVAE samples, and reports for each:
the paper-protocol scores (non-collision, contact indicator, k-means
diversity), the mean final per-body loss terms (rec = L1-to-init,
contact, collision, total), and wall time. This is the protocol-scale
accuracy record behind FitConfig.{refresh_every, prune_scene_points,
lbs_precision} and the bf16-packed-SDF default in PARITY.md /
EVAL_SYNTH.md.

    python scripts/protocol_compare_refresh.py             # PROX-E shape
    python scripts/protocol_compare_refresh.py --habitat   # MP3D-R shape
    python scripts/protocol_compare_refresh.py --quick     # subset of variants
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

N_PER_SCENE = 300
N_SCENES = 4
NUM_ITER = 20

if "--habitat" in sys.argv:
    # MP3D-R protocol shape: 200 bodies/camera, 50 Adam iters,
    # contact denominator 1.0 (test_habitat_s1.py:240, fitting_habitat.py:141,253)
    N_PER_SCENE, NUM_ITER = 200, 50
DENOM = 1.0 if "--habitat" in sys.argv else 0.01


def main():
    from psi_tpu.data.synthetic import SyntheticBatchGenerator, make_synthetic_assets
    from psi_tpu.eval import collision_contact_scores, diversity_metrics
    from psi_tpu.fit import make_fit_step
    from psi_tpu.gen.sample import generate_bodies
    from psi_tpu.models import HumanCVAES1
    from psi_tpu.utils.config import FitConfig

    asset_kw = dict(
        num_verts=10475, num_joints=55, num_scenes=N_SCENES, sdf_dim=128,
        scene_points=20000, n_contact=1455, seed=0,
    )
    assets, _ = make_synthetic_assets(**asset_kw)
    assets_bf16, _ = make_synthetic_assets(**asset_kw, sdf_dtype=jnp.bfloat16)
    model = HumanCVAES1(latentD=256)
    variables = model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 75)), jnp.zeros((1, 128, 128, 2))
    )
    gen = SyntheticBatchGenerator(num_scenes=N_SCENES, batches_per_epoch=N_SCENES, seed=0)

    # identical initial populations for all modes
    inits = []
    for si in range(N_SCENES):
        b = gen.next_batch(1)
        x72 = generate_bodies(
            model, variables, jnp.asarray(b["xs"]), jnp.asarray(b["cam_int"]),
            jnp.asarray(b["max_d"]), N_PER_SCENE, jax.random.PRNGKey(100 + si),
        )
        cam_ext = jnp.asarray(np.tile(b["cam_ext"][0][None], (N_PER_SCENE, 1, 1)))
        inits.append((x72, cam_ext, jnp.full((N_PER_SCENE,), si, jnp.int32)))

    def eval_all(pops):
        # scores always against the f32 assets — the evaluation protocol
        # is fixed; only the FIT may use quantized grids
        nc, ct = [], []
        for x72, cam_ext, sidx in pops:
            s_nc, s_ct = collision_contact_scores(assets, x72, cam_ext, sidx)
            nc.append(float(s_nc))
            ct.append(float(s_ct))
        allx = np.concatenate([np.asarray(p[0]) for p in pops], axis=0)
        entropy, _ = diversity_metrics(allx)
        return float(np.mean(nc)), float(np.mean(ct)), float(entropy)

    nc0, ct0, ent0 = eval_all(inits)
    print(f"[pre-fit          ] non-collision={nc0:.4f} contact={ct0:.4f} entropy={ent0:.3f}",
          flush=True)

    def C(**kw):
        # legacy sweep rows predate the sdf_warmup_gathers=False default
        # (adopted from THIS sweep's record) — pin True here so each
        # row keeps measuring what its recorded EVAL_SYNTH.md entry
        # measured; the production row opts in explicitly below
        kw.setdefault("sdf_warmup_gathers", True)
        return FitConfig(num_iter=NUM_ITER, contact_denom_offset=DENOM, **kw)

    # (name, config, assets). prune_scene_points defaults to 2048, so
    # 'exact-full' (prune=0) is the true reference-exact run.
    variants = [
        ("exact-full       ", C(prune_scene_points=0), assets),
        ("exact-prune2048  ", C(), assets),
        ("refresh5         ", C(refresh_every=5), assets),
        ("refresh10        ", C(refresh_every=10), assets),
        # diagnostic variant, habitat shape only: at the PROX-E shape
        # (300 bodies, 20 iters) refresh10+prune0 compiles into the TPU
        # hard-fault that K=1024 triggers elsewhere (EVAL_SYNTH.md);
        # prune2048 passes at BOTH protocol shapes.
        *([("refresh10-prune0 ", C(refresh_every=10, prune_scene_points=0), assets)]
          if "--habitat" in sys.argv else []),
        ("refresh10-fastlbs", C(refresh_every=10, lbs_precision="fast"), assets),
        ("r10-fast-bf16sdf ", C(refresh_every=10, lbs_precision="fast"), assets_bf16),
        ("r5-fast-bf16sdf  ", C(refresh_every=5, lbs_precision="fast"), assets_bf16),
        # warmup-cadence sweep on the production stack: warmup full
        # passes carry the same per-iter cost as refreshes (packed-grid
        # gather + NN search), so shrinking the warmup from 4 to 2/3
        # removes 1-2 of the ~6 expensive iters if the scores hold
        ("r10w3-fast-bf16  ", C(refresh_every=10, refresh_warmup=3, lbs_precision="fast"), assets_bf16),
        ("r10w2-fast-bf16  ", C(refresh_every=10, refresh_warmup=2, lbs_precision="fast"), assets_bf16),
        # NN-only warmup: warmup iters keep the real NN search but ride
        # the iter-0 SDF cell cache (skips the gather-engine-bound
        # packed-grid fetch on warmup iters 1..w-1; FitConfig docs).
        # THE PRODUCTION CONFIG since round 3 (bench.py): PROX-E
        # 655 -> 882 bodies/s, MP3D-R 400 -> 480, scores held.
        ("r10-nosdfwarm    ", C(refresh_every=10, lbs_precision="fast",
                                sdf_warmup_gathers=False), assets_bf16),
        # fused Pallas decode+LBS (ops/fused_skinning.py): same bf16
        # numerics tier as 'fast' with the [N,V,*] HBM intermediates
        # eliminated — measured 10.42 -> 7.75 ms/iter at bench shapes
        # (scripts/profile_fused.py round 4). THE PRODUCTION CONFIG
        # since round 4 if this row's scores hold vs r10-nosdfwarm.
        ("r10-nosw-fused   ", C(refresh_every=10, lbs_precision="fused",
                                sdf_warmup_gathers=False), assets_bf16),
        # vertex-subset cheap iterations (FitConfig.cheap_collision_verts):
        # cached-SDF iters decode contact_vids + a stride-uniform 2048-
        # vertex subset; full passes still score every vertex. The
        # dominant cheap-iter stages scale with decoded rows
        # (scripts/profile_lbs.py).
        ("r10-nosw-sub2048 ", C(refresh_every=10, lbs_precision="fast",
                                sdf_warmup_gathers=False,
                                cheap_collision_verts=2048), assets_bf16),
        ("r10-nosw-sub1024 ", C(refresh_every=10, lbs_precision="fast",
                                sdf_warmup_gathers=False,
                                cheap_collision_verts=1024), assets_bf16),
        ("r10-nosw-sub4096 ", C(refresh_every=10, lbs_precision="fast",
                                sdf_warmup_gathers=False,
                                cheap_collision_verts=4096), assets_bf16),
        # diagnostic: identity stride (no subsampling) isolates the
        # subset MACHINERY (joints_direct, contact-row exclusion) from
        # the subsampling itself
        ("r10-nosw-suball  ", C(refresh_every=10, lbs_precision="fast",
                                sdf_warmup_gathers=False,
                                cheap_collision_verts=10475), assets_bf16),
    ]
    if "--quick" in sys.argv:
        variants = [v for v in variants if v[0].strip() in
                    ("exact-prune2048", "refresh5", "r10-fast-bf16sdf")]
    if "--only" in sys.argv:  # resume after an infra fault: comma-sep names
        keep = set(sys.argv[sys.argv.index("--only") + 1].split(","))
        variants = [v for v in variants if v[0].strip() in keep]

    for name, cfg, a in variants:
        fit = make_fit_step(a, cfg)
        # warmup compile on scene 0 shapes
        out = fit(*inits[0])[0]
        out.block_until_ready()
        t0 = time.time()
        fitted, finals = [], []
        for x72, cam_ext, sidx in inits:
            xf, m, _ = fit(x72, cam_ext, sidx)
            fitted.append((xf, cam_ext, sidx))
            finals.append(m)
        fitted[-1][0].block_until_ready()
        wall = time.time() - t0
        nc, ct, ent = eval_all(fitted)
        mean = {k: float(np.mean([np.asarray(m[k]) for m in finals])) for k in finals[0]}
        print(
            f"[{name}] non-collision={nc:.4f} contact={ct:.4f} entropy={ent:.3f} "
            f"wall={wall:.1f}s ({N_SCENES * N_PER_SCENE / wall:.0f} bodies/s fit-only) | "
            f"rec={mean['rec']:.4f} cont={mean['contact']:.4f} "
            f"coll={mean['collision']:.4f} total={mean['total']:.4f}",
            flush=True,
        )


if __name__ == "__main__":
    main()
