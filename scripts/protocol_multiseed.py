"""Multi-seed production-vs-exact equivalence at the MP3D-R shape (real TPU).

Round-4 verdict weak #6: the habitat-shape contact delta (0.1212 fused
vs 0.1262 exact) was asserted inside a "±0.005 variant noise band"
measured from few runs — the delta EQUALS the band, so bias-vs-noise
was unresolved. This runs >=5 seeds of the production config
(FitConfig.production() + bf16 packed SDF) against the exact anchor
(FitConfig.exact(), f32 assets) from IDENTICAL per-seed initial
populations at the MP3D-R protocol shape (200 bodies/scene x 4 scenes,
50 Adam iters, contact denominator 1.0 — test_habitat_s1.py:240,
fitting_habitat.py:141,253), and reports per-seed scores plus the
paired mean +/- 95% CI of the production-minus-exact delta for both
protocol metrics (utils_eval_collision_habitat.py:131-140).

    python scripts/protocol_multiseed.py [--seeds K] [--proxe]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

N_PER_SCENE, N_SCENES, NUM_ITER, DENOM = 200, 4, 50, 1.0
if "--proxe" in sys.argv:
    N_PER_SCENE, NUM_ITER, DENOM = 300, 20, 0.01
N_SEEDS = int(sys.argv[sys.argv.index("--seeds") + 1]) if "--seeds" in sys.argv else 6


def main():
    from psi_tpu.data.synthetic import SyntheticBatchGenerator, make_synthetic_assets
    from psi_tpu.eval import collision_contact_scores
    from psi_tpu.fit import make_fit_step
    from psi_tpu.gen.sample import generate_bodies
    from psi_tpu.models import HumanCVAES1
    from psi_tpu.utils.config import FitConfig

    asset_kw = dict(num_verts=10475, num_joints=55, num_scenes=N_SCENES, sdf_dim=128,
                    scene_points=20000, n_contact=1455, seed=0)
    assets, _ = make_synthetic_assets(**asset_kw)
    assets_bf16, _ = make_synthetic_assets(**asset_kw, sdf_dtype=jnp.bfloat16)
    model = HumanCVAES1(latentD=256)
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 75)),
                           jnp.zeros((1, 128, 128, 2)))
    gen = SyntheticBatchGenerator(num_scenes=N_SCENES, batches_per_epoch=N_SCENES, seed=0)
    scene_batches = [gen.next_batch(1) for _ in range(N_SCENES)]

    cfg_exact = FitConfig.exact(num_iter=NUM_ITER, contact_denom_offset=DENOM)
    fits = {"exact": make_fit_step(assets, cfg_exact)}
    # --refresh "10,15,20" adds one production variant per cadence
    # (default: the production default alone)
    cadences = [int(x) for x in (
        sys.argv[sys.argv.index("--refresh") + 1].split(",")
        if "--refresh" in sys.argv else ["10"]
    )]
    for r in cadences:
        cfg = FitConfig.production(num_iter=NUM_ITER, contact_denom_offset=DENOM,
                                   refresh_every=r)
        fits[f"prod_r{r}"] = make_fit_step(assets_bf16, cfg)

    def run_seed(seed):
        rows = {name: [] for name in fits}
        for si, b in enumerate(scene_batches):
            x72 = generate_bodies(
                model, variables, jnp.asarray(b["xs"]), jnp.asarray(b["cam_int"]),
                jnp.asarray(b["max_d"]), N_PER_SCENE,
                jax.random.PRNGKey(1000 * seed + si),
            )
            cam_ext = jnp.asarray(np.tile(b["cam_ext"][0][None], (N_PER_SCENE, 1, 1)))
            sidx = jnp.full((N_PER_SCENE,), si, jnp.int32)
            for name, fit in fits.items():
                xf = fit(x72, cam_ext, sidx)[0]
                # scores always against the fixed f32 protocol assets
                s_nc, s_ct = collision_contact_scores(assets, xf, cam_ext, sidx)
                rows[name].append((float(s_nc), float(s_ct)))
        out = {}
        for name, vals in rows.items():
            out[name] = (float(np.mean([v[0] for v in vals])),
                         float(np.mean([v[1] for v in vals])))
        return out

    per_seed = []
    t0 = time.time()
    for s in range(N_SEEDS):
        r = run_seed(s)
        per_seed.append(r)
        parts = [f"{n} nc={r[n][0]:.4f} ct={r[n][1]:.4f}" for n in fits]
        print(f"[seed {s}] " + " | ".join(parts), flush=True)
    wall = time.time() - t0

    def ci(vals):
        v = np.asarray(vals, np.float64)
        m = v.mean()
        # t-critical for small K (two-sided 95%): 2.571 @ df=5, 2.776 @ df=4
        tcrit = {4: 2.776, 5: 2.571, 6: 2.447, 7: 2.365, 8: 2.306, 9: 2.262}.get(
            len(v) - 1, 1.96)
        half = tcrit * v.std(ddof=1) / np.sqrt(len(v)) if len(v) > 1 else float("nan")
        return m, half

    for metric, idx in (("non-collision", 0), ("contact", 1)):
        e_m, e_h = ci([r["exact"][idx] for r in per_seed])
        print(f"{metric:>13}: exact {e_m:.4f}±{e_h:.4f}", flush=True)
        for name in fits:
            if name == "exact":
                continue
            p_m, p_h = ci([r[name][idx] for r in per_seed])
            d_m, d_h = ci([r[name][idx] - r["exact"][idx] for r in per_seed])
            verdict = "within CI (no detectable bias)" if abs(d_m) <= d_h else "BIASED"
            print(f"{'':>13}  {name} {p_m:.4f}±{p_h:.4f}  "
                  f"paired delta {d_m:+.4f}±{d_h:.4f}  -> {verdict}", flush=True)
    print(f"seeds={N_SEEDS} shape={'PROX-E' if '--proxe' in sys.argv else 'MP3D-R'} "
          f"wall={wall:.0f}s", flush=True)


if __name__ == "__main__":
    main()
