"""Two-stage model (HumanCVAES2) through the FULL protocol on real TPU.

The reference's headline model is the two-stage CVAE
(source/test_proxe_s2.py:104-134, train_s2.py:262-266). Round-2 verdict:
it was built, converter-parity-tested and served, but never run through
the protocol end to end. This script does exactly that, mirroring the
s1 records in EVAL_SYNTH.md:

1. TRAIN from scratch at full scale on synthetic data (batch 32, the
   six-term objective with the s2 double-KL, scan-epoch mode) and print
   the convergence curve;
2. GENERATE 4 scenes x 300 bodies from the trained model;
3. FIT each population (production refresh config AND reference-exact);
4. EVALUATE with the paper protocol (non-collision, contact, k-means
   entropy) pre- and post-fit.

    python scripts/protocol_s2.py [--steps N]
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
STEPS = 200
if "--steps" in sys.argv:
    STEPS = int(sys.argv[sys.argv.index("--steps") + 1])


def main():
    from psi_tpu.data.synthetic import SyntheticBatchGenerator, make_synthetic_assets
    from psi_tpu.eval import collision_contact_scores, diversity_metrics
    from psi_tpu.fit import make_fit_step
    from psi_tpu.gen.sample import generate_bodies
    from psi_tpu.train import TrainOP
    from psi_tpu.utils.config import FitConfig, LossConfig, TrainConfig

    asset_kw = dict(
        num_verts=10475, num_joints=55, num_scenes=N_SCENES, sdf_dim=128,
        scene_points=20000, n_contact=1455, seed=0,
    )
    assets, _ = make_synthetic_assets(**asset_kw)
    # production fit stack uses bf16 corner-packed SDF grids; evaluation
    # always runs the fixed f32 protocol (assets above)
    assets_bf16, _ = make_synthetic_assets(**asset_kw, sdf_dtype=jnp.bfloat16)
    t0 = time.time()

    # ---- 1. train s2 from scratch (mirrors the s1 record in EVAL_SYNTH.md) ----
    batches_per_epoch = 25
    epochs = max(1, STEPS // batches_per_epoch)
    cfg = TrainConfig(
        model_type="s2", latentD=256, batch_size=32, epoch=epochs,
        save_dir="/tmp/s2_protocol_ckpt", saving_per_epochs=epochs,
        verbose=False, grad_clip_norm=1.0, scan_epoch=True, scan_chunk_size=25,
        resume_training=False,
    )
    op = TrainOP(cfg, LossConfig(), assets)
    gen = SyntheticBatchGenerator(num_scenes=N_SCENES, batches_per_epoch=batches_per_epoch, seed=0)

    import json
    metrics_path = os.path.join(cfg.save_dir, "metrics.jsonl")
    if os.path.exists(metrics_path):
        os.remove(metrics_path)
    op.train(gen)
    rows = [json.loads(l) for l in open(metrics_path)]
    print(f"[train s2] {len(rows)} steps, wall {time.time() - t0:.0f}s", flush=True)
    for i in (0, len(rows) // 4, len(rows) // 2, len(rows) - 1):
        r = rows[i]
        print(
            f"  step {i:4d}: total={r['loss']:.3f} rec_t={r['rec_t']:.3f} "
            f"rec_p={r['rec_p']:.3f} kl={r['kl']:.3f}",
            flush=True,
        )

    variables = {"params": op.state.params, "batch_stats": op.state.batch_stats}
    model = op.model

    # ---- 2. generate 4 x 300 ----
    sgen = SyntheticBatchGenerator(num_scenes=N_SCENES, batches_per_epoch=N_SCENES, seed=0)
    inits = []
    for si in range(N_SCENES):
        b = sgen.next_batch(1)
        x72 = generate_bodies(
            model, variables, jnp.asarray(b["xs"]), jnp.asarray(b["cam_int"]),
            jnp.asarray(b["max_d"]), N_PER_SCENE, jax.random.PRNGKey(100 + si),
        )
        cam_ext = jnp.asarray(np.tile(b["cam_ext"][0][None], (N_PER_SCENE, 1, 1)))
        inits.append((x72, cam_ext, jnp.full((N_PER_SCENE,), si, jnp.int32)))

    def eval_all(pops):
        nc, ct = [], []
        for x72, cam_ext, sidx in pops:
            s_nc, s_ct = collision_contact_scores(assets, x72, cam_ext, sidx)
            nc.append(float(s_nc))
            ct.append(float(s_ct))
        allx = np.concatenate([np.asarray(p[0]) for p in pops], axis=0)
        entropy, _ = diversity_metrics(allx)
        return float(np.mean(nc)), float(np.mean(ct)), float(entropy)

    nc0, ct0, ent0 = eval_all(inits)
    print(f"[s2 pre-fit ] non-collision={nc0:.4f} contact={ct0:.4f} entropy={ent0:.3f}", flush=True)

    # ---- 3+4. fit (production refresh AND reference-exact) + eval ----
    for name, fcfg, fit_assets in (
        ("s2 exact   ", FitConfig(num_iter=NUM_ITER), assets),
        ("s2 refresh ", FitConfig(num_iter=NUM_ITER, refresh_every=5), assets),
        # the full production stack (refresh10 + fast-LBS + bf16 SDF),
        # the config bench.py ships — round-3 swept it on s1 only
        ("s2 prod    ", FitConfig(num_iter=NUM_ITER, refresh_every=10,
                                  lbs_precision="fast"), assets_bf16),
    ):
        fit = make_fit_step(fit_assets, fcfg)
        out = fit(*inits[0])[0]
        out.block_until_ready()
        tf = time.time()
        fitted = []
        for x72, cam_ext, sidx in inits:
            xf, _, _ = fit(x72, cam_ext, sidx)
            fitted.append((xf, cam_ext, sidx))
        fitted[-1][0].block_until_ready()
        wall = time.time() - tf
        nc, ct, ent = eval_all(fitted)
        print(
            f"[{name}] non-collision={nc:.4f} contact={ct:.4f} entropy={ent:.3f} "
            f"wall={wall:.1f}s ({N_SCENES * N_PER_SCENE / wall:.0f} bodies/s fit-only)",
            flush=True,
        )


if __name__ == "__main__":
    main()
