"""Sweep the fused-skinning vertex tile size _VT on the real TPU.

Round-5: the cheap-iteration floor decomposition
(scripts/profile_cheap_iter.py, ROUND_NOTES.md) attributed 1.61 of the
2.77 ms cheap iteration to the fused decode kernel fwd+bwd, with the
backward ~1.4x the forward. The bwd kernel runs ~30 MXU dots per
256-vertex tile x 41 tiles; at the measured wall that is ~0.8 us/dot —
per-dot pipeline overhead, not FLOPs (33 GFLOP total => ~0.2 ms at
peak). Larger tiles halve/quarter the dot count at the cost of bigger
VMEM blocks and pad waste.

Because _VT is read at import time, each tile size runs in a fresh
subprocess. Per size: isolated kernel fwd and fwd+bwd walls (20-iter
scans, median of groups), then the in-context production fit A/B
(round-4 lesson: isolated wins can be in-context losses).

    python scripts/profile_fused_vt.py            # orchestrates subprocesses
    python scripts/profile_fused_vt.py --child    # one measurement (called by parent)
"""

import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

B, V, J, L = 256, 10475, 55, 10
NUM_ITER = 20
GROUPS, REPS = 8, 2


def child():
    import jax
    import jax.numpy as jnp
    import numpy as np

    from psi_tpu.data.synthetic import (
        make_synthetic_assets, random_body_batch, random_camera_batch,
    )
    from psi_tpu.fit.fitting import make_fit_step
    from psi_tpu.ops import fused_skinning as fs
    from psi_tpu.utils.config import FitConfig

    vt = fs._VT
    rng = np.random.default_rng(0)
    C = 1 + L + (J - 1) * 9

    # --- isolated kernel: scan of fwd / fwd+bwd over NUM_ITER steps ---
    bundle = fs.make_skinning_bundle(
        jnp.asarray(rng.normal(size=(V, 3)), jnp.float32),
        jnp.asarray(rng.normal(size=(V, 3, L)) * 1e-2, jnp.float32),
        jnp.asarray(rng.normal(size=((J - 1) * 9, V * 3)) * 1e-3, jnp.float32),
        jax.nn.softmax(jnp.asarray(rng.normal(size=(V, J)), jnp.float32), axis=1),
    )
    cb0 = jnp.asarray(rng.normal(size=(B, C)), jnp.float32)
    A12 = jnp.asarray(rng.normal(size=(B, J, 12)), jnp.float32)
    cam12 = jnp.asarray(rng.normal(size=(B, 12)), jnp.float32)

    @jax.jit
    def scan_fwd(cb):
        def step(c, _):
            v = fs.fused_skinning_apply(c, A12, cam12, bundle)
            return c + 1e-6 * v.mean(axis=(1, 2), keepdims=False)[:, None], None
        return jax.lax.scan(step, cb, None, length=NUM_ITER)[0]

    @jax.jit
    def scan_grad(cb):
        def loss(c):
            return fs.fused_skinning_apply(c, A12, cam12, bundle).mean()
        def step(c, _):
            g = jax.grad(loss)(c)
            return c - 1e-3 * g, None
        return jax.lax.scan(step, cb, None, length=NUM_ITER)[0]

    def timeit(fn, x):
        fn(x).block_until_ready()
        dts = []
        for _ in range(GROUPS):
            t0 = time.time()
            for r in range(REPS):
                out = fn(x + r * 1e-3)
            out.block_until_ready()
            dts.append((time.time() - t0) / REPS)
        return float(np.median(dts))

    t_fwd = timeit(scan_fwd, cb0)
    t_grad = timeit(scan_grad, cb0)

    # --- in-context: the production fit program ---
    assets, _ = make_synthetic_assets(
        num_verts=V, num_joints=J, num_scenes=4, sdf_dim=128,
        scene_points=20000, n_contact=1455, seed=0, sdf_dtype=jnp.bfloat16,
    )
    cam_ext = jnp.asarray(random_camera_batch(rng, B)[0])
    scene_idx = jnp.zeros((B,), jnp.int32)
    max_d = np.full((B,), 5.0, np.float32)
    xs = [jnp.asarray(random_body_batch(rng, B, max_d)) for _ in range(GROUPS * REPS)]
    fit = make_fit_step(assets, FitConfig.production(num_iter=NUM_ITER), want_metrics=False)
    out = fit(xs[0], cam_ext, scene_idx)[0]
    out.block_until_ready()
    x_ref = np.asarray(out)
    dts = []
    k = 0
    for _ in range(GROUPS):
        t0 = time.time()
        for _ in range(REPS):
            out = fit(xs[k], cam_ext, scene_idx)[0]
            k += 1
        out.block_until_ready()
        dts.append((time.time() - t0) / REPS)
    t_fit = float(np.median(dts))

    print(json.dumps({
        "vt": vt,
        "merged": fs._MERGED,
        "fwd_ms_iter": round(t_fwd / NUM_ITER * 1e3, 3),
        "fwdbwd_ms_iter": round(t_grad / NUM_ITER * 1e3, 3),
        "fit_ms_iter": round(t_fit / NUM_ITER * 1e3, 3),
        "fit_bodies_s": round(B / t_fit, 1),
        "fit_spread": [round(x / NUM_ITER * 1e3, 3) for x in (min(dts), max(dts))],
        "x_checksum": float(np.abs(x_ref).mean()),
    }))


def main():
    if "--child" in sys.argv:
        child()
        return
    # (vt, merged, vmem_mb): pass combos as "512:1:64" args, default sweep below
    combos = [
        tuple(a.split(":")) for a in sys.argv[1:] if ":" in a
    ] or [(vt, m, "0") for vt in (256, 512, 1024) for m in ("0", "1")]
    for vt, merged, vmem in combos:
            env = dict(os.environ, PSI_FUSED_VT=str(vt), PSI_FUSED_MERGED=str(merged),
                       PSI_FUSED_VMEM_MB=str(vmem))
            try:
                # a healthy child takes ~4-6 min; a tunnel stall sits at
                # ~0 CPU forever — bound it so one stall doesn't eat the run
                r = subprocess.run(
                    [sys.executable, os.path.abspath(__file__), "--child"],
                    env=env, capture_output=True, text=True, timeout=900,
                )
            except subprocess.TimeoutExpired:
                print(json.dumps({"vt": vt, "merged": merged, "error": "timeout 900s"}),
                      flush=True)
                continue
            line = [l for l in r.stdout.splitlines() if l.startswith("{")]
            if line:
                print(line[-1], flush=True)
            else:
                print(json.dumps({"vt": vt, "merged": merged,
                                  "error": (r.stderr or r.stdout)[-400:]}), flush=True)


if __name__ == "__main__":
    main()
