"""Serving soak: sustained mixed-size load through ServingQueue (real TPU).

Round-4 verdict weak #7: the queue was tested for coalescing
correctness and an 8-request burst, never for sustained load. This
drives the production serving stack (population 256,
FitConfig.production(), bf16 packed SDF, real shapes 10475v/128^3)
with mixed-size generate and generate+fit requests from several client
threads for >= 5 minutes, and reports:

  - per-30s-bucket request rate, p50/p99 end-to-end latency
  - queue depth sampled 1 Hz (max + mean per bucket)
  - host RSS every 10 s (leak check)
  - a 200-request malformed storm at the half-way mark (every future
    must fail cleanly; the next valid request must still complete)

    python scripts/soak_serve.py [--duration S] [--tiny]
"""

import os
import sys
import threading
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

DURATION = float(sys.argv[sys.argv.index("--duration") + 1]) if "--duration" in sys.argv else 330.0
TINY = "--tiny" in sys.argv


def rss_mb() -> float:
    with open("/proc/self/status") as f:
        for line in f:
            if line.startswith("VmRSS"):
                return int(line.split()[1]) / 1024.0
    return float("nan")


def make_snapshot(rng, depth):
    return {
        "xs": rng.normal(size=(1, 128, 128, 2)).astype(np.float32),
        "cam_int": np.eye(3, dtype=np.float32)[None] * 500,
        "cam_ext": np.eye(4, dtype=np.float32)[None],
        "max_d": np.asarray([depth], np.float32),
    }


def main():
    from psi_tpu.data.synthetic import make_synthetic_assets
    from psi_tpu.models import HumanCVAES1
    from psi_tpu.serve import GenerationEngine, ServingQueue
    from psi_tpu.utils.config import FitConfig

    if TINY:
        asset_kw = dict(num_verts=100, num_joints=12, num_scenes=2, sdf_dim=16,
                        scene_points=200, n_contact=32)
        population, num_iter = 16, 2
    else:
        asset_kw = dict(num_verts=10475, num_joints=55, num_scenes=4, sdf_dim=128,
                        scene_points=20000, n_contact=1455, sdf_dtype=jnp.bfloat16)
        population, num_iter = 256, 20
    assets, _ = make_synthetic_assets(**asset_kw, seed=0)
    mdl = HumanCVAES1(latentD=256)
    variables = mdl.init(jax.random.PRNGKey(0), jnp.zeros((1, 75)),
                         jnp.zeros((1, 128, 128, 2)))
    eng = GenerationEngine(mdl, variables, assets, population=population,
                           fit_cfg=FitConfig.production(num_iter=num_iter))
    t_warm = eng.warmup()
    print(f"warmup {t_warm:.1f}s  population={population} iters={num_iter}", flush=True)
    q = ServingQueue(eng)

    stop = threading.Event()
    lat_lock = threading.Lock()
    latencies = []  # (t_done, latency_s, fitted, rows)
    errors = []

    def client(cid):
        rng = np.random.default_rng(cid)
        pending = []
        while not stop.is_set():
            rows = int(rng.choice([1, 4, 16, 64]))
            fit = bool(rng.random() < 0.7)  # fit-heavy: the expensive path
            fut = q.submit(make_snapshot(rng, float(rng.uniform(3, 6))),
                           n_samples=rows, fit=fit)
            pending.append((fut, fit, rows))
            # bounded in-flight per client keeps offered load ~steady
            while len(pending) >= 4 and not stop.is_set():
                fut0, fit0, rows0 = pending.pop(0)
                try:
                    r = fut0.result(timeout=120)
                    with lat_lock:
                        latencies.append((time.time(), r.latency_s, fit0, rows0))
                except Exception as e:  # noqa: BLE001
                    with lat_lock:
                        errors.append(repr(e))
            time.sleep(0.002)
        for fut0, fit0, rows0 in pending:
            try:
                r = fut0.result(timeout=120)
                with lat_lock:
                    latencies.append((time.time(), r.latency_s, fit0, rows0))
            except Exception as e:  # noqa: BLE001
                with lat_lock:
                    errors.append(repr(e))

    depth_samples = []  # (t, qsize)
    rss_samples = []

    def monitor():
        i = 0
        while not stop.is_set():
            depth_samples.append((time.time(), q._q.qsize()))
            if i % 10 == 0:
                rss_samples.append((time.time(), rss_mb()))
            i += 1
            time.sleep(1.0)

    threads = [threading.Thread(target=client, args=(c,), daemon=True) for c in range(3)]
    mon = threading.Thread(target=monitor, daemon=True)
    t0 = time.time()
    mon.start()
    [t.start() for t in threads]

    # half-way malformed storm
    storm_done = {}
    time.sleep(DURATION / 2)
    rng = np.random.default_rng(999)
    storm_futs = []
    for k in range(200):
        kind = k % 4
        if kind == 0:
            f = q.submit(make_snapshot(rng, 5.0), n_samples=-3, fit=True)
        elif kind == 1:
            f = q.submit(make_snapshot(rng, 5.0), n_samples="many", fit=True)
        elif kind == 2:
            f = q.submit({"cam_int": np.eye(3, dtype=np.float32)}, n_samples=4)  # missing xs
        else:
            bad = make_snapshot(rng, 5.0)
            bad["xs"] = np.zeros((7,), np.float32)  # wrong rank
            f = q.submit(bad, n_samples=4, fit=False)
        storm_futs.append(f)
    failed = 0
    for f in storm_futs:
        try:
            f.result(timeout=60)
        except Exception:  # noqa: BLE001
            failed += 1
    # the queue must still serve a valid request after the storm
    ok = q.submit(make_snapshot(rng, 5.0), n_samples=8, fit=True).result(timeout=120)
    storm_done = {"malformed": len(storm_futs), "failed_cleanly": failed,
                  "post_storm_ok": bool(np.isfinite(ok.bodies).all())}
    print(f"[storm] {storm_done}", flush=True)

    time.sleep(max(0.0, DURATION - (time.time() - t0)))
    stop.set()
    [t.join(timeout=180) for t in threads]
    q.stop()
    wall = time.time() - t0

    # per-30s buckets
    print(f"{'bucket':>7} {'reqs':>5} {'p50_ms':>8} {'p99_ms':>8} {'maxdepth':>8} {'rss_mb':>8}")
    nb = int(np.ceil(wall / 30.0))
    for b in range(nb):
        lo, hi = t0 + 30 * b, t0 + 30 * (b + 1)
        ls = [l for (t, l, _, _) in latencies if lo <= t < hi]
        ds = [d for (t, d) in depth_samples if lo <= t < hi]
        rs = [r for (t, r) in rss_samples if lo <= t < hi]
        if not ls:
            continue
        print(f"{b:>7} {len(ls):>5} {np.percentile(ls, 50)*1e3:>8.1f} "
              f"{np.percentile(ls, 99)*1e3:>8.1f} {max(ds) if ds else 0:>8} "
              f"{rs[-1] if rs else float('nan'):>8.1f}", flush=True)

    ls = [l for (_, l, _, _) in latencies]
    fit_ls = [l for (_, l, f, _) in latencies if f]
    gen_ls = [l for (_, l, f, _) in latencies if not f]
    rows_total = sum(r for (_, _, _, r) in latencies)
    first_rss = rss_samples[0][1] if rss_samples else float("nan")
    last_rss = rss_samples[-1][1] if rss_samples else float("nan")
    stats = q.stats()
    print(f"SOAK wall={wall:.0f}s requests={len(ls)} errors={len(errors)} "
          f"rows={rows_total} ({rows_total/wall:.0f} bodies/s served) "
          f"batches={stats['batches']} "
          f"coalesce={stats['requests']/max(stats['batches'],1):.2f} req/batch", flush=True)
    print(f"  all  p50={np.percentile(ls,50)*1e3:.0f}ms p99={np.percentile(ls,99)*1e3:.0f}ms | "
          f"fit p50={np.percentile(fit_ls,50)*1e3:.0f} p99={np.percentile(fit_ls,99)*1e3:.0f} | "
          f"gen p50={np.percentile(gen_ls,50)*1e3:.0f} p99={np.percentile(gen_ls,99)*1e3:.0f}",
          flush=True)
    print(f"  rss {first_rss:.0f} -> {last_rss:.0f} MB "
          f"(delta {last_rss-first_rss:+.0f}); storm={storm_done}", flush=True)
    if errors:
        print("  errors sample:", errors[:5], flush=True)


if __name__ == "__main__":
    main()
