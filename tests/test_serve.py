"""Serving engine tests: warm compile, request batching, CLI loop."""

import io
import json

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from psi_tpu.data.synthetic import make_synthetic_assets
from psi_tpu.models import HumanCVAES1
from psi_tpu.serve import GenerationEngine, ServingQueue
from psi_tpu.utils.config import FitConfig


def test_engine_generate_and_fit():
    assets, _ = make_synthetic_assets(
        num_verts=100, num_joints=12, num_scenes=2, sdf_dim=16, scene_points=200, n_contact=32
    )
    mdl = HumanCVAES1(latentD=32)
    variables = mdl.init(jax.random.PRNGKey(0), jnp.zeros((1, 75)), jnp.zeros((1, 128, 128, 2)))
    eng = GenerationEngine(mdl, variables, assets, population=8, fit_cfg=FitConfig(num_iter=2))
    warm = eng.warmup()
    assert warm > 0

    batch = {
        "xs": np.zeros((1, 128, 128, 2), np.float32),
        "cam_int": np.eye(3, dtype=np.float32)[None] * 500,
        "cam_ext": np.eye(4, dtype=np.float32)[None],
        "max_d": np.asarray([6.0], np.float32),
    }
    r1 = eng.generate(batch, n_samples=5, fit=False)
    assert r1.bodies.shape == (5, 72)
    r2 = eng.generate(batch, n_samples=8, fit=True, scene_idx=1)
    assert r2.bodies.shape == (8, 72)
    assert r2.fitted
    assert np.all(np.isfinite(r2.bodies))


def _tiny_engine(population=8, max_requests=4):
    assets, _ = make_synthetic_assets(
        num_verts=100, num_joints=12, num_scenes=2, sdf_dim=16, scene_points=200, n_contact=32
    )
    mdl = HumanCVAES1(latentD=32)
    variables = mdl.init(jax.random.PRNGKey(0), jnp.zeros((1, 75)), jnp.zeros((1, 128, 128, 2)))
    return GenerationEngine(
        mdl, variables, assets, population=population,
        fit_cfg=FitConfig(num_iter=2), max_requests=max_requests,
    )


def _snapshot(depth=6.0):
    return {
        "xs": np.zeros((1, 128, 128, 2), np.float32),
        "cam_int": np.eye(3, dtype=np.float32)[None] * 500,
        "cam_ext": np.eye(4, dtype=np.float32)[None],
        "max_d": np.asarray([depth], np.float32),
    }


def test_generate_coalesced_splits_rows():
    eng = _tiny_engine()
    reqs = [
        {"batch": _snapshot(), "n_samples": 3, "scene_idx": 0},
        {"batch": _snapshot(5.0), "n_samples": 2, "scene_idx": 1},
        {"batch": _snapshot(4.0), "n_samples": 3, "scene_idx": 0},
    ]
    results = eng.generate_coalesced(reqs, fit=True)
    assert [r.bodies.shape for r in results] == [(3, 72), (2, 72), (3, 72)]
    assert all(r.batch_size == 3 and r.fitted for r in results)
    assert all(np.isfinite(r.bodies).all() for r in results)
    # distinct snapshots (different max_d) must condition their own rows:
    # recover_global_T scales depth by max_d, so populations differ
    assert not np.allclose(results[0].bodies[:2], results[1].bodies)

    # over-capacity and over-slot-count are rejected, not silently truncated
    with pytest.raises(ValueError):
        eng.generate_coalesced([{"batch": _snapshot(), "n_samples": 6}] * 2)
    with pytest.raises(ValueError):
        eng.generate_coalesced([{"batch": _snapshot(), "n_samples": 1}] * 5)


def test_serving_queue_coalesces_concurrent_requests():
    eng = _tiny_engine()
    eng.warmup()
    q = ServingQueue(eng, linger_s=0.25)  # wide window: the burst must share programs
    futs = [q.submit(_snapshot(), n_samples=2, fit=False, scene_idx=i % 2) for i in range(4)]
    results = [f.result(timeout=120) for f in futs]
    q.stop()
    assert all(r.bodies.shape == (2, 72) for r in results)
    stats = q.stats()
    assert stats["requests"] == 4
    # 4 requests x 2 rows fit in one 8-row program (max_requests=4)
    assert stats["batches"] < 4
    assert any(r.batch_size > 1 for r in results)
    assert "latency_p50_s" in stats and "latency_p99_s" in stats
    assert stats["latency_p99_s"] >= stats["latency_p50_s"]


def test_serving_queue_groups_by_fit_flag():
    eng = _tiny_engine()
    eng.warmup()
    q = ServingQueue(eng, linger_s=0.25)
    f1 = q.submit(_snapshot(), n_samples=2, fit=False)
    f2 = q.submit(_snapshot(), n_samples=2, fit=True)
    r1, r2 = f1.result(timeout=120), f2.result(timeout=120)
    q.stop()
    assert not r1.fitted and r2.fitted
    assert q.stats()["batches"] == 2  # incompatible fit flags never share a program


def test_serve_cli_loop(tmp_path):
    from psi_tpu.cli import serve as cli_serve

    reqs = (
        json.dumps({"id": "a", "n_samples": 3})
        + "\n"
        + json.dumps({"id": "b", "n_samples": 1})
        + "\nstats\nquit\n"
    )
    stdin = io.StringIO(reqs)
    stdout = io.StringIO()
    cli_serve.main(
        ["--latentD", "32", "--population", "4", "--synthetic", "--out_dir", str(tmp_path),
         "--linger_ms", "250"],
        stdin=stdin, stdout=stdout,
    )
    lines = [json.loads(l) for l in stdout.getvalue().strip().splitlines()]
    assert lines[0]["status"] == "ready"
    by_id = {l["id"]: l for l in lines if "id" in l}
    assert by_id["a"]["n"] == 3 and by_id["b"]["n"] == 1
    assert "batch_size" in by_id["a"]
    out = np.load(by_id["a"]["out"])
    assert out.shape == (3, 72)
    stats_lines = [l for l in lines if "stats" in l]
    assert stats_lines, "stats line missing"
    final = stats_lines[-1]["stats"]
    assert final["requests"] == 2
    assert "latency_p50_s" in final and "latency_p99_s" in final


def test_serving_router_two_models():
    """s1 + s2 resident side by side; requests route by model name and
    stats aggregate across queues with a per-model breakdown."""
    from psi_tpu.models import HumanCVAES2
    from psi_tpu.serve import ServingRouter

    assets, _ = make_synthetic_assets(
        num_verts=100, num_joints=12, num_scenes=2, sdf_dim=16, scene_points=200, n_contact=32
    )
    engines = {}
    for name, mdl in (
        ("s1", HumanCVAES1(latentD=32)),
        ("s2", HumanCVAES2(latentD_g=32, latentD_l=32)),
    ):
        variables = mdl.init(
            jax.random.PRNGKey(0), jnp.zeros((1, 75)), jnp.zeros((1, 128, 128, 2))
        )
        engines[name] = GenerationEngine(
            mdl, variables, assets, population=8, fit_cfg=FitConfig(num_iter=2), max_requests=4
        )
        engines[name].warmup()

    router = ServingRouter(engines, linger_s=0.25)
    futs = {
        "s1": router.submit(_snapshot(), n_samples=2, model="s1"),
        "s2": router.submit(_snapshot(), n_samples=3, model="s2"),
        "default": router.submit(_snapshot(), n_samples=1),  # -> first engine (s1)
    }
    res = {k: f.result(timeout=120) for k, f in futs.items()}
    bad = router.submit(_snapshot(), model="nope")
    with pytest.raises(KeyError):
        bad.result(timeout=10)
    router.stop()

    assert res["s1"].bodies.shape == (2, 72)
    assert res["s2"].bodies.shape == (3, 72)
    assert res["default"].bodies.shape == (1, 72)
    stats = router.stats()
    assert stats["requests"] == 3
    assert stats["models"]["s1"]["requests"] == 2  # s1 + default
    assert stats["models"]["s2"]["requests"] == 1
    assert "latency_p50_s" in stats


def test_serve_cli_multi_model(tmp_path):
    from psi_tpu.cli import serve as cli_serve

    reqs = (
        json.dumps({"id": "a", "n_samples": 2, "model": "s2"})
        + "\n"
        + json.dumps({"id": "b", "n_samples": 1})
        + "\nquit\n"
    )
    stdin = io.StringIO(reqs)
    stdout = io.StringIO()
    cli_serve.main(
        ["--latentD", "32", "--population", "4", "--synthetic", "--out_dir", str(tmp_path),
         "--model", "s1", "--model", "s2", "--linger_ms", "20"],
        stdin=stdin, stdout=stdout,
    )
    lines = [json.loads(l) for l in stdout.getvalue().strip().splitlines()]
    assert lines[0]["status"] == "ready" and lines[0]["models"] == ["s1", "s2"]
    by_id = {l["id"]: l for l in lines if "id" in l}
    assert by_id["a"]["n"] == 2 and by_id["b"]["n"] == 1
    final = [l for l in lines if "stats" in l][-1]["stats"]
    assert final["requests"] == 2
    assert final["models"]["s2"]["requests"] == 1


def test_engine_coalesced_s2_model():
    """The coalesced path must work for the two-stage model too
    (encode_scenes + sample_with_feats)."""
    from psi_tpu.models import HumanCVAES2

    assets, _ = make_synthetic_assets(
        num_verts=100, num_joints=12, num_scenes=2, sdf_dim=16, scene_points=200, n_contact=32
    )
    mdl = HumanCVAES2(latentD_g=32, latentD_l=32)
    variables = mdl.init(jax.random.PRNGKey(0), jnp.zeros((1, 75)), jnp.zeros((1, 128, 128, 2)))
    eng = GenerationEngine(
        mdl, variables, assets, population=8, fit_cfg=FitConfig(num_iter=2), max_requests=4
    )
    reqs = [
        {"batch": _snapshot(), "n_samples": 3, "scene_idx": 0},
        {"batch": _snapshot(5.0), "n_samples": 5, "scene_idx": 1},
    ]
    for fit in (False, True):
        results = eng.generate_coalesced(reqs, fit=fit)
        assert [r.bodies.shape for r in results] == [(3, 72), (5, 72)]
        assert all(np.isfinite(r.bodies).all() for r in results)


def test_negative_n_samples_rejected():
    """A negative or zero n_samples must fail ITS request (ValueError)
    rather than corrupting co-batched requests' row partitions
    (ADVICE round 2, medium)."""
    eng = _tiny_engine()
    with pytest.raises(ValueError):
        eng.generate_coalesced(
            [{"batch": _snapshot(), "n_samples": -3},
             {"batch": _snapshot(), "n_samples": 2}]
        )
    with pytest.raises(ValueError):
        eng.generate(_snapshot(), n_samples=0)
    q = ServingQueue(eng, linger_s=0.01)
    bad = q.submit(_snapshot(), n_samples=-1)
    good = q.submit(_snapshot(), n_samples=2)
    with pytest.raises(ValueError):
        bad.result(timeout=60)
    assert good.result(timeout=120).bodies.shape == (2, 72)
    q.stop()


def test_serve_cli_malformed_lines(tmp_path):
    """Bad JSON / missing npz path emit an error record and the loop keeps
    serving subsequent requests (ADVICE round 2, low)."""
    import io as _io
    from psi_tpu.cli import serve as cli_serve

    reqs = (
        "this is not json\n"
        + json.dumps({"id": "missing", "npz": str(tmp_path / "nope.npz"), "n_samples": 1})
        + "\n"
        + json.dumps({"id": "ok", "n_samples": 2})
        + "\nquit\n"
    )
    stdout = _io.StringIO()
    cli_serve.main(
        ["--latentD", "32", "--population", "4", "--synthetic", "--out_dir", str(tmp_path),
         "--linger_ms", "20"],
        stdin=_io.StringIO(reqs), stdout=stdout,
    )
    lines = [json.loads(l) for l in stdout.getvalue().strip().splitlines()]
    errors = [l for l in lines if "error" in l]
    assert len(errors) == 2
    assert any(l.get("id") == "missing" for l in errors)
    by_id = {l["id"]: l for l in lines if "id" in l and "error" not in l}
    assert by_id["ok"]["n"] == 2  # server survived the bad lines


def test_warmup_program_selection():
    """warmup(programs=...) compiles only the named programs and rejects
    unknown names (round-2 verdict: an 18-min all-program warmup needs
    a selector)."""
    eng = _tiny_engine()
    t = eng.warmup(programs=("single",))
    assert t > 0
    with pytest.raises(ValueError):
        eng.warmup(programs=("single", "nope"))


def test_serve_cli_streaming_chunks(tmp_path):
    """n_samples > population streams ceil(n/pop) chunk records, each
    with chunk/n_chunks/final fields and its own output file."""
    import io as _io
    from psi_tpu.cli import serve as cli_serve

    reqs = json.dumps({"id": "big", "n_samples": 10}) + "\nquit\n"
    stdout = _io.StringIO()
    cli_serve.main(
        ["--latentD", "32", "--population", "4", "--synthetic", "--out_dir", str(tmp_path),
         "--linger_ms", "20", "--warmup", "coalesced"],
        stdin=_io.StringIO(reqs), stdout=stdout,
    )
    lines = [json.loads(l) for l in stdout.getvalue().strip().splitlines()]
    ready = lines[0]
    assert ready["warmup_programs"] == ["coalesced"]
    chunks = [l for l in lines if l.get("id") == "big" and "error" not in l]
    assert [c["chunk"] for c in chunks] == [0, 1, 2]
    assert all(c["n_chunks"] == 3 for c in chunks)
    assert [c["n"] for c in chunks] == [4, 4, 2]
    assert [c["final"] for c in chunks] == [False, False, True]
    import numpy as _np
    total = sum(_np.load(c["out"]).shape[0] for c in chunks)
    assert total == 10


def test_serving_queue_mini_soak():
    """Sustained mixed-size load with a mid-stream malformed storm: every
    malformed future fails cleanly, no valid request is lost, and the
    queue keeps serving afterwards. The real-chip 5-minute soak lives in
    scripts/soak_serve.py (numbers in ROUND_NOTES/README); this is the
    CPU-fast structural version."""
    import threading
    import time as _time

    eng = _tiny_engine(population=8, max_requests=4)
    eng.warmup()
    q = ServingQueue(eng, linger_s=0.01)
    stop = threading.Event()
    ok, errs = [], []

    def client(cid):
        rng = np.random.default_rng(cid)
        while not stop.is_set():
            rows = int(rng.choice([1, 2, 4]))
            fut = q.submit(_snapshot(float(rng.uniform(3, 6))), n_samples=rows,
                           fit=bool(rng.random() < 0.5))
            try:
                r = fut.result(timeout=60)
                ok.append((rows, r.bodies.shape))
            except Exception as e:  # noqa: BLE001
                errs.append(repr(e))

    threads = [threading.Thread(target=client, args=(c,), daemon=True) for c in range(2)]
    [t.start() for t in threads]
    _time.sleep(1.0)

    # malformed storm: each future fails cleanly, queue survives
    storm = []
    for k in range(40):
        if k % 3 == 0:
            storm.append(q.submit(_snapshot(), n_samples=-1))
        elif k % 3 == 1:
            storm.append(q.submit({"cam_int": np.eye(3, dtype=np.float32)}, n_samples=2))
        else:
            bad = _snapshot()
            bad["xs"] = np.zeros((3,), np.float32)
            storm.append(q.submit(bad, n_samples=2))
    failed = 0
    for f in storm:
        with pytest.raises(Exception):
            f.result(timeout=30)
        failed += 1
    assert failed == 40

    _time.sleep(1.0)
    stop.set()
    [t.join(timeout=60) for t in threads]
    post = q.submit(_snapshot(), n_samples=3, fit=True).result(timeout=60)
    q.stop()
    assert post.bodies.shape == (3, 72) and np.isfinite(post.bodies).all()
    assert not errs, errs[:3]
    assert len(ok) >= 4
    assert all(shape == (rows, 72) for rows, shape in ok)
    stats = q.stats()
    assert stats["requests"] == len(ok) + 1
    assert "latency_p99_s" in stats
