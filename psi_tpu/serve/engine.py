"""Serving engine: warm, fixed-shape generate(+fit) with request coalescing.

The reference has no serving stack (SURVEY.md); this is the TPU-native
production path: programs are compiled once at startup for a fixed
population size. A single request pads into that shape; CONCURRENT
requests are coalesced by ``ServingQueue`` into one device round-trip —
population rows are partitioned across the queued requests and each row
is conditioned on its own request's snapshot via a device-side gather
(gen/sample.py::_generate_rows), so N small requests cost one program
execution instead of N. Exposed as an in-process API plus a JSONL
stdin/stdout loop (psi_tpu.cli.serve) so it composes with any
process-level server.

Multi-chip: pass ``mesh=`` (a 1-axis jax.sharding.Mesh) and the fitted
population rows shard over it — each chip refines population/n_devices
bodies, params/assets replicated, with no change to the request API or
results (CPU-mesh equality asserted in tests/test_serve_mesh.py). The
generate-only path keeps replicated compute (its cost is the
per-snapshot scene trunk, not the population rows).
"""

from __future__ import annotations

import collections
import dataclasses
import queue
import threading
import time
from concurrent.futures import Future
from typing import Any, Dict, List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from psi_tpu.fit.fitting import make_generate_fit_rows, make_generate_fit_step
from psi_tpu.gen.sample import generate_bodies, generate_bodies_rows
from psi_tpu.train.objective import SceneAssets
from psi_tpu.utils.config import FitConfig


def _validate_rows(n_samples, population: int) -> int:
    """Row count for a request: None means the full population; anything
    else must be a positive integer. A negative count would turn the
    row-partition slice assignments in generate_coalesced into
    negative-length slices, corrupting OTHER requests' rows in the same
    micro-batch — so reject it here and fail only this request."""
    if n_samples is None:
        return population
    n = int(n_samples)
    if n < 1:
        raise ValueError(f"n_samples must be >= 1, got {n_samples!r}")
    return min(n, population)


@dataclasses.dataclass
class ServeResult:
    bodies: np.ndarray  # [n, 72]
    fitted: bool
    latency_s: float
    batch_size: int = 1  # requests coalesced into the program call


class GenerationEngine:
    """Compile-once engine: sample a population for a scene snapshot and
    optionally refine it in the same call."""

    def __init__(
        self,
        model,
        variables,
        assets: SceneAssets,
        population: int = 256,
        fit_cfg: Optional[FitConfig] = None,
        seed: int = 0,
        max_requests: int = 16,
        mesh=None,
    ):
        self.model = model
        self.population = population
        # serving default is the production fit stack (protocol-validated
        # score-identical to exact, EVAL_SYNTH.md); pass FitConfig.exact()
        # for reference-exact refinement semantics
        self.fit_cfg = fit_cfg or FitConfig.production()
        self.max_requests = max_requests  # compiled request-slot count
        # Multi-chip serving: population rows shard over the mesh's 'dp'
        # axis — the same GSPMD layout the fitting path already runs
        # (parallel/mesh.py; __graft_entry__.dryrun_multichip proves the
        # sharded programs). Model params, scene assets and the snapshot
        # inputs replicate; only the per-body rows (cam_ext, scene_idx,
        # req_idx) split, so the 20-iter Adam refinement — the dominant
        # serving cost — runs population/n_devices bodies per chip.
        self.mesh = mesh
        if mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as _P

            from psi_tpu.parallel.mesh import replicate

            if population % mesh.size != 0:
                raise ValueError(
                    f"population={population} must divide evenly over the "
                    f"{mesh.size}-device mesh"
                )
            axis = mesh.axis_names[0]
            self._row_sharding = NamedSharding(mesh, _P(axis))
            variables = replicate(variables, mesh)
            assets = replicate(assets, mesh)
        else:
            self._row_sharding = None
        self.variables = variables
        self.assets = assets
        # generate+fit as ONE compiled program each (no inter-program
        # host round-trip on the hot serving path). want_metrics=False:
        # ServeResult carries bodies only, so the final-state metrics
        # pass — a full exact loss evaluation — would be computed and
        # thrown away on every request.
        self._genfit = make_generate_fit_step(
            model, assets, self.fit_cfg, population, want_metrics=False, mesh=mesh)
        self._genfit_rows = make_generate_fit_rows(
            model, assets, self.fit_cfg, want_metrics=False, mesh=mesh)
        self._key = jax.random.PRNGKey(seed)
        self._lock = threading.Lock()  # device programs are not re-entrant

    def _dummy_batch(self, image_size: int = 128) -> Dict[str, np.ndarray]:
        batch = {
            "xs": np.zeros((1, image_size, image_size, 2), np.float32),
            "cam_int": np.eye(3, dtype=np.float32)[None] * 500,
            "cam_ext": np.eye(4, dtype=np.float32)[None],
            "max_d": np.asarray([6.0], np.float32),
        }
        batch["cam_int"][0, 2, 2] = 1.0
        return batch

    WARMUP_PROGRAMS = ("single", "single_fit", "coalesced", "coalesced_fit")

    def warmup(self, image_size: int = 128, programs: Optional[Sequence[str]] = None) -> float:
        """Compile the selected serving programs — by default all four:
        single-request and coalesced, each with and without fitting (they
        are distinct XLA programs; a path skipped here stalls the first
        live request on a full compile after 'ready'). ``programs``
        selects a subset (names in WARMUP_PROGRAMS) so a deployment that
        only serves, say, coalesced fitted requests does not pay the full
        4-program compile (measured ~18 min for a 2-model roster through
        a dev tunnel). Returns warmup seconds."""
        sel = tuple(programs) if programs is not None else self.WARMUP_PROGRAMS
        unknown = set(sel) - set(self.WARMUP_PROGRAMS)
        if unknown:
            raise ValueError(f"unknown warmup programs {sorted(unknown)}; "
                             f"valid: {self.WARMUP_PROGRAMS}")
        t0 = time.time()
        batch = self._dummy_batch(image_size)
        reqs = [
            {"batch": batch, "n_samples": 1, "scene_idx": 0},
            {"batch": batch, "n_samples": 1, "scene_idx": 0},
        ]
        if "single" in sel:
            self.generate(batch, fit=False, scene_idx=0)
        if "single_fit" in sel:
            self.generate(batch, fit=True, scene_idx=0)
        if "coalesced" in sel:
            self.generate_coalesced(reqs, fit=False)
        if "coalesced_fit" in sel:
            self.generate_coalesced(reqs, fit=True)
        return time.time() - t0

    def _next_key(self):
        self._key, k = jax.random.split(self._key)
        return k

    def _rows(self, x):
        """Place a [population, ...] array: sharded over 'dp' on a mesh
        engine (committed sharding propagates through the jitted
        programs), plain device array otherwise."""
        if self._row_sharding is None:
            return jnp.asarray(x)
        return jax.device_put(jnp.asarray(x), self._row_sharding)

    def generate(
        self,
        batch: Dict[str, np.ndarray],
        n_samples: Optional[int] = None,
        fit: bool = False,
        scene_idx: int = 0,
    ) -> ServeResult:
        """batch: one scene snapshot (xs [1,H,W,2], cam_int [1,3,3],
        cam_ext [1,4,4], max_d [1]). n_samples <= population (the program
        always runs at the compiled population size; extras are dropped)."""
        n = _validate_rows(n_samples, self.population)
        t0 = time.time()
        with self._lock:
            xs = jnp.asarray(batch["xs"])
            cam_int = jnp.asarray(batch["cam_int"]).reshape(1, 3, 3)
            max_d = jnp.asarray(batch["max_d"]).reshape(1)
            if fit:
                cam_ext = self._rows(
                    np.broadcast_to(
                        np.asarray(batch["cam_ext"], np.float32).reshape(1, 4, 4),
                        (self.population, 4, 4),
                    )
                )
                sidx = self._rows(np.full((self.population,), scene_idx, np.int32))
                x72, _, _ = self._genfit(
                    self.variables, xs, cam_int, max_d, cam_ext, sidx, self._next_key()
                )
            else:
                x72 = generate_bodies(
                    self.model, self.variables, xs, cam_int, max_d, self.population, self._next_key()
                )
            out = np.asarray(x72[:n])
        return ServeResult(bodies=out, fitted=fit, latency_s=time.time() - t0)

    def generate_coalesced(
        self, requests: Sequence[Dict[str, Any]], fit: bool = False
    ) -> List[ServeResult]:
        """Run several requests as ONE device program: population rows are
        partitioned across the requests, each row conditioned on its own
        request's snapshot. requests: dicts with keys ``batch`` (snapshot
        dict), ``n_samples``, ``scene_idx``. Sum of n_samples must fit in
        the compiled population; at most ``max_requests`` requests.
        Returns one ServeResult per request, in order."""
        if len(requests) > self.max_requests:
            raise ValueError(f"{len(requests)} requests > max_requests={self.max_requests}")
        counts = [_validate_rows(r.get("n_samples"), self.population) for r in requests]
        if sum(counts) > self.population:
            raise ValueError(f"sum(n_samples)={sum(counts)} exceeds population={self.population}")

        R = self.max_requests  # fixed compiled slot count
        img = np.asarray(requests[0]["batch"]["xs"], np.float32)
        xs_stack = np.zeros((R,) + img.shape[1:], np.float32)
        cam_int_stack = np.tile(np.eye(3, dtype=np.float32)[None], (R, 1, 1))
        max_d_stack = np.full((R,), 6.0, np.float32)
        req_idx = np.zeros((self.population,), np.int32)
        cam_ext_rows = np.tile(np.eye(4, dtype=np.float32)[None], (self.population, 1, 1))
        sidx_rows = np.zeros((self.population,), np.int32)

        offset = 0
        for ri, (req, n) in enumerate(zip(requests, counts)):
            b = req["batch"]
            arr = np.asarray(b["xs"], np.float32)
            if arr.shape[-3:] != img.shape[-3:]:
                # a silent reshape would condition rows on a scrambled
                # image; ServingQueue groups by shape so this only fires
                # on direct mis-use of generate_coalesced
                raise ValueError(
                    f"request {ri} snapshot shape {arr.shape} does not match "
                    f"the group's {img.shape}"
                )
            xs_stack[ri] = arr.reshape(img.shape[1:])
            cam_int_stack[ri] = np.asarray(b["cam_int"], np.float32).reshape(3, 3)
            max_d_stack[ri] = np.asarray(b["max_d"], np.float32).reshape(-1)[0]
            req_idx[offset : offset + n] = ri
            cam_ext_rows[offset : offset + n] = np.asarray(b["cam_ext"], np.float32).reshape(-1, 4, 4)[:1]
            sidx_rows[offset : offset + n] = int(req.get("scene_idx", 0))
            offset += n
        # padding rows recompute request 0 (req_idx stays 0); give them
        # request 0's extrinsics/scene too so a degenerate identity-cam
        # fit can't go NaN and muddy debugging — they are discarded on
        # slice-out either way
        if offset < self.population:
            cam_ext_rows[offset:] = cam_ext_rows[0]
            sidx_rows[offset:] = sidx_rows[0]

        t0 = time.time()
        with self._lock:
            if fit:
                x72, _, _ = self._genfit_rows(
                    self.variables, jnp.asarray(xs_stack), jnp.asarray(cam_int_stack),
                    jnp.asarray(max_d_stack), self._rows(req_idx),
                    self._rows(cam_ext_rows), self._rows(sidx_rows), self._next_key(),
                )
            else:
                x72 = generate_bodies_rows(
                    self.model, self.variables,
                    jnp.asarray(xs_stack), jnp.asarray(cam_int_stack),
                    jnp.asarray(max_d_stack), self._rows(req_idx), self._next_key(),
                )
            host = np.asarray(x72)
        latency = time.time() - t0

        results, offset = [], 0
        for n in counts:
            results.append(
                ServeResult(
                    bodies=host[offset : offset + n].copy(), fitted=fit,
                    latency_s=latency, batch_size=len(requests),
                )
            )
            offset += n
        return results


_STOP = object()


@dataclasses.dataclass
class _Queued:
    req: Dict[str, Any]
    fit: bool
    future: Future
    submit_t: float
    rows: int = 0  # validated at submit time
    img_shape: tuple = ()


class ServingQueue:
    """Micro-batching front end over a GenerationEngine.

    Concurrent ``submit()`` calls coalesce: a worker thread drains the
    queue into groups (same fit flag, total rows <= population, at most
    ``engine.max_requests`` requests), lingering ``linger_s`` after the
    first request of a group to let a burst accumulate, then runs each
    group as one ``generate_coalesced`` program call. Latency is
    end-to-end (submit -> result ready) and tracked for p50/p99.
    """

    def __init__(self, engine: GenerationEngine, linger_s: float = 0.005):
        self.engine = engine
        self.linger_s = linger_s
        self._q: "queue.Queue[Any]" = queue.Queue()
        self._carry: Optional[Any] = None
        self._stats_lock = threading.Lock()
        # bounded window: a long-running server must not leak one float
        # per request forever (p50/p99 over the last 100k is plenty)
        self._latencies: "collections.deque[float]" = collections.deque(maxlen=100_000)
        self._requests = 0
        self._batches = 0
        self._worker = threading.Thread(target=self._run, daemon=True)
        self._worker.start()

    def submit(
        self,
        batch: Dict[str, np.ndarray],
        n_samples: Optional[int] = None,
        fit: bool = False,
        scene_idx: int = 0,
    ) -> Future:
        """Enqueue one request; returns a Future resolving to ServeResult.

        Malformed requests (non-integer n_samples, missing/odd-shaped
        snapshot) fail THEIR future here instead of reaching the worker
        thread — one bad request must never wedge the queue."""
        fut: Future = Future()
        try:
            rows = _validate_rows(n_samples, self.engine.population)
            img_shape = tuple(np.asarray(batch["xs"]).shape[1:])
        except Exception as e:
            fut.set_exception(e)
            return fut
        self._q.put(
            _Queued(
                req={"batch": batch, "n_samples": rows, "scene_idx": scene_idx},
                fit=fit, future=fut, submit_t=time.time(),
                rows=rows, img_shape=img_shape,
            )
        )
        return fut

    def stop(self):
        """Drain outstanding requests, then stop the worker."""
        self._q.put(_STOP)
        self._worker.join()

    def stats(self) -> Dict[str, Any]:
        with self._stats_lock:
            lat = np.asarray(self._latencies, np.float64)
            out = {"requests": self._requests, "batches": self._batches}
        if lat.size:
            out["latency_p50_s"] = float(np.percentile(lat, 50))
            out["latency_p99_s"] = float(np.percentile(lat, 99))
        return out

    def latencies_snapshot(self) -> List[float]:
        """Copy of the per-request end-to-end latencies (for aggregation
        by a router without touching queue internals)."""
        with self._stats_lock:
            return list(self._latencies)

    def _compatible(self, first, nxt, rows) -> bool:
        """May nxt share first's program call? Same fit flag, room in the
        population, and the same snapshot shape (coalesced rows stack
        into one xs tensor)."""
        return (
            nxt.fit == first.fit
            and rows + nxt.rows <= self.engine.population
            and nxt.img_shape == first.img_shape
        )

    def _next_group(self) -> Optional[List[_Queued]]:
        first = self._carry
        self._carry = None
        if first is None:
            first = self._q.get()
        if first is _STOP:
            return None
        group, rows = [first], first.rows
        deadline = time.time() + self.linger_s
        while rows < self.engine.population and len(group) < self.engine.max_requests:
            timeout = deadline - time.time()
            try:
                nxt = self._q.get(timeout=max(timeout, 0.0)) if timeout > 0 else self._q.get_nowait()
            except queue.Empty:
                break
            if nxt is _STOP:
                self._carry = _STOP
                break
            if not self._compatible(first, nxt, rows):
                self._carry = nxt  # incompatible: starts the next group
                break
            group.append(nxt)
            rows += nxt.rows
        return group

    def _run(self):
        while True:
            group = self._next_group()
            if group is None:
                return
            try:
                results = self.engine.generate_coalesced([g.req for g in group], fit=group[0].fit)
            except Exception as e:  # surface failures to every caller in the group
                for g in group:
                    g.future.set_exception(e)
                continue
            done_t = time.time()
            with self._stats_lock:
                self._batches += 1
                self._requests += len(group)
                for g in group:
                    self._latencies.append(done_t - g.submit_t)
            for g, r in zip(group, results):
                r.latency_s = done_t - g.submit_t  # end-to-end, incl. queue wait
                g.future.set_result(r)


class ServingRouter:
    """Multi-model front end: one ServingQueue per engine (e.g. the
    one-stage and two-stage CVAEs served side by side), requests routed
    by model name. Each queue micro-batches independently, so s1 and s2
    populations never share a program; the device interleaves their
    dispatches (each engine holds its own lock).

    The reference ships two model families behind distinct scripts
    (test_proxe_s1.py / test_proxe_s2.py); here both are resident behind
    one API.
    """

    def __init__(self, engines: Dict[str, GenerationEngine], linger_s: float = 0.005):
        if not engines:
            raise ValueError("ServingRouter needs at least one engine")
        self.engines = dict(engines)
        self.default = next(iter(self.engines))
        self.queues = {name: ServingQueue(e, linger_s=linger_s) for name, e in self.engines.items()}

    def submit(
        self,
        batch: Dict[str, np.ndarray],
        n_samples: Optional[int] = None,
        fit: bool = False,
        scene_idx: int = 0,
        model: Optional[str] = None,
    ) -> Future:
        name = model or self.default
        if name not in self.queues:
            fut: Future = Future()
            fut.set_exception(KeyError(f"unknown model {name!r}; have {sorted(self.queues)}"))
            return fut
        return self.queues[name].submit(batch, n_samples=n_samples, fit=fit, scene_idx=scene_idx)

    def stats(self) -> Dict[str, Any]:
        """Aggregate stats (same schema as ServingQueue.stats) plus a
        per-model breakdown under 'models'."""
        per = {name: q.stats() for name, q in self.queues.items()}
        lat = []
        for q in self.queues.values():
            lat.extend(q.latencies_snapshot())
        out: Dict[str, Any] = {
            "requests": sum(p["requests"] for p in per.values()),
            "batches": sum(p["batches"] for p in per.values()),
            "models": per,
        }
        if lat:
            arr = np.asarray(lat, np.float64)
            out["latency_p50_s"] = float(np.percentile(arr, 50))
            out["latency_p99_s"] = float(np.percentile(arr, 99))
        return out

    def stop(self):
        for q in self.queues.values():
            q.stop()
