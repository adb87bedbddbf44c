"""Serving engine: warm, fixed-shape generate(+fit) with request batching.

The reference has no serving stack (SURVEY.md); this is the TPU-native
production path: programs are compiled once at startup for a fixed
population size, requests are padded into that shape, and each call is
a single device round-trip. Exposed as an in-process API plus a
JSONL stdin/stdout loop (psi_tpu.cli.serve) so it composes with any
process-level server.
"""

from __future__ import annotations

import dataclasses
import time
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from psi_tpu.fit.fitting import make_fit_step
from psi_tpu.gen.sample import generate_bodies
from psi_tpu.train.objective import SceneAssets
from psi_tpu.utils.config import FitConfig


@dataclasses.dataclass
class ServeResult:
    bodies: np.ndarray  # [n, 72]
    fitted: bool
    latency_s: float


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
    ):
        self.model = model
        self.variables = variables
        self.assets = assets
        self.population = population
        self.fit_cfg = fit_cfg or FitConfig()
        self._fit = make_fit_step(assets, self.fit_cfg)
        self._key = jax.random.PRNGKey(seed)

    def warmup(self, image_size: int = 128) -> float:
        """Compile both programs; returns warmup seconds."""
        t0 = time.time()
        batch = {
            "xs": np.zeros((1, image_size, image_size, 2), np.float32),
            "cam_int": np.eye(3, dtype=np.float32)[None] * 500,
            "cam_ext": np.eye(4, dtype=np.float32)[None],
            "max_d": np.asarray([6.0], np.float32),
        }
        batch["cam_int"][0, 2, 2] = 1.0
        self.generate(batch, fit=True, scene_idx=0)
        return time.time() - t0

    def _next_key(self):
        self._key, k = jax.random.split(self._key)
        return k

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
        n = min(n_samples or self.population, self.population)
        t0 = time.time()
        x72 = generate_bodies(
            self.model, self.variables,
            jnp.asarray(batch["xs"]), jnp.asarray(batch["cam_int"]).reshape(1, 3, 3),
            jnp.asarray(batch["max_d"]).reshape(1), self.population, self._next_key(),
        )
        if fit:
            cam_ext = jnp.broadcast_to(
                jnp.asarray(batch["cam_ext"]).reshape(1, 4, 4), (self.population, 4, 4)
            )
            sidx = jnp.full((self.population,), scene_idx, jnp.int32)
            x72, _, _ = self._fit(x72, cam_ext, sidx)
        out = np.asarray(x72[:n])
        return ServeResult(bodies=out, fitted=fit, latency_s=time.time() - t0)
