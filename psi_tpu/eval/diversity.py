"""Diversity evaluation: k-means cluster entropy + mean centroid distance.

Protocol parity with utils/utils_eval_diversity.py:93-104 (scipy
kmeans, k=20, entropy of cluster-assignment counts, mean distance to
assigned centroid). The k-means itself is a jit-compiled Lloyd
iteration in jnp — TPU-native, no scipy dependency in the metric path.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np


@functools.partial(jax.jit, static_argnums=(1, 2))
def kmeans(x: jax.Array, k: int = 20, num_iters: int = 50, seed: int = 0) -> Tuple[jax.Array, jax.Array]:
    """Lloyd's algorithm. x: [N, D] -> (centroids [k, D], assignment [N]).

    Initialization: k distinct random points (matches scipy.cluster.vq
    kmeans behavior closely enough for the entropy protocol; the
    metric is init-insensitive at N >> k).
    """
    n = x.shape[0]
    key = jax.random.PRNGKey(seed)
    init_idx = jax.random.choice(key, n, (k,), replace=False)
    centroids = x[init_idx]

    def step(centroids, _):
        d = (
            jnp.sum(x * x, axis=1)[:, None]
            + jnp.sum(centroids * centroids, axis=1)[None, :]
            - 2.0 * jnp.matmul(x, centroids.T, precision=jax.lax.Precision.HIGHEST)
        )
        assign = jnp.argmin(d, axis=1)
        one_hot = jax.nn.one_hot(assign, k, dtype=x.dtype)  # [N, k]
        counts = jnp.maximum(one_hot.sum(axis=0), 1.0)
        new_centroids = (one_hot.T @ x) / counts[:, None]
        # keep empty clusters where they were
        new_centroids = jnp.where((one_hot.sum(axis=0) > 0)[:, None], new_centroids, centroids)
        return new_centroids, None

    centroids, _ = jax.lax.scan(step, centroids, None, length=num_iters)
    d = (
        jnp.sum(x * x, axis=1)[:, None]
        + jnp.sum(centroids * centroids, axis=1)[None, :]
        - 2.0 * jnp.matmul(x, centroids.T, precision=jax.lax.Precision.HIGHEST)
    )
    assign = jnp.argmin(d, axis=1)
    return centroids, assign


def diversity_metrics(body_vecs: np.ndarray, k: int = 20, seed: int = 0):
    """(cluster entropy, mean distance to assigned centroid) over [N, 72/75]
    generated body vectors (utils_eval_diversity.py:96-104)."""
    x = jnp.asarray(np.asarray(body_vecs, np.float32))
    centroids, assign = kmeans(x, k=k, seed=seed)
    counts = np.bincount(np.asarray(assign), minlength=k).astype(np.float64)
    p = counts / counts.sum()
    p = p[p > 0]
    entropy = float(-(p * np.log(p)).sum())
    dists = np.linalg.norm(np.asarray(x) - np.asarray(centroids)[np.asarray(assign)], axis=1)
    return entropy, float(dists.mean())
