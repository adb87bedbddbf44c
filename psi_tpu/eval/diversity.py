"""Diversity evaluation: k-means cluster entropy + mean centroid distance.

Protocol parity with utils/utils_eval_diversity.py:93-104 (scipy
kmeans, k=20, entropy of cluster-assignment counts via scipy.stats
.entropy, mean euclidean distance to the assigned centroid). The
k-means itself is a jit-compiled Lloyd iteration in jnp — TPU-native,
no scipy in the metric path — with k-means++ initialization and
multiple restarts (scipy.cluster.vq.kmeans reruns 20 times and keeps
the lowest-distortion codebook; matching that quality matters for the
entropy number, see tests/test_diversity_scipy.py).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np


def _sqdist(x: jax.Array, c: jax.Array) -> jax.Array:
    """[N, D] x [K, D] -> [N, K] squared distances."""
    return (
        jnp.sum(x * x, axis=1)[:, None]
        + jnp.sum(c * c, axis=1)[None, :]
        - 2.0 * jnp.matmul(x, c.T, precision=jax.lax.Precision.HIGHEST)
    )


def _kmeanspp_init(key: jax.Array, x: jax.Array, k: int) -> jax.Array:
    """k-means++ seeding: next center sampled proportional to the squared
    distance from the chosen set."""
    n = x.shape[0]
    key0, key_rest = jax.random.split(key)
    c0 = x[jax.random.randint(key0, (), 0, n)]
    mind0 = jnp.sum((x - c0) ** 2, axis=1)

    def pick(mind, key_i):
        idx = jax.random.categorical(key_i, jnp.log(jnp.maximum(mind, 1e-30)))
        c = x[idx]
        mind = jnp.minimum(mind, jnp.sum((x - c) ** 2, axis=1))
        return mind, c

    _, centers = jax.lax.scan(pick, mind0, jax.random.split(key_rest, k - 1))
    return jnp.concatenate([c0[None], centers], axis=0)


def _lloyd(x: jax.Array, centroids: jax.Array, k: int, num_iters: int):
    def step(centroids, _):
        assign = jnp.argmin(_sqdist(x, centroids), axis=1)
        one_hot = jax.nn.one_hot(assign, k, dtype=x.dtype)  # [N, k]
        counts = one_hot.sum(axis=0)
        new_centroids = (one_hot.T @ x) / jnp.maximum(counts, 1.0)[:, None]
        # keep empty clusters where they were
        new_centroids = jnp.where((counts > 0)[:, None], new_centroids, centroids)
        return new_centroids, None

    centroids, _ = jax.lax.scan(step, centroids, None, length=num_iters)
    d = _sqdist(x, centroids)
    assign = jnp.argmin(d, axis=1)
    distortion = jnp.mean(jnp.sqrt(jnp.maximum(jnp.min(d, axis=1), 0.0)))
    return centroids, assign, distortion


@functools.partial(jax.jit, static_argnums=(1, 2, 3))
def kmeans(
    x: jax.Array, k: int = 20, num_iters: int = 50, restarts: int = 10, seed: int = 0
) -> Tuple[jax.Array, jax.Array]:
    """Restarted k-means++ Lloyd. x: [N, D] -> (centroids [k, D], assignment [N]).

    Mirrors scipy.cluster.vq.kmeans's best-of-N-runs behavior (its
    `iter` arg, default 20): run `restarts` independent seedings in a
    vmap and keep the lowest mean-distance codebook.
    """
    keys = jax.random.split(jax.random.PRNGKey(seed), restarts)

    def one(key):
        init = _kmeanspp_init(key, x, k)
        return _lloyd(x, init, k, num_iters)

    centroids_r, assign_r, distortion_r = jax.vmap(one)(keys)
    best = jnp.argmin(distortion_r)
    return centroids_r[best], assign_r[best]


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
