"""Cross-check eval.diversity against the reference's actual scipy
protocol (utils/utils_eval_diversity.py:96-104: scipy.cluster.vq.kmeans
k=20 -> vq assign -> histogram counts -> scipy.stats.entropy, plus mean
vq distance).

The fixtures have KNOWN ground-truth entropy by construction, so the
tests assert three things: (1) our metric recovers the true entropy
tightly, (2) the scipy protocol lands in the same band (it clusters
slightly worse — random-point init even over its 20 restarts — which
is exactly the kind of drift a paper-table comparison must tolerate),
and (3) our distortion (mean distance) is never worse than scipy's.
"""

import numpy as np
import pytest

pytest.importorskip("scipy.cluster")
from scipy.cluster import vq as scipy_vq
from scipy.stats import entropy as scipy_entropy

from psi_tpu.eval.diversity import diversity_metrics


def _clustered_bodies(rng, n_clusters=20, per_cluster=60, dim=75, spread=0.05):
    centers = rng.uniform(-3, 3, size=(n_clusters, dim))
    pts = centers[:, None, :] + rng.normal(0, spread, size=(n_clusters, per_cluster, dim))
    pts = pts.reshape(-1, dim).astype(np.float32)
    return pts[rng.permutation(len(pts))]


def _scipy_protocol(ar, k=20):
    codes, _ = scipy_vq.kmeans(ar.astype(np.float64), k, seed=1)
    vecs, dist = scipy_vq.vq(ar.astype(np.float64), codes)
    counts, _ = np.histogram(vecs, bins=len(codes))
    return float(scipy_entropy(counts)), float(np.mean(dist))


def test_balanced_clusters(rng):
    ar = _clustered_bodies(rng)  # 20 equal clusters -> true entropy log(20)
    true_entropy = np.log(20.0)
    ee_scipy, md_scipy = _scipy_protocol(ar)
    ee_ours, md_ours = diversity_metrics(ar, k=20)

    assert abs(ee_ours - true_entropy) < 0.02, (ee_ours, true_entropy)
    assert abs(ee_scipy - true_entropy) < 0.2, (ee_scipy, true_entropy)
    assert abs(ee_ours - ee_scipy) < 0.2
    assert md_ours <= md_scipy * 1.02, (md_ours, md_scipy)


def test_unbalanced_clusters(rng):
    a = _clustered_bodies(rng, n_clusters=5, per_cluster=200, spread=0.02)
    b = _clustered_bodies(rng, n_clusters=15, per_cluster=20, spread=0.02)
    ar = np.concatenate([a, b], axis=0)
    counts = np.array([200] * 5 + [20] * 15, np.float64)
    p = counts / counts.sum()
    true_entropy = float(-(p * np.log(p)).sum())

    ee_scipy, md_scipy = _scipy_protocol(ar)
    ee_ours, md_ours = diversity_metrics(ar, k=20)

    assert abs(ee_ours - true_entropy) < 0.02, (ee_ours, true_entropy)
    assert abs(ee_scipy - true_entropy) < 0.4, (ee_scipy, true_entropy)
    assert md_ours <= md_scipy * 1.02, (md_ours, md_scipy)
