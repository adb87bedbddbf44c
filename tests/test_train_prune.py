"""Training-loss contact pruning (LossConfig.prune_scene_points).

Same scheme as the fitting default: the contact NN search runs against
the K scene points nearest each body's contact centroid. With K covering
the true NN the loss and gradients are unchanged; default is 0 (exact).
"""

import numpy as np
import jax
import jax.numpy as jnp

from psi_tpu.data.synthetic import SyntheticBatchGenerator, make_synthetic_assets
from psi_tpu.models import HumanCVAES1
from psi_tpu.train.objective import cvae_loss
from psi_tpu.utils.config import LossConfig


def test_pruned_training_loss_matches_exact():
    assets, _ = make_synthetic_assets(
        num_verts=128, num_joints=12, num_scenes=3, sdf_dim=16, scene_points=300, n_contact=32
    )
    gen = SyntheticBatchGenerator(num_scenes=3, batches_per_epoch=1, seed=5)
    b = gen.next_batch(4)
    batch = {k: jnp.asarray(v) for k, v in b.items()}

    model = HumanCVAES1(latentD=32)
    variables = model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 75)), jnp.zeros((1, 128, 128, 2))
    )
    key = jax.random.PRNGKey(7)
    fca = jnp.asarray(1.0)
    f_scene = jnp.asarray(1.0)

    def loss_of(cfg):
        def f(params):
            vs = {"params": params, "batch_stats": variables.get("batch_stats", {})}
            total, metrics, _ = cvae_loss(
                model, vs, batch, assets, key, fca, f_scene, cfg, model_type="s1"
            )
            return total, metrics

        (total, metrics), grads = jax.value_and_grad(f, has_aux=True)(variables["params"])
        return float(total), metrics, grads

    t0, m0, g0 = loss_of(LossConfig())
    t1, m1, g1 = loss_of(LossConfig(prune_scene_points=256))  # 256 of 300: covers the NN
    np.testing.assert_allclose(t1, t0, rtol=1e-6)
    np.testing.assert_allclose(
        float(m1["contact"]), float(m0["contact"]), rtol=1e-6, atol=1e-8
    )
    flat0 = jax.tree_util.tree_leaves(g0)
    flat1 = jax.tree_util.tree_leaves(g1)
    for a, b_ in zip(flat0, flat1):
        np.testing.assert_allclose(np.asarray(b_), np.asarray(a), rtol=1e-5, atol=1e-7)
