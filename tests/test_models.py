"""Model layer tests: trunk output geometry (vs torchvision semantics),
CVAE forward/sample shapes, determinism, and jit compatibility."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from psi_tpu.models import ResNet18Trunk, SceneEncoder, HumanCVAES1, HumanCVAES2


def test_trunk_output_shape(rng):
    x = jnp.asarray(rng.normal(size=(2, 128, 128, 2)).astype(np.float32))
    mdl = ResNet18Trunk()
    vars_ = mdl.init(jax.random.PRNGKey(0), x)
    y = mdl.apply(vars_, x)
    assert y.shape == (2, 16, 16, 128)  # cvae.py:436 comment: b x 128 x 16 x 16


def test_trunk_matches_torch_structure(rng):
    """Spatial geometry parity with the torch trunk: conv7x7 s2 p3 ->
    maxpool3 s2 p1 -> layer1 -> layer2(s2) on odd-size inputs too."""
    torch = pytest.importorskip("torch")
    x = jnp.asarray(rng.normal(size=(1, 96, 96, 2)).astype(np.float32))
    mdl = ResNet18Trunk()
    vars_ = mdl.init(jax.random.PRNGKey(0), x)
    y = mdl.apply(vars_, x)
    # torch: 96 -> conv s2 p3 -> 48 -> pool -> 24 -> layer1 -> 24 -> layer2 -> 12
    assert y.shape == (1, 12, 12, 128)


def test_scene_encoder_shape(rng):
    x = jnp.asarray(rng.normal(size=(3, 128, 128, 2)).astype(np.float32))
    mdl = SceneEncoder(f_dim=32, num_hidden=256)
    vars_ = mdl.init(jax.random.PRNGKey(0), x)
    z = mdl.apply(vars_, x)
    assert z.shape == (3, 256)


@pytest.fixture(scope="module")
def s1_setup():
    mdl = HumanCVAES1(latentD=64)  # small for test speed
    x_s = jnp.zeros((2, 128, 128, 2))
    x_b = jnp.zeros((2, 75))
    vars_ = mdl.init(jax.random.PRNGKey(0), x_b, x_s)
    return mdl, vars_


def test_cvae_s1_forward(s1_setup, rng):
    mdl, vars_ = s1_setup
    x_s = jnp.asarray(rng.normal(size=(2, 128, 128, 2)).astype(np.float32))
    x_b = jnp.asarray(rng.normal(size=(2, 75)).astype(np.float32))
    rec, mu, logvar = mdl.apply(vars_, x_b, x_s, jax.random.PRNGKey(1))
    assert rec.shape == (2, 75)
    assert mu.shape == (2, 32)
    assert logvar.shape == (2, 32)
    # deterministic path (no key) is reproducible
    r1, _, _ = mdl.apply(vars_, x_b, x_s)
    r2, _, _ = mdl.apply(vars_, x_b, x_s)
    np.testing.assert_array_equal(np.asarray(r1), np.asarray(r2))


def test_cvae_s1_sample(s1_setup, rng):
    mdl, vars_ = s1_setup
    x_s = jnp.asarray(rng.normal(size=(4, 128, 128, 2)).astype(np.float32))
    gen = mdl.apply(vars_, x_s, jax.random.PRNGKey(2), method=HumanCVAES1.sample)
    assert gen.shape == (4, 75)
    gen2 = mdl.apply(vars_, x_s, jax.random.PRNGKey(3), method=HumanCVAES1.sample)
    assert float(jnp.abs(gen - gen2).max()) > 1e-6  # different keys -> different samples
    # same key reproduces
    gen3 = mdl.apply(vars_, x_s, jax.random.PRNGKey(2), method=HumanCVAES1.sample)
    np.testing.assert_array_equal(np.asarray(gen), np.asarray(gen3))


def test_cvae_s1_jit_sample(s1_setup, rng):
    mdl, vars_ = s1_setup
    x_s = jnp.asarray(rng.normal(size=(2, 128, 128, 2)).astype(np.float32))
    f = jax.jit(lambda v, x, k: mdl.apply(v, x, k, method=HumanCVAES1.sample))
    out = f(vars_, x_s, jax.random.PRNGKey(0))
    assert out.shape == (2, 75)


@pytest.fixture(scope="module")
def s2_setup():
    mdl = HumanCVAES2(latentD_g=64, latentD_l=64)
    x_s = jnp.zeros((2, 128, 128, 2))
    x_b = jnp.zeros((2, 75))
    vars_ = mdl.init(jax.random.PRNGKey(0), x_b, x_s)
    return mdl, vars_


def test_cvae_s2_forward(s2_setup, rng):
    mdl, vars_ = s2_setup
    x_s = jnp.asarray(rng.normal(size=(2, 128, 128, 2)).astype(np.float32))
    x_b = jnp.asarray(rng.normal(size=(2, 75)).astype(np.float32))
    rec, mu_g, lv_g, mu_l, lv_l = mdl.apply(vars_, x_b, x_s, jax.random.PRNGKey(1))
    assert rec.shape == (2, 75)
    assert mu_g.shape == (2, 32) and mu_l.shape == (2, 32)


def test_cvae_s2_sample(s2_setup, rng):
    mdl, vars_ = s2_setup
    x_s = jnp.asarray(rng.normal(size=(3, 128, 128, 2)).astype(np.float32))
    gen = mdl.apply(vars_, x_s, jax.random.PRNGKey(5), method=HumanCVAES2.sample)
    assert gen.shape == (3, 75)
    assert np.all(np.isfinite(np.asarray(gen)))


def test_cvae_s1_param_count_scales():
    """Reference config sanity: latentD=256, 75-D body builds without error
    and the latent bottleneck is 32 (cvae.py:424: eps_d=32)."""
    mdl = HumanCVAES1(latentD=256)
    vars_ = mdl.init(jax.random.PRNGKey(0), jnp.zeros((1, 75)), jnp.zeros((1, 128, 128, 2)))
    mu_kernel = vars_["params"]["mu_enc"]["kernel"]
    assert mu_kernel.shape == (512, 32)
    n_params = sum(int(np.prod(p.shape)) for p in jax.tree.leaves(vars_["params"]))
    assert 1e6 < n_params < 50e6


def test_cvae_s1_sample_n_matches_broadcast(s1_setup, rng):
    """sample_n (trunk once + feature broadcast) must equal sample on the
    population-tiled snapshot: identical eps draw, identical decode."""
    mdl, vars_ = s1_setup
    x_s1 = jnp.asarray(rng.normal(size=(1, 128, 128, 2)).astype(np.float32))
    n = 6
    key = jax.random.PRNGKey(4)
    fast = mdl.apply(vars_, x_s1, n, key, method=HumanCVAES1.sample_n)
    slow = mdl.apply(vars_, jnp.broadcast_to(x_s1, (n, 128, 128, 2)), key,
                     method=HumanCVAES1.sample)
    # B=1 vs B=n conv batching reassociates float adds -> ulp-level deltas
    np.testing.assert_allclose(np.asarray(fast), np.asarray(slow), atol=1e-4, rtol=1e-4)

    # feature-level path (serving coalesced): encode + sample_with_feat
    z_s = mdl.apply(vars_, x_s1, method=HumanCVAES1.encode_scene)
    feat = mdl.apply(vars_, jnp.broadcast_to(z_s, (n, z_s.shape[1])), key,
                     method=HumanCVAES1.sample_with_feat)
    np.testing.assert_allclose(np.asarray(feat), np.asarray(fast), atol=1e-6)


def test_cvae_s2_sample_n_matches_broadcast(s2_setup, rng):
    mdl, vars_ = s2_setup
    x_s1 = jnp.asarray(rng.normal(size=(1, 128, 128, 2)).astype(np.float32))
    n = 5
    key = jax.random.PRNGKey(7)
    fast = mdl.apply(vars_, x_s1, n, key, method=HumanCVAES2.sample_n)
    slow = mdl.apply(vars_, jnp.broadcast_to(x_s1, (n, 128, 128, 2)), key,
                     method=HumanCVAES2.sample)
    np.testing.assert_allclose(np.asarray(fast), np.asarray(slow), atol=1e-4, rtol=1e-4)

    z_g, z_l = mdl.apply(vars_, x_s1, method=HumanCVAES2.encode_scenes)
    feat = mdl.apply(vars_, jnp.broadcast_to(z_g, (n, z_g.shape[1])),
                     jnp.broadcast_to(z_l, (n, z_l.shape[1])), key,
                     method=HumanCVAES2.sample_with_feats)
    np.testing.assert_allclose(np.asarray(feat), np.asarray(fast), atol=1e-5, rtol=1e-5)
