"""Stage-1 model: one CVAE over the full 75-D body vector.

Rebuild of HumanCVAES1 (reference: source/cvae.py:411-534): scene
encoder (ResNet18 trunk, f_dim=32, fc -> latentD), human encoder
Dense(75->latentD) + 2 ResBlocks(2*latentD), 32-D latent, decoder
Dense(32->latentD) + 2 ResBlocks(2*latentD) -> Dense(75).

Sampling is explicit: methods take a PRNG key (pure functions under
jit) instead of the reference's in-place .normal_() draws.
"""

from __future__ import annotations

from typing import Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from psi_tpu.models.scene_encoder import SceneEncoder
from psi_tpu.nn.layers import ResBlock


class HumanCVAES1(nn.Module):
    latentD: int = 256
    n_dim_body: int = 75
    eps_d: int = 32
    scene_in_channels: int = 2

    def setup(self):
        self.scene_enc = SceneEncoder(
            f_dim=32, num_hidden=self.latentD, in_channels=self.scene_in_channels, name="scene"
        )
        self.linear_in = nn.Dense(self.latentD, name="linear_in")
        self.human_encoder = [ResBlock(2 * self.latentD, name=f"enc_rb{i}") for i in range(2)]
        self.mu_enc = nn.Dense(self.eps_d, name="mu_enc")
        self.logvar_enc = nn.Dense(self.eps_d, name="logvar_enc")
        self.linear_latent = nn.Dense(self.latentD, name="linear_latent")
        self.human_decoder = [ResBlock(2 * self.latentD, name=f"dec_rb{i}") for i in range(2)]
        self.linear_out = nn.Dense(self.n_dim_body, name="linear_out")

    def encode_scene(self, x_s: jax.Array, train: bool = False) -> jax.Array:
        return self.scene_enc(x_s, train)

    def _decode(self, z_h: jax.Array, z_s: jax.Array) -> jax.Array:
        z = self.linear_latent(z_h)
        z = jnp.concatenate([z, z_s], axis=1)
        for rb in self.human_decoder:
            z = rb(z)
        return self.linear_out(z)

    def __call__(
        self,
        x_body: jax.Array,
        x_s: jax.Array,
        key: Optional[jax.Array] = None,
        train: bool = False,
    ) -> Tuple[jax.Array, jax.Array, jax.Array]:
        """Training forward (cvae.py:466-495): returns (x_rec, mu, logvar).

        key=None uses the posterior mean (deterministic eval)."""
        z_s = self.encode_scene(x_s, train)
        z_h = self.linear_in(x_body)
        z = jnp.concatenate([z_h, z_s], axis=1)
        for rb in self.human_encoder:
            z = rb(z)
        mu = self.mu_enc(z)
        logvar = self.logvar_enc(z)
        if key is not None:
            eps = jax.random.normal(key, mu.shape, mu.dtype)
            z_lat = mu + eps * jnp.exp(0.5 * logvar)
        else:
            z_lat = mu
        x_rec = self._decode(z_lat, z_s)
        return x_rec, mu, logvar

    def sample(self, x_s: jax.Array, key: jax.Array, train: bool = False) -> jax.Array:
        """Generate from the prior z ~ N(0, 1) (cvae.py:499-512)."""
        z_s = self.encode_scene(x_s, train)
        eps = jax.random.normal(key, (x_s.shape[0], self.eps_d), z_s.dtype)
        return self._decode(eps, z_s)

    def sample_with_eps(self, x_s: jax.Array, eps: jax.Array, train: bool = False) -> jax.Array:
        """Decode externally-supplied latents (latent sweeps / line search,
        cvae.py:516-534)."""
        z_s = self.encode_scene(x_s, train)
        return self._decode(eps, z_s)

    def sample_with_feat(self, z_s: jax.Array, key: jax.Array) -> jax.Array:
        """Prior draws from precomputed scene features [n, latentD] — the
        serving engine's coalesced path encodes each distinct snapshot
        once and gathers features per population row."""
        eps = jax.random.normal(key, (z_s.shape[0], self.eps_d), z_s.dtype)
        return self._decode(eps, z_s)

    def sample_n(self, x_s: jax.Array, n: int, key: jax.Array, train: bool = False) -> jax.Array:
        """n prior draws for ONE snapshot (x_s [1, H, W, 2]): the scene
        trunk runs once and the feature broadcasts over the population —
        same output as sample(broadcast(x_s, n), key) without n trunk
        forwards. (The reference repeats the image and re-runs the trunk
        per sample, test_proxe_s1.py:104.)"""
        z_s = self.encode_scene(x_s, train)
        z_s = jnp.broadcast_to(z_s, (n, z_s.shape[1]))
        eps = jax.random.normal(key, (n, self.eps_d), z_s.dtype)
        return self._decode(eps, z_s)
