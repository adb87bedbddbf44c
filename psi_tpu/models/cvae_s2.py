"""Stage-2 model: chained "where" (global translation) and "what"
(72-D local pose) CVAEs.

Rebuild of BodyGlobalPoseVAE / BodyLocalPoseVAE / HumanCVAES2
(reference: source/net_layers.py:47-234, source/cvae.py:341-400):

* global VAE: scene feat + Dense(3->nh) torso -> 2 ResBlocks(2nh) ->
  z(32); decoder Dense(nh+32 -> 32) + 2 ResBlocks(32) -> 3.
* local VAE: scene feat + torso + Dense(72->nh) pose -> 2 ResBlocks(3nh)
  -> z(32); decoder Dense(2nh+32 -> 128) + 2 ResBlocks(128) -> 72.
* HumanCVAES2 chains them: the local VAE conditions on the
  *reconstructed* translation (cvae.py:379-385); sampling chains the
  prior branches (cvae.py:390-400).

Each sub-VAE owns its own scene trunk, as in the reference.
"""

from __future__ import annotations

from typing import Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from psi_tpu.models.scene_encoder import SceneEncoder
from psi_tpu.nn.layers import ResBlock


def _reparam(key, mu, logvar):
    eps = jax.random.normal(key, mu.shape, mu.dtype)
    return mu + eps * jnp.exp(0.5 * logvar)


class BodyGlobalPoseVAE(nn.Module):
    zdim: int = 32
    num_hidden: int = 512
    f_dim: int = 32
    in_channels: int = 2

    def setup(self):
        self.scene_enc = SceneEncoder(
            f_dim=self.f_dim, num_hidden=self.num_hidden, in_channels=self.in_channels, name="scene"
        )
        self.torso_linear = nn.Dense(self.num_hidden, name="torso_linear")
        self.encode_blocks = [ResBlock(2 * self.num_hidden, name=f"enc_rb{i}") for i in range(2)]
        self.mean_linear = nn.Dense(self.zdim, name="mean_linear")
        self.log_var_linear = nn.Dense(self.zdim, name="log_var_linear")
        self.dec_in = nn.Dense(self.f_dim, name="dec_in")
        self.dec_blocks = [ResBlock(self.f_dim, name=f"dec_rb{i}") for i in range(2)]
        self.dec_out = nn.Dense(3, name="dec_out")

    def _decode(self, z: jax.Array, z_s: jax.Array) -> jax.Array:
        h = self.dec_in(jnp.concatenate([z, z_s], axis=1))
        for rb in self.dec_blocks:
            h = rb(h)
        return self.dec_out(h)

    def __call__(
        self, scene: jax.Array, torso: jax.Array, key: Optional[jax.Array] = None, train: bool = False
    ) -> Tuple[jax.Array, jax.Array, jax.Array]:
        z_s = self.scene_enc(scene, train)
        f = jnp.concatenate([z_s, self.torso_linear(torso)], axis=1)
        for rb in self.encode_blocks:
            f = rb(f)
        mu = self.mean_linear(f)
        logvar = self.log_var_linear(f)
        z = _reparam(key, mu, logvar) if key is not None else mu
        return self._decode(z, z_s), mu, logvar

    def sample(self, scene: jax.Array, key: jax.Array, train: bool = False) -> jax.Array:
        """Prior branch (net_layers.py:96-106): z ~ N(0,1) -> 3-D translation."""
        z_s = self.scene_enc(scene, train)
        z = jax.random.normal(key, (scene.shape[0], self.zdim), z_s.dtype)
        return self._decode(z, z_s)

    def sample_n(self, scene: jax.Array, n: int, key: jax.Array, train: bool = False) -> jax.Array:
        """n prior draws for ONE snapshot: trunk runs once, feature broadcasts."""
        z_s = self.scene_enc(scene, train)
        z_s = jnp.broadcast_to(z_s, (n, z_s.shape[1]))
        z = jax.random.normal(key, (n, self.zdim), z_s.dtype)
        return self._decode(z, z_s)


class BodyLocalPoseVAE(nn.Module):
    zdim: int = 32
    num_hidden: int = 512
    f_dim: int = 128
    in_channels: int = 2
    n_dim_local: int = 72

    def setup(self):
        self.scene_enc = SceneEncoder(
            f_dim=self.f_dim, num_hidden=self.num_hidden, in_channels=self.in_channels, name="scene"
        )
        self.torso_linear = nn.Dense(self.num_hidden, name="torso_linear")
        self.pose_linear = nn.Dense(self.num_hidden, name="pose_linear")
        self.encode_blocks = [ResBlock(3 * self.num_hidden, name=f"enc_rb{i}") for i in range(2)]
        self.mean_linear = nn.Dense(self.zdim, name="mean_linear")
        self.log_var_linear = nn.Dense(self.zdim, name="log_var_linear")
        self.dec_in = nn.Dense(self.f_dim, name="dec_in")
        self.dec_blocks = [ResBlock(self.f_dim, name=f"dec_rb{i}") for i in range(2)]
        self.dec_out = nn.Dense(self.n_dim_local, name="dec_out")

    def _decode(self, z: jax.Array, z_g: jax.Array, z_s: jax.Array) -> jax.Array:
        h = self.dec_in(jnp.concatenate([z, z_g, z_s], axis=1))
        for rb in self.dec_blocks:
            h = rb(h)
        return self.dec_out(h)

    def __call__(
        self,
        scene: jax.Array,
        torso: jax.Array,
        pose: jax.Array,
        key: Optional[jax.Array] = None,
        train: bool = False,
    ) -> Tuple[jax.Array, jax.Array, jax.Array]:
        z_s = self.scene_enc(scene, train)
        z_g = self.torso_linear(torso)
        z_l = self.pose_linear(pose)
        f = jnp.concatenate([z_l, z_g, z_s], axis=1)
        for rb in self.encode_blocks:
            f = rb(f)
        mu = self.mean_linear(f)
        logvar = self.log_var_linear(f)
        z = _reparam(key, mu, logvar) if key is not None else mu
        return self._decode(z, z_g, z_s), mu, logvar

    def sample(self, scene: jax.Array, torso: jax.Array, key: jax.Array, train: bool = False) -> jax.Array:
        """Prior branch (net_layers.py:196-208)."""
        z_s = self.scene_enc(scene, train)
        z_g = self.torso_linear(torso)
        z = jax.random.normal(key, (scene.shape[0], self.zdim), z_s.dtype)
        return self._decode(z, z_g, z_s)

    def sample_n(self, scene: jax.Array, torso: jax.Array, key: jax.Array, train: bool = False) -> jax.Array:
        """Prior draws for ONE snapshot and a per-row torso [n, 3]:
        trunk runs once, feature broadcasts over the torso rows."""
        n = torso.shape[0]
        z_s = self.scene_enc(scene, train)
        z_s = jnp.broadcast_to(z_s, (n, z_s.shape[1]))
        z_g = self.torso_linear(torso)
        z = jax.random.normal(key, (n, self.zdim), z_s.dtype)
        return self._decode(z, z_g, z_s)


class HumanCVAES2(nn.Module):
    """Two-stage CVAE (cvae.py:341-400). n_dim_body includes the 3-D
    translation; the local part is n_dim_body - 3 (72 with 6D rot)."""

    latentD_g: int = 256
    latentD_l: int = 256
    n_dim_body: int = 75
    scene_in_channels: int = 2

    def setup(self):
        self.trans_vae = BodyGlobalPoseVAE(
            zdim=32, num_hidden=self.latentD_g, in_channels=self.scene_in_channels, name="trans_vae"
        )
        self.pose_vae = BodyLocalPoseVAE(
            zdim=32,
            num_hidden=self.latentD_l,
            in_channels=self.scene_in_channels,
            n_dim_local=self.n_dim_body - 3,
            name="pose_vae",
        )

    def __call__(
        self, x_body: jax.Array, x_s: jax.Array, key: Optional[jax.Array] = None, train: bool = False
    ):
        """Training forward: returns (x_rec, mu_g, logvar_g, mu_l, logvar_l).

        The local VAE sees the *reconstructed* global translation
        (cvae.py:379-385)."""
        x_g = x_body[:, :3]
        x_l = x_body[:, 3:]
        kg, kl = (jax.random.split(key) if key is not None else (None, None))
        x_g_rec, mu_g, logvar_g = self.trans_vae(x_s, x_g, kg, train)
        x_l_rec, mu_l, logvar_l = self.pose_vae(x_s, x_g_rec, x_l, kl, train)
        x_rec = jnp.concatenate([x_g_rec, x_l_rec], axis=1)
        return x_rec, mu_g, logvar_g, mu_l, logvar_l

    def sample(self, x_s: jax.Array, key: jax.Array, train: bool = False) -> jax.Array:
        """Chained prior sampling (cvae.py:390-400)."""
        kg, kl = jax.random.split(key)
        x_g = self.trans_vae.sample(x_s, kg, train)
        x_l = self.pose_vae.sample(x_s, x_g, kl, train)
        return jnp.concatenate([x_g, x_l], axis=1)

    def sample_n(self, x_s: jax.Array, n: int, key: jax.Array, train: bool = False) -> jax.Array:
        """Chained prior sampling for ONE snapshot (x_s [1, H, W, 2]):
        each sub-VAE's trunk runs once instead of n times."""
        kg, kl = jax.random.split(key)
        x_g = self.trans_vae.sample_n(x_s, n, kg, train)
        x_l = self.pose_vae.sample_n(x_s, x_g, kl, train)
        return jnp.concatenate([x_g, x_l], axis=1)

    def encode_scenes(self, x_s: jax.Array, train: bool = False):
        """Both sub-VAE scene features for a snapshot stack [R, H, W, 2]."""
        return self.trans_vae.scene_enc(x_s, train), self.pose_vae.scene_enc(x_s, train)

    def sample_with_feats(self, z_s_g: jax.Array, z_s_l: jax.Array, key: jax.Array) -> jax.Array:
        """Chained prior draws from precomputed per-row scene features."""
        n = z_s_g.shape[0]
        kg, kl = jax.random.split(key)
        zg = jax.random.normal(kg, (n, self.trans_vae.zdim), z_s_g.dtype)
        x_g = self.trans_vae._decode(zg, z_s_g)
        z_gl = self.pose_vae.torso_linear(x_g)
        zl = jax.random.normal(kl, (n, self.pose_vae.zdim), z_s_l.dtype)
        x_l = self.pose_vae._decode(zl, z_gl, z_s_l)
        return jnp.concatenate([x_g, x_l], axis=1)
