"""VPoser — the 21-joint body-pose prior VAE.

TPU-native rebuild of the reference's VPoser
(human_body_prior/train/vposer_smpl.py:49-171): encoder
BN+FC(512)+BN+dropout+FC(512) -> Normal(mu, softplus(sigma)); decoder
FC+dropout+FC -> 21x6D continuous rotations -> rotation matrices; the
'aa' output path converts to axis-angle. latentD=32, 512 neurons
(train/vposer_smpl_defaults.ini:35-38).

The PSI training/fitting hot path only needs ``decode`` (e.g.
source/train_s1.py:139-140); ``vposer_decode`` exposes it as a pure
function over the param pytree so it fuses into the loss program.
"""

from __future__ import annotations

from typing import Any, Dict

import flax.linen as nn
import jax
import jax.numpy as jnp

from psi_tpu.geometry.rot6d import rot6d_to_matrix, matrix_to_aa

NUM_VPOSER_JOINTS = 21


class VPoser(nn.Module):
    num_neurons: int = 512
    latentD: int = 32
    num_joints: int = NUM_VPOSER_JOINTS

    @nn.compact
    def __call__(self, pose_aa: jax.Array, deterministic: bool = True, rng_key=None):
        """Full VAE forward on axis-angle input [B, num_joints*3].

        Returns dict(mean, std, pose_aa) like the reference forward
        (vposer_smpl.py:123-141 with output_type='aa')."""
        mean, std = self.encode(pose_aa, deterministic)
        if rng_key is None:
            z = mean
        else:
            z = mean + std * jax.random.normal(rng_key, mean.shape, mean.dtype)
        rec = self.decode_aa(z, deterministic)
        return {"mean": mean, "std": std, "pose_aa": rec}

    @nn.compact
    def _encoder(self, x, deterministic):
        x = nn.BatchNorm(use_running_average=deterministic, name="enc_bn1")(x)
        x = nn.leaky_relu(nn.Dense(self.num_neurons, name="enc_fc1")(x), negative_slope=0.2)
        x = nn.BatchNorm(use_running_average=deterministic, name="enc_bn2")(x)
        x = nn.Dropout(0.1, deterministic=deterministic)(x)
        x = nn.leaky_relu(nn.Dense(self.num_neurons, name="enc_fc2")(x), negative_slope=0.2)
        mu = nn.Dense(self.latentD, name="enc_mu")(x)
        sigma = nn.softplus(nn.Dense(self.latentD, name="enc_logvar")(x))
        return mu, sigma

    def encode(self, pose_aa: jax.Array, deterministic: bool = True):
        """[B, J*3] -> (mu [B, latentD], sigma [B, latentD])."""
        x = pose_aa.reshape(pose_aa.shape[0], -1)
        return self._encoder(x, deterministic)

    @nn.compact
    def _decoder(self, z, deterministic):
        x = nn.leaky_relu(nn.Dense(self.num_neurons, name="dec_fc1")(z), negative_slope=0.2)
        x = nn.Dropout(0.1, deterministic=deterministic)(x)
        x = nn.leaky_relu(nn.Dense(self.num_neurons, name="dec_fc2")(x), negative_slope=0.2)
        x6 = nn.Dense(self.num_joints * 6, name="dec_out")(x)
        return x6

    def decode_matrot(self, z: jax.Array, deterministic: bool = True) -> jax.Array:
        """[B, latentD] -> [B, num_joints, 3, 3]."""
        x6 = self._decoder(z, deterministic)
        return rot6d_to_matrix(x6.reshape(-1, self.num_joints, 6))

    def decode_aa(self, z: jax.Array, deterministic: bool = True) -> jax.Array:
        """[B, latentD] -> [B, num_joints*3] axis-angle (the PSI hot path)."""
        R = self.decode_matrot(z, deterministic)
        return matrix_to_aa(R).reshape(z.shape[0], -1)


def vposer_decode(params: Dict[str, Any], z: jax.Array, num_joints: int = NUM_VPOSER_JOINTS) -> jax.Array:
    """Pure-function decoder: params pytree + latent [B, 32] -> aa [B, 63].

    Equivalent of ``vposer.decode(z, output_type='aa')``
    (reference vposer_smpl.py:107-121) without the module machinery, so
    it inlines into jitted loss programs.
    """
    mdl = VPoser(num_joints=num_joints)
    return mdl.apply(params, z, method=VPoser.decode_aa)


def synthetic_vposer_params(seed: int = 0, num_joints: int = NUM_VPOSER_JOINTS) -> Dict[str, Any]:
    """Randomly-initialized VPoser params (tests/benchmarks without a ckpt)."""
    mdl = VPoser(num_joints=num_joints)
    rng = jax.random.PRNGKey(seed)
    variables = mdl.init(rng, jnp.zeros((2, num_joints * 3)), deterministic=True)
    return variables
