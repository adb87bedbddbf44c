"""Shared MLP building blocks (reference: source/net_layers.py:12-43)."""

from __future__ import annotations

import flax.linen as nn
import jax


class ResBlock(nn.Module):
    """2x Dense + LeakyReLU with identity skip (net_layers.py:28-43).

    Torch's nn.LeakyReLU() default negative slope 0.01 is kept.
    """

    n_dim: int

    @nn.compact
    def __call__(self, x0: jax.Array) -> jax.Array:
        x = nn.leaky_relu(nn.Dense(self.n_dim, name="fc1")(x0), negative_slope=0.01)
        x = nn.leaky_relu(nn.Dense(self.n_dim, name="fc2")(x), negative_slope=0.01)
        return x + x0


class Swish(nn.Module):
    """x * sigmoid(x) (net_layers.py:12-24)."""

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        return x * nn.sigmoid(x)
