"""Scene feature encoder: ResNet18 trunk -> 3x3 conv -> flatten -> Dense.

Common head shared by every PSI VAE (reference: source/cvae.py:427-437
and source/net_layers.py:56-65,152-162): trunk features [B,16,16,128]
-> Conv(128->f_dim, 3x3, pad 1) -> flatten -> Dense(num_hidden).

Flatten-order note: the reference flattens NCHW (channel-major); here
features are NHWC. The flatten order only permutes the following Dense
weight rows, which the torch weight converter accounts for.
"""

from __future__ import annotations

import flax.linen as nn
import jax

from psi_tpu.models.resnet import ResNet18Trunk


class SceneEncoder(nn.Module):
    f_dim: int = 32
    num_hidden: int = 512
    in_channels: int = 2

    @nn.compact
    def __call__(self, x_s: jax.Array, train: bool = False) -> jax.Array:
        """x_s: [B, H, W, in_channels] -> [B, num_hidden]."""
        b = x_s.shape[0]
        feat = ResNet18Trunk(in_channels=self.in_channels, name="resnet")(x_s, train)
        feat = nn.Conv(self.f_dim, (3, 3), padding=[(1, 1), (1, 1)], name="conv")(feat)
        return nn.Dense(self.num_hidden, name="fc")(feat.reshape(b, -1))
