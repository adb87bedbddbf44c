"""ResNet-18 trunk for the scene encoder, NHWC / TPU-native.

The reference builds its scene encoder from torchvision resnet18 with
the first conv replaced by a fresh 2-channel (depth+seg) 7x7/s2 conv
and truncated to ``children()[1:6]`` — i.e. bn1, relu, maxpool,
layer1 (2x BasicBlock-64), layer2 (2x BasicBlock-128/stride-2)
(reference: source/cvae.py:427-437, source/net_layers.py:56-65,152-162).
128x128 input -> [B, 16, 16, 128] features.

This module reproduces exactly that trunk in flax with NHWC layout
(TPU's native conv layout). Explicit torch-style padding keeps spatial
alignment bit-comparable so torchvision weights can be transplanted via
psi_tpu.utils.convert_torch.
"""

from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax


class BasicBlock(nn.Module):
    """torchvision BasicBlock: 3x3 conv-BN-relu, 3x3 conv-BN, skip, relu."""

    features: int
    stride: int = 1

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        identity = x
        y = nn.Conv(
            self.features, (3, 3), strides=(self.stride, self.stride),
            padding=[(1, 1), (1, 1)], use_bias=False, name="conv1",
        )(x)
        y = nn.BatchNorm(use_running_average=not train, momentum=0.9, epsilon=1e-5, name="bn1")(y)
        y = nn.relu(y)
        y = nn.Conv(self.features, (3, 3), padding=[(1, 1), (1, 1)], use_bias=False, name="conv2")(y)
        y = nn.BatchNorm(use_running_average=not train, momentum=0.9, epsilon=1e-5, name="bn2")(y)
        if self.stride != 1 or x.shape[-1] != self.features:
            identity = nn.Conv(
                self.features, (1, 1), strides=(self.stride, self.stride),
                use_bias=False, name="downsample_conv",
            )(x)
            identity = nn.BatchNorm(
                use_running_average=not train, momentum=0.9, epsilon=1e-5, name="downsample_bn"
            )(identity)
        return nn.relu(y + identity)


class ResNet18Trunk(nn.Module):
    """2-ch stem + bn1/relu/maxpool + layer1 + layer2 (through 128 ch).

    Input:  [B, H, W, in_channels] (NHWC; H=W=128 in PSI)
    Output: [B, H/8, W/8, 128]
    """

    in_channels: int = 2
    stage_sizes: Sequence[int] = (2, 2)  # layer1, layer2 (truncated resnet18)

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        x = nn.Conv(
            64, (7, 7), strides=(2, 2), padding=[(3, 3), (3, 3)],
            use_bias=False, name="conv1",
        )(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9, epsilon=1e-5, name="bn1")(x)
        x = nn.relu(x)
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=[(1, 1), (1, 1)])

        for i in range(self.stage_sizes[0]):
            x = BasicBlock(64, stride=1, name=f"layer1_{i}")(x, train)
        for i in range(self.stage_sizes[1]):
            x = BasicBlock(128, stride=2 if i == 0 else 1, name=f"layer2_{i}")(x, train)
        return x
