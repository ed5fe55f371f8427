"""ResNet feature extractor (18/34/50/101/152), NHWC flax.

Reproduces the reference's vendored torchvision-v1 ResNet
(ReSIDE/models/resnet.py:27-209: stride on conv2 of Bottleneck, 7×7 stem,
maxpool 3×3/2 pad 1) as a 4-tap feature backbone — the classifier head is
omitted because every consumer (E_resnet, MiDaS Encoder) taps layer1..layer4
(ReSIDE/models/modules.py:44-69, lasinger2019.py:107-111).
"""

from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax

from efficientdepthestimation_tpu.models.common import BatchNorm, Conv
from efficientdepthestimation_tpu.ops.conv import max_pool

__all__ = ["ResNetFeatures", "RESNET_LAYERS", "resnet_block_channels"]

RESNET_LAYERS = {
    "resnet18": ("basic", (2, 2, 2, 2)),
    "resnet34": ("basic", (3, 4, 6, 3)),
    "resnet50": ("bottleneck", (3, 4, 6, 3)),
    "resnet101": ("bottleneck", (3, 4, 23, 3)),
    "resnet152": ("bottleneck", (3, 8, 36, 3)),
}


def resnet_block_channels(name: str) -> list[int]:
    block, _ = RESNET_LAYERS[name]
    expansion = 1 if block == "basic" else 4
    return [64 * expansion, 128 * expansion, 256 * expansion, 512 * expansion]


class BasicBlock(nn.Module):
    planes: int
    stride: int = 1
    has_downsample: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False):
        residual = x
        out = Conv(self.planes, (3, 3), (self.stride,) * 2, 1, use_bias=False, name="conv1")(x)
        out = BatchNorm(name="bn1")(out, use_running_average=not train)
        out = nn.relu(out)
        out = Conv(self.planes, (3, 3), (1, 1), 1, use_bias=False, name="conv2")(out)
        out = BatchNorm(name="bn2")(out, use_running_average=not train)
        if self.has_downsample:
            residual = Conv(self.planes, (1, 1), (self.stride,) * 2, 0, use_bias=False,
                            name="downsample.0")(x)
            residual = BatchNorm(name="downsample.1")(residual, use_running_average=not train)
        return nn.relu(out + residual)


class Bottleneck(nn.Module):
    planes: int
    stride: int = 1
    has_downsample: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False):
        residual = x
        out = Conv(self.planes, (1, 1), (1, 1), 0, use_bias=False, name="conv1")(x)
        out = BatchNorm(name="bn1")(out, use_running_average=not train)
        out = nn.relu(out)
        out = Conv(self.planes, (3, 3), (self.stride,) * 2, 1, use_bias=False, name="conv2")(out)
        out = BatchNorm(name="bn2")(out, use_running_average=not train)
        out = nn.relu(out)
        out = Conv(self.planes * 4, (1, 1), (1, 1), 0, use_bias=False, name="conv3")(out)
        out = BatchNorm(name="bn3")(out, use_running_average=not train)
        if self.has_downsample:
            residual = Conv(self.planes * 4, (1, 1), (self.stride,) * 2, 0, use_bias=False,
                            name="downsample.0")(x)
            residual = BatchNorm(name="downsample.1")(residual, use_running_average=not train)
        return nn.relu(out + residual)


class ResNetFeatures(nn.Module):
    """Stem + layer1..4, returning the four block activations (NHWC)."""

    variant: str = "resnet50"

    @nn.compact
    def __call__(self, x, train: bool = False):
        block_name, layers = RESNET_LAYERS[self.variant]
        block_cls = BasicBlock if block_name == "basic" else Bottleneck
        expansion = 1 if block_name == "basic" else 4

        x = Conv(64, (7, 7), (2, 2), 3, use_bias=False, name="conv1")(x)
        x = BatchNorm(name="bn1")(x, use_running_average=not train)
        x = nn.relu(x)
        x = max_pool(x, 3, 2, padding=1)

        taps = []
        inplanes = 64
        for stage, (planes, blocks) in enumerate(zip((64, 128, 256, 512), layers)):
            stride = 1 if stage == 0 else 2
            for i in range(blocks):
                s = stride if i == 0 else 1
                downsample = i == 0 and (s != 1 or inplanes != planes * expansion)
                x = block_cls(planes, s, downsample, name=f"layer{stage + 1}.{i}")(x, train)
                inplanes = planes * expansion
            taps.append(x)
        return tuple(taps)
