"""SENet-154 feature encoder (NHWC flax).

Behavioural twin of the reference's vendored Cadene SENet
(ReSIDE/models/senet.py): 3×3-conv stem trio, ceil-mode max-pool (Caffe
compatibility), grouped SEBottleneck (groups=64, reduction=16), and 3×3
downsample convs in layers 2-4. Tapped after layer1..layer4 as in E_senet
(ReSIDE/models/modules.py:108-121).
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

from efficientdepthestimation_tpu.models.common import BatchNorm, Conv
from efficientdepthestimation_tpu.ops.conv import avg_pool_global, max_pool

__all__ = ["SENetFeatures", "senet_block_channels"]


def senet_block_channels(name: str = "senet154") -> list[int]:
    return [256, 512, 1024, 2048]


class SEBottleneck(nn.Module):
    """SENet-154 bottleneck: 1×1 → grouped 3×3 (stride) → 1×1, SE, residual."""

    planes: int
    groups: int = 64
    reduction: int = 16
    stride: int = 1
    has_downsample: bool = False
    downsample_kernel: int = 1
    downsample_padding: int = 0

    @nn.compact
    def __call__(self, x, train: bool = False):
        residual = x
        out = Conv(self.planes * 2, (1, 1), (1, 1), 0, use_bias=False, name="conv1")(x)
        out = BatchNorm(name="bn1")(out, use_running_average=not train)
        out = nn.relu(out)
        out = Conv(self.planes * 4, (3, 3), (self.stride,) * 2, 1,
                   groups=self.groups, use_bias=False, name="conv2")(out)
        out = BatchNorm(name="bn2")(out, use_running_average=not train)
        out = nn.relu(out)
        out = Conv(self.planes * 4, (1, 1), (1, 1), 0, use_bias=False, name="conv3")(out)
        out = BatchNorm(name="bn3")(out, use_running_average=not train)

        if self.has_downsample:
            residual = Conv(self.planes * 4, (self.downsample_kernel,) * 2,
                            (self.stride,) * 2, self.downsample_padding,
                            use_bias=False, name="downsample.0")(x)
            residual = BatchNorm(name="downsample.1")(residual,
                                                      use_running_average=not train)

        # Squeeze-and-excitation (SEModule, senet.py:88-107)
        se = avg_pool_global(out)
        se = Conv(out.shape[-1] // self.reduction, (1, 1), name="se_module.fc1")(se)
        se = nn.relu(se)
        se = Conv(out.shape[-1], (1, 1), name="se_module.fc2")(se)
        out = out * jax.nn.sigmoid(se)

        return nn.relu(out + residual)


class SENetFeatures(nn.Module):
    """SENet-154 trunk: layer0 (stem) + layer1..4, returning the 4 taps."""

    layers: tuple[int, int, int, int] = (3, 8, 36, 3)
    groups: int = 64
    reduction: int = 16
    inplanes: int = 128

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = Conv(64, (3, 3), (2, 2), 1, use_bias=False, name="layer0.conv1")(x)
        x = BatchNorm(name="layer0.bn1")(x, use_running_average=not train)
        x = nn.relu(x)
        x = Conv(64, (3, 3), (1, 1), 1, use_bias=False, name="layer0.conv2")(x)
        x = BatchNorm(name="layer0.bn2")(x, use_running_average=not train)
        x = nn.relu(x)
        x = Conv(self.inplanes, (3, 3), (1, 1), 1, use_bias=False, name="layer0.conv3")(x)
        x = BatchNorm(name="layer0.bn3")(x, use_running_average=not train)
        x = nn.relu(x)
        # Caffe-compat pool: kernel 3, stride 2, ceil_mode=True (senet.py:285-287)
        x = max_pool(x, 3, 2, padding=0, ceil_mode=True)

        taps = []
        inplanes = self.inplanes
        for stage, (planes, blocks) in enumerate(zip((64, 128, 256, 512), self.layers)):
            stride = 1 if stage == 0 else 2
            dk, dp = (1, 0) if stage == 0 else (3, 1)
            for i in range(blocks):
                s = stride if i == 0 else 1
                has_ds = i == 0 and (s != 1 or inplanes != planes * 4)
                x = SEBottleneck(
                    planes, self.groups, self.reduction, s, has_ds, dk, dp,
                    name=f"layer{stage + 1}.{i}",
                )(x, train)
                inplanes = planes * 4
            taps.append(x)
        return tuple(taps)
