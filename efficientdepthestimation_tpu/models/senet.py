"""SENet family feature encoders (NHWC flax).

Behavioural twin of the reference's vendored Cadene SENet
(ReSIDE/models/senet.py): SENet-154 (3×3-conv stem trio, grouped
SEBottleneck groups=64, 3×3 downsample convs in layers 2-4) plus the
SE-ResNet-50/101/152 and SE-ResNeXt-50/101-32x4d variants from the same
pretrained-settings table (ReSIDE/models/senet.py:18-85, 398-453): 7×7 stem,
stride on conv1 (SE-ResNet, Caffe placement) or grouped conv2
(SE-ResNeXt, width = planes·base_width/64·groups), 1×1 downsamples.
All share the Caffe ceil-mode max-pool and the SE block (reduction 16).
Tapped after layer1..layer4 as in E_senet (ReSIDE/models/modules.py:108-121).

Note the reference's own entry points only ever instantiate senet154
(ReSIDE/train.py:26-33); the other configs exist for zoo parity.
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

from efficientdepthestimation_tpu.models.common import BatchNorm, Conv
from efficientdepthestimation_tpu.ops.conv import avg_pool_global, max_pool

__all__ = ["SENetFeatures", "senet_block_channels", "SENET_CONFIGS"]

# name -> constructor fields mirroring the reference's SENet(...) calls
# (ReSIDE/models/senet.py:389-453). layer1 always downsamples with k=1/p=0;
# down_kernel/down_pad apply to layers 2-4 (senet.py:289-327).
SENET_CONFIGS = {
    "senet154": dict(style="senet", layers=(3, 8, 36, 3), groups=64,
                     inplanes=128, input_3x3=True, down_kernel=3, down_pad=1),
    "se_resnet50": dict(style="se_resnet", layers=(3, 4, 6, 3), groups=1,
                        inplanes=64, input_3x3=False, down_kernel=1,
                        down_pad=0),
    "se_resnet101": dict(style="se_resnet", layers=(3, 4, 23, 3), groups=1,
                         inplanes=64, input_3x3=False, down_kernel=1,
                         down_pad=0),
    "se_resnet152": dict(style="se_resnet", layers=(3, 8, 36, 3), groups=1,
                         inplanes=64, input_3x3=False, down_kernel=1,
                         down_pad=0),
    "se_resnext50_32x4d": dict(style="se_resnext", layers=(3, 4, 6, 3),
                               groups=32, inplanes=64, input_3x3=False,
                               down_kernel=1, down_pad=0),
    "se_resnext101_32x4d": dict(style="se_resnext", layers=(3, 4, 23, 3),
                                groups=32, inplanes=64, input_3x3=False,
                                down_kernel=1, down_pad=0),
}


def senet_block_channels(name: str = "senet154") -> list[int]:
    # every variant expands to planes*4 per stage (expansion = 4)
    return [256, 512, 1024, 2048]


class SEBottleneck(nn.Module):
    """SE bottleneck, all three Cadene styles.

    ``style`` fixes the width/stride plumbing (senet.py:136-211):
      * "senet":      1×1 → planes·2, grouped 3×3 (stride) → planes·4
      * "se_resnet":  1×1 (STRIDE — Caffe placement) → planes, 3×3 → planes
      * "se_resnext": 1×1 → width = planes·base_width/64·groups,
                      grouped 3×3 (stride) → width
    followed by 1×1 → planes·4, SE (reduction 16), residual add.
    """

    planes: int
    style: str = "senet"
    groups: int = 64
    reduction: int = 16
    base_width: int = 4
    stride: int = 1
    has_downsample: bool = False
    downsample_kernel: int = 1
    downsample_padding: int = 0

    @nn.compact
    def __call__(self, x, train: bool = False):
        residual = x
        if self.style == "senet":
            w1, w2 = self.planes * 2, self.planes * 4
            s1, s2 = 1, self.stride
        elif self.style == "se_resnet":
            w1 = w2 = self.planes
            s1, s2 = self.stride, 1
        elif self.style == "se_resnext":
            w1 = w2 = int(self.planes * self.base_width / 64) * self.groups
            s1, s2 = 1, self.stride
        else:
            raise ValueError(f"unknown SE bottleneck style {self.style!r}")

        out = Conv(w1, (1, 1), (s1,) * 2, 0, use_bias=False, name="conv1")(x)
        out = BatchNorm(name="bn1")(out, use_running_average=not train)
        out = nn.relu(out)
        out = Conv(w2, (3, 3), (s2,) * 2, 1,
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
    """SENet trunk: layer0 (stem) + layer1..4, returning the 4 taps.

    Defaults are SENet-154; pass ``variant`` for the SE-ResNet/SE-ResNeXt
    rows of ``SENET_CONFIGS``.
    """

    variant: str = "senet154"
    layers: tuple[int, int, int, int] | None = None  # test-size override

    @nn.compact
    def __call__(self, x, train: bool = False):
        cfg = dict(SENET_CONFIGS[self.variant])
        if self.layers is not None:
            cfg["layers"] = self.layers
        inplanes = cfg["inplanes"]
        if cfg["input_3x3"]:
            # SENet-154 stem trio (senet.py:263-276)
            x = Conv(64, (3, 3), (2, 2), 1, use_bias=False, name="layer0.conv1")(x)
            x = BatchNorm(name="layer0.bn1")(x, use_running_average=not train)
            x = nn.relu(x)
            x = Conv(64, (3, 3), (1, 1), 1, use_bias=False, name="layer0.conv2")(x)
            x = BatchNorm(name="layer0.bn2")(x, use_running_average=not train)
            x = nn.relu(x)
            x = Conv(inplanes, (3, 3), (1, 1), 1, use_bias=False, name="layer0.conv3")(x)
            x = BatchNorm(name="layer0.bn3")(x, use_running_average=not train)
            x = nn.relu(x)
        else:
            # SE-ResNet/ResNeXt 7×7 stem (senet.py:278-283)
            x = Conv(inplanes, (7, 7), (2, 2), 3, use_bias=False, name="layer0.conv1")(x)
            x = BatchNorm(name="layer0.bn1")(x, use_running_average=not train)
            x = nn.relu(x)
        # Caffe-compat pool: kernel 3, stride 2, ceil_mode=True (senet.py:285-287)
        x = max_pool(x, 3, 2, padding=0, ceil_mode=True)

        taps = []
        for stage, (planes, blocks) in enumerate(zip((64, 128, 256, 512), cfg["layers"])):
            stride = 1 if stage == 0 else 2
            dk, dp = (1, 0) if stage == 0 else (cfg["down_kernel"], cfg["down_pad"])
            for i in range(blocks):
                s = stride if i == 0 else 1
                has_ds = i == 0 and (s != 1 or inplanes != planes * 4)
                x = SEBottleneck(
                    planes, cfg["style"], cfg["groups"], 16, 4, s, has_ds,
                    dk, dp, name=f"layer{stage + 1}.{i}",
                )(x, train)
                inplanes = planes * 4
            taps.append(x)
        return tuple(taps)
