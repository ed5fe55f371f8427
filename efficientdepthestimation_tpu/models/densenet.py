"""DenseNet-161 feature encoder (NHWC flax).

Behavioural twin of the reference's vendored DenseNet
(ReSIDE/models/densenet.py) including its *old-torchvision* dotted submodule
names ('norm.1', 'conv.1', …) so state-dict keys line up, and the Hu2018
encoder's mid-transition taps (ReSIDE/models/modules.py:78-105): features are
tapped after each transition's conv (before the avg-pool) and after
relu(norm5) for the last block.
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

from efficientdepthestimation_tpu.models.common import BatchNorm, Conv
from efficientdepthestimation_tpu.ops.conv import max_pool

__all__ = ["DenseNetFeatures", "DENSENET_CONFIGS", "densenet_block_channels"]

# name -> (num_init_features, growth_rate, block_config)
DENSENET_CONFIGS = {
    "densenet121": (64, 32, (6, 12, 24, 16)),
    "densenet169": (64, 32, (6, 12, 32, 32)),
    "densenet201": (64, 32, (6, 12, 48, 32)),
    "densenet161": (96, 48, (6, 12, 36, 24)),
}


def densenet_block_channels(name: str) -> list[int]:
    init, growth, cfg = DENSENET_CONFIGS[name]
    chans = []
    c = init
    for i, n in enumerate(cfg):
        c = c + n * growth
        if i < 3:
            c = c // 2  # transition conv halves channels; taps are post-conv
        chans.append(c)
    return chans


class DenseLayer(nn.Module):
    growth_rate: int
    bn_size: int = 4

    @nn.compact
    def __call__(self, x, train: bool = False):
        out = BatchNorm(name="norm.1")(x, use_running_average=not train)
        out = nn.relu(out)
        out = Conv(self.bn_size * self.growth_rate, (1, 1), (1, 1), 0,
                   use_bias=False, name="conv.1")(out)
        out = BatchNorm(name="norm.2")(out, use_running_average=not train)
        out = nn.relu(out)
        out = Conv(self.growth_rate, (3, 3), (1, 1), 1, use_bias=False,
                   name="conv.2")(out)
        return jnp.concatenate([x, out], axis=-1)


class DenseNetFeatures(nn.Module):
    variant: str = "densenet161"

    @nn.compact
    def __call__(self, x, train: bool = False):
        init, growth, cfg = DENSENET_CONFIGS[self.variant]

        x = Conv(init, (7, 7), (2, 2), 3, use_bias=False, name="features.conv0")(x)
        x = BatchNorm(name="features.norm0")(x, use_running_average=not train)
        x = nn.relu(x)
        x = max_pool(x, 3, 2, padding=1)

        taps = []
        c = init
        for bi, num_layers in enumerate(cfg):
            for li in range(num_layers):
                x = DenseLayer(
                    growth, name=f"features.denseblock{bi + 1}.denselayer{li + 1}"
                )(x, train)
            c = c + num_layers * growth
            if bi < 3:
                x = BatchNorm(name=f"features.transition{bi + 1}.norm")(
                    x, use_running_average=not train
                )
                x = nn.relu(x)
                x = Conv(c // 2, (1, 1), (1, 1), 0, use_bias=False,
                         name=f"features.transition{bi + 1}.conv")(x)
                c = c // 2
                taps.append(x)  # tap BEFORE the transition pool (modules.py:85-88)
                x = nn.avg_pool(x, (2, 2), (2, 2))
            else:
                x = BatchNorm(name="features.norm5")(x, use_running_average=not train)
                x = nn.relu(x)
                taps.append(x)
        return tuple(taps)
