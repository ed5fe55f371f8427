"""EfficientNet-B0..B7 feature encoder, built from scratch in flax (NHWC).

Reproduces the *behaviour* of the ``efficientnet_pytorch`` 0.6.3 package the
reference depends on (requirements.txt:8; consumed via
ReSIDE/models/modules.py:124-200 and lasinger2019.py:55-91):

  * MBConv blocks (expand 1×1 → depthwise k×k → squeeze-excite → project 1×1)
    with swish activations and BatchNorm(momentum 0.01, eps 1e-3).
  * **Static same padding**: every conv's zero padding is precomputed from the
    variant's *canonical* ImageNet resolution (224 for B0, 380 for B4, …) and
    is asymmetric (extra pixel on the right/bottom). This is baked into the
    released checkpoints — runtime inputs of different parity (e.g. 228×304)
    MUST still use the canonical padding, so we track the canonical image
    size through the network at construction time.
  * Channel/depth scaling via round_filters / round_repeats.
  * Drop-connect (stochastic depth) scaled linearly over block index, active
    only in training.

The encoder exposes the reference's 4-stage feature taps
(block split indices from ReSIDE/models/modules.py:168-183).
"""

from __future__ import annotations

import math
from typing import Any, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from efficientdepthestimation_tpu.models.common import BatchNorm, Conv
from efficientdepthestimation_tpu.ops.conv import same_padding_static

__all__ = [
    "EfficientNetFeatures",
    "efficientnet_apply_fused",
    "efficientnet_block_channels",
    "efficientnet_stage_splits",
    "EFFICIENTNET_PARAMS",
]

# (width_mult, depth_mult, canonical resolution, dropout)
EFFICIENTNET_PARAMS = {
    "efficientnet-b0": (1.0, 1.0, 224, 0.2),
    "efficientnet-b1": (1.0, 1.1, 240, 0.2),
    "efficientnet-b2": (1.1, 1.2, 260, 0.3),
    "efficientnet-b3": (1.2, 1.4, 300, 0.3),
    "efficientnet-b4": (1.4, 1.8, 380, 0.4),
    "efficientnet-b5": (1.6, 2.2, 456, 0.4),
    "efficientnet-b6": (1.8, 2.6, 528, 0.5),
    "efficientnet-b7": (2.0, 3.1, 600, 0.5),
}

# Base (B0) stage definitions: (repeats, kernel, stride, expand, cin, cout, se)
_BASE_STAGES = (
    (1, 3, 1, 1, 32, 16, 0.25),
    (2, 3, 2, 6, 16, 24, 0.25),
    (2, 5, 2, 6, 24, 40, 0.25),
    (3, 3, 2, 6, 40, 80, 0.25),
    (3, 5, 1, 6, 80, 112, 0.25),
    (4, 5, 2, 6, 112, 192, 0.25),
    (1, 3, 1, 6, 192, 320, 0.25),
)

# 4-way encoder split boundaries per variant (reference
# ReSIDE/models/modules.py:168-183; final bound is appended dynamically).
_SPLIT_INDICES = {
    "efficientnet-b0": (0, 3, 5, 8),
    "efficientnet-b1": (0, 5, 8, 16),
    "efficientnet-b2": (0, 5, 8, 16),
    "efficientnet-b3": (0, 5, 8, 18),
    "efficientnet-b4": (0, 6, 10, 22),
    "efficientnet-b5": (0, 8, 13, 27),
    "efficientnet-b6": (0, 9, 15, 31),
    "efficientnet-b7": (0, 11, 18, 38),
}


def round_filters(filters: int, width_mult: float, divisor: int = 8) -> int:
    filters *= width_mult
    new_filters = max(divisor, int(filters + divisor / 2) // divisor * divisor)
    if new_filters < 0.9 * filters:
        new_filters += divisor
    return int(new_filters)


def round_repeats(repeats: int, depth_mult: float) -> int:
    return int(math.ceil(depth_mult * repeats))


def _block_plan(variant: str):
    """Expanded per-block args.

    efficientnet_pytorch **0.6.3** (the version the reference pins,
    requirements.txt:8) computes every conv's static same padding from the
    *global* canonical image size — per-block image-size tracking only
    appeared in 0.7.0. We therefore hand each block the same canonical
    ``(res, res)``; padding then depends only on (kernel, stride, parity of
    res), and all canonical resolutions are even.
    """
    width, depth, res, _ = EFFICIENTNET_PARAMS[variant]
    plan = []
    stem_out = round_filters(32, width)
    for repeats, k, s, expand, cin, cout, se in _BASE_STAGES:
        cin_r = round_filters(cin, width)
        cout_r = round_filters(cout, width)
        n = round_repeats(repeats, depth)
        for i in range(n):
            stride = s if i == 0 else 1
            block_cin = cin_r if i == 0 else cout_r
            plan.append(dict(kernel=k, stride=stride, expand=expand,
                             cin=block_cin, cout=cout_r, se=se,
                             image_size=(res, res)))
    return stem_out, plan


def efficientnet_block_channels(variant: str) -> list[int]:
    """Output channels at the 4 encoder taps (last block's cout per split)."""
    _, plan = _block_plan(variant)
    lo = _SPLIT_INDICES[variant]
    bounds = list(lo[1:]) + [len(plan)]
    return [plan[b - 1]["cout"] for b in bounds]


def efficientnet_stage_splits(variant: str) -> list[int]:
    _, plan = _block_plan(variant)
    return list(_SPLIT_INDICES[variant]) + [len(plan)]


def _swish(x):
    return x * jax.nn.sigmoid(x)


class MBConvBlock(nn.Module):
    kernel: int
    stride: int
    expand: int
    cin: int
    cout: int
    se: float
    image_size: tuple[int, int]
    drop_rate: float = 0.0

    @nn.compact
    def __call__(self, x, train: bool = False):
        inputs = x
        bn = dict(momentum=0.01, eps=1e-3)
        if self.expand != 1:
            x = Conv(self.cin * self.expand, (1, 1), (1, 1), 0, use_bias=False,
                     name="_expand_conv")(x)
            x = BatchNorm(name="_bn0", **bn)(x, use_running_average=not train)
            x = _swish(x)
        pad = same_padding_static(self.image_size, (self.kernel,) * 2,
                                  (self.stride,) * 2)
        x = Conv(self.cin * self.expand, (self.kernel,) * 2, (self.stride,) * 2,
                 pad, groups=self.cin * self.expand, use_bias=False,
                 name="_depthwise_conv")(x)
        x = BatchNorm(name="_bn1", **bn)(x, use_running_average=not train)
        x = _swish(x)

        if self.se > 0:
            squeezed = jnp.mean(x, axis=(1, 2), keepdims=True)
            n_sq = max(1, int(self.cin * self.se))
            squeezed = Conv(n_sq, (1, 1), name="_se_reduce")(squeezed)
            squeezed = _swish(squeezed)
            squeezed = Conv(x.shape[-1], (1, 1), name="_se_expand")(squeezed)
            x = jax.nn.sigmoid(squeezed) * x

        x = Conv(self.cout, (1, 1), (1, 1), 0, use_bias=False, name="_project_conv")(x)
        x = BatchNorm(name="_bn2", **bn)(x, use_running_average=not train)

        if self.stride == 1 and self.cin == self.cout:
            if train and self.drop_rate > 0:
                keep = 1.0 - self.drop_rate
                rng = self.make_rng("dropout")
                mask = jax.random.bernoulli(rng, keep, (x.shape[0], 1, 1, 1))
                x = x / keep * mask
            x = x + inputs
        return x


def efficientnet_apply_fused(variables, x, variant: str = "efficientnet-b0",
                             *, interpret: bool | None = None):
    """Eval-mode functional forward with the Pallas fused-MBConv hot path.

    Semantically identical to ``EfficientNetFeatures(variant).apply(...,
    train=False)`` on the SAME variable tree, but each block's
    depthwise-conv → BatchNorm → swish → SE-mean runs as ONE Pallas VMEM
    pass (ops.pallas.depthwise): the 6×-expanded activation is read from
    HBM once instead of four times, and the squeeze-excite mean reuses the
    kernel's per-channel spatial sums instead of re-reading the output.
    Expand/project 1×1 convs (the MXU work) and the tiny SE matmuls stay in
    XLA. Serving-only (no dropout/drop-connect, running BN stats).
    """
    from efficientdepthestimation_tpu.ops.pallas.depthwise import (
        depthwise_bn_swish,
        fold_bn,
    )

    params = variables["params"]
    stats = variables["batch_stats"]
    width, depth, res, _ = EFFICIENTNET_PARAMS[variant]
    stem_out, plan = _block_plan(variant)

    def bn_eval(v, name_p, name_s, eps=1e-3):
        scale, bias = fold_bn(name_p, name_s, eps)
        out = v.astype(jnp.float32) * scale + bias
        return out.astype(v.dtype)

    pad = same_padding_static((res, res), (3, 3), (2, 2))
    kern = params["_conv_stem"]["kernel"]
    from efficientdepthestimation_tpu.ops.conv import conv2d

    x = conv2d(x, kern.astype(x.dtype), stride=(2, 2), padding=pad)
    x = bn_eval(x, params["_bn0"], stats["_bn0"])
    x = _swish(x)

    splits = set(efficientnet_stage_splits(variant)[1:])
    taps = []
    for i, args in enumerate(plan):
        bp = params[f"_blocks.{i}"]
        bs = stats[f"_blocks.{i}"]
        inputs = x
        if args["expand"] != 1:
            x = conv2d(x, bp["_expand_conv"]["kernel"].astype(x.dtype),
                       stride=1, padding=0)
            x = bn_eval(x, bp["_bn0"], bs["_bn0"])
            x = _swish(x)
        dw_pad = same_padding_static(args["image_size"],
                                     (args["kernel"],) * 2,
                                     (args["stride"],) * 2)
        dw_taps = bp["_depthwise_conv"]["kernel"][:, :, 0, :].astype(x.dtype)
        scale, bias = fold_bn(bp["_bn1"], bs["_bn1"])
        x, sums = depthwise_bn_swish(x, dw_taps, scale, bias,
                                     stride=(args["stride"],) * 2,
                                     padding=dw_pad, interpret=interpret)
        if args["se"] > 0:
            mean = (sums / (x.shape[1] * x.shape[2])).astype(x.dtype)
            sq = mean[:, None, None, :]
            sq = conv2d(sq, bp["_se_reduce"]["kernel"].astype(x.dtype),
                        stride=1, padding=0,
                        bias=bp["_se_reduce"]["bias"].astype(x.dtype))
            sq = _swish(sq)
            sq = conv2d(sq, bp["_se_expand"]["kernel"].astype(x.dtype),
                        stride=1, padding=0,
                        bias=bp["_se_expand"]["bias"].astype(x.dtype))
            x = jax.nn.sigmoid(sq) * x
        x = conv2d(x, bp["_project_conv"]["kernel"].astype(x.dtype),
                   stride=1, padding=0)
        x = bn_eval(x, bp["_bn2"], bs["_bn2"])
        if args["stride"] == 1 and args["cin"] == args["cout"]:
            x = x + inputs
        if i + 1 in splits:
            taps.append(x)
    return tuple(taps)


class EfficientNetFeatures(nn.Module):
    """Stem + MBConv blocks, returning the reference's 4 encoder taps."""

    variant: str = "efficientnet-b0"
    drop_connect_rate: float = 0.2

    @nn.compact
    def __call__(self, x, train: bool = False):
        width, depth, res, _ = EFFICIENTNET_PARAMS[self.variant]
        stem_out, plan = _block_plan(self.variant)

        pad = same_padding_static((res, res), (3, 3), (2, 2))
        x = Conv(stem_out, (3, 3), (2, 2), pad, use_bias=False, name="_conv_stem")(x)
        x = BatchNorm(name="_bn0", momentum=0.01, eps=1e-3)(x, use_running_average=not train)
        x = _swish(x)

        splits = set(efficientnet_stage_splits(self.variant)[1:])
        taps = []
        for i, args in enumerate(plan):
            x = MBConvBlock(
                kernel=args["kernel"], stride=args["stride"], expand=args["expand"],
                cin=args["cin"], cout=args["cout"], se=args["se"],
                image_size=args["image_size"],
                drop_rate=self.drop_connect_rate * i / len(plan),
                name=f"_blocks.{i}",
            )(x, train)
            if i + 1 in splits:
                taps.append(x)
        return tuple(taps)
