"""Hu2018 decoder (D + MFF + R) and the assembled Hu model (NHWC flax).

Behavioural twin of ReSIDE/models/modules.py:16-298 and net.py:17-39:

  * ``UpProjection``: bilinear-upsample (align_corners=True, exact matmul
    form) feeding two conv branches (5×5→BN→ReLU→3×3→BN and 5×5→BN), summed,
    ReLU.  The upsample-as-matmul + conv pipeline keeps everything on the MXU.
  * ``D``: 1×1 channel-halving conv then 4 chained UpProjections, each
    halving channels and growing to the next block's spatial size, the last
    one 2× beyond block1.
  * ``MFF``: each block tap upsampled to the decoder size via UpProjection to
    16 channels, concatenated (64), 5×5 conv + BN + ReLU.
  * ``R``: two 5×5 conv+BN+ReLU then a 5×5 conv to 1 depth channel.
  * ``HuDepthModel``: out = R(concat(D(taps), MFF(taps))) — output is half
    the input resolution (114×152 for 228×304 inputs).
"""

from __future__ import annotations

from typing import Callable, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from efficientdepthestimation_tpu.models.common import BatchNorm, Conv, kaiming_uniform
from efficientdepthestimation_tpu.ops.conv import conv2d
from efficientdepthestimation_tpu.ops.fused import should_fuse, upsample_conv_pair
from efficientdepthestimation_tpu.ops.resize import resize_bilinear_align_corners

__all__ = ["UpProjection", "DecoderD", "MFF", "RefineR", "HuDepthModel",
           "mff_apply_merged"]


class _Kernel(nn.Module):
    """Bare conv kernel holder: keeps the param path ('<name>', 'kernel')
    identical whether the direct or the fused upsample→conv path runs."""

    shape: tuple[int, int, int, int]

    @nn.compact
    def __call__(self):
        return self.param("kernel", kaiming_uniform(), self.shape)


class UpProjection(nn.Module):
    features: int

    @nn.compact
    def __call__(self, x, size: tuple[int, int], train: bool = False):
        cin = x.shape[-1]
        k1 = _Kernel((5, 5, cin, self.features), name="conv1")()
        k2 = _Kernel((5, 5, cin, self.features), name="conv2")()

        # Exact rewrite of conv5×5∘upsample when it shrinks the intermediate
        # (ops/fused.py) — the MFF branches upsample many-channel maps by
        # large factors; the decoder's 2× steps stay on the direct path.
        if should_fuse(x.shape[1:3], size, cin, self.features):
            b1, b2 = upsample_conv_pair(x, k1, k2, size)
        else:
            up = resize_bilinear_align_corners(x, size)
            # One conv with branch-stacked output channels: a lone
            # ``features``-wide output leaves MXU lanes half-empty when
            # features < 128 (e.g. D.up4's 64); stacking fills them.
            kk = jnp.concatenate([k1, k2], axis=-1).astype(up.dtype)
            b = conv2d(up, kk, stride=1, padding=2)
            b1, b2 = b[..., : self.features], b[..., self.features:]

        b1 = BatchNorm(name="bn1")(b1, use_running_average=not train)
        b1 = nn.relu(b1)
        b1 = Conv(self.features, (3, 3), (1, 1), 1, use_bias=False, name="conv1_2")(b1)
        b1 = BatchNorm(name="bn1_2")(b1, use_running_average=not train)
        b2 = BatchNorm(name="bn2")(b2, use_running_average=not train)
        return nn.relu(b1 + b2)


class DecoderD(nn.Module):
    num_features: int

    @nn.compact
    def __call__(self, taps: Sequence[jax.Array], train: bool = False):
        b1, b2, b3, b4 = taps
        f = self.num_features // 2
        x = Conv(f, (1, 1), (1, 1), 0, use_bias=False, name="conv")(b4)
        x = BatchNorm(name="bn")(x, use_running_average=not train)
        x = nn.relu(x)
        x = UpProjection(f // 2, name="up1")(x, b3.shape[1:3], train)
        x = UpProjection(f // 4, name="up2")(x, b2.shape[1:3], train)
        x = UpProjection(f // 8, name="up3")(x, b1.shape[1:3], train)
        x = UpProjection(f // 16, name="up4")(
            x, (b1.shape[1] * 2, b1.shape[2] * 2), train
        )
        return x


class MFF(nn.Module):
    num_features: int = 64

    @nn.compact
    def __call__(self, taps: Sequence[jax.Array], size: tuple[int, int],
                 train: bool = False):
        ups = []
        for i, tap in enumerate(taps):
            ups.append(UpProjection(16, name=f"up{i + 1}")(tap, size, train))
        x = jnp.concatenate(ups, axis=-1)
        x = Conv(self.num_features, (5, 5), (1, 1), 2, use_bias=False, name="conv")(x)
        x = BatchNorm(name="bn")(x, use_running_average=not train)
        return nn.relu(x)


def _bn_eval(x, p, s, eps: float = 1e-5):
    """torch-eval BatchNorm from raw param/stat dicts (common.BatchNorm math)."""
    inv = jax.lax.rsqrt(s["var"] + eps) * p["scale"]
    out = x.astype(jnp.float32) * inv + (p["bias"] - s["mean"] * inv)
    return out.astype(x.dtype)


def mff_apply_merged(variables, taps: Sequence[jax.Array],
                     size: tuple[int, int], *, block_diag: bool = False):
    """Eval-mode MFF forward with the four branch *tails* merged.

    Numerically equal to ``MFF().apply(variables, taps, size, False)`` and
    reads the exact same variable tree — but after the per-branch
    upsample×conv5×5 heads (which must stay separate: each tap has its own
    source resolution), the four 16-channel tails run as ONE 64-channel
    stream: concatenated BN (channelwise → concat commutes), a single 3×3
    conv with the four ``conv1_2`` kernels stacked as a 4-group conv
    (``block_diag=True`` pads them into one dense 64×64 block-diagonal
    kernel instead — 4× the FLOPs, zeros off-block, but one full-lane MXU
    matmul), BN, add, ReLU. Four lane-starved 16-channel dispatches become
    one 64-channel dispatch (ReSIDE/models/modules.py:104-127 is the op
    being merged).

    Serving-path only (running BN stats); the flax module stays the single
    source of truth for training.
    """
    params, stats = variables["params"], variables["batch_stats"]

    b1s, b2s = [], []
    for i, tap in enumerate(taps):
        up = params[f"up{i + 1}"]
        k1, k2 = up["conv1"]["kernel"], up["conv2"]["kernel"]
        cin, cout = tap.shape[-1], k1.shape[-1]
        if should_fuse(tap.shape[1:3], size, cin, cout):
            b1p, b2p = upsample_conv_pair(tap, k1, k2, size)
        else:
            big = resize_bilinear_align_corners(tap, size)
            kk = jnp.concatenate([k1, k2], axis=-1).astype(big.dtype)
            b = conv2d(big, kk, stride=1, padding=2)
            b1p, b2p = b[..., :cout], b[..., cout:]
        b1s.append(b1p)
        b2s.append(b2p)

    def cat(name, coll, key):
        return jnp.concatenate(
            [(params if coll == "params" else stats)[f"up{i + 1}"][name][key]
             for i in range(4)])

    def cat_bn(x, name):
        return _bn_eval(
            x,
            {"scale": cat(name, "params", "scale"),
             "bias": cat(name, "params", "bias")},
            {"mean": cat(name, "batch_stats", "mean"),
             "var": cat(name, "batch_stats", "var")},
        )

    x1 = nn.relu(cat_bn(jnp.concatenate(b1s, axis=-1), "bn1"))
    ks = [params[f"up{i + 1}"]["conv1_2"]["kernel"] for i in range(4)]
    co = ks[0].shape[-1]
    if block_diag:
        kd = jnp.zeros((*ks[0].shape[:2], 4 * co, 4 * co), ks[0].dtype)
        for i, k in enumerate(ks):
            kd = kd.at[:, :, i * co:(i + 1) * co, i * co:(i + 1) * co].set(k)
        x1 = conv2d(x1, kd.astype(x1.dtype), stride=1, padding=1)
    else:
        kg = jnp.concatenate(ks, axis=-1)  # (3, 3, co, 4·co), 4-group conv
        x1 = conv2d(x1, kg.astype(x1.dtype), stride=1, padding=1, groups=4)
    x1 = cat_bn(x1, "bn1_2")
    x2 = cat_bn(jnp.concatenate(b2s, axis=-1), "bn2")
    x = nn.relu(x1 + x2)

    x = conv2d(x, params["conv"]["kernel"].astype(x.dtype), stride=1, padding=2)
    x = _bn_eval(x, params["bn"], stats["bn"])
    return nn.relu(x)


class RefineR(nn.Module):
    block_channel4: int

    @nn.compact
    def __call__(self, x, train: bool = False):
        f = 64 + self.block_channel4 // 32
        x = Conv(f, (5, 5), (1, 1), 2, use_bias=False, name="conv0")(x)
        x = BatchNorm(name="bn0")(x, use_running_average=not train)
        x = nn.relu(x)
        x = Conv(f, (5, 5), (1, 1), 2, use_bias=False, name="conv1")(x)
        x = BatchNorm(name="bn1")(x, use_running_average=not train)
        x = nn.relu(x)
        return Conv(1, (5, 5), (1, 1), 2, use_bias=True, name="conv2")(x)


class HuDepthModel(nn.Module):
    """Assembled Hu2018 model: encoder module + D/MFF/R decoders.

    ``encoder_factory`` builds any flax module returning 4 NHWC taps (it is
    instantiated under the name "E" to mirror net.model's attribute);
    ``num_features`` / ``block_channel`` mirror define_model's per-encoder
    constants (ReSIDE/train.py:20-38).
    """

    encoder_factory: Callable[..., nn.Module]
    num_features: int
    block_channel: tuple[int, int, int, int]

    @nn.compact
    def __call__(self, x, train: bool = False):
        taps = self.encoder_factory(name="E")(x, train)
        x_d = DecoderD(self.num_features, name="D")(taps, train)
        x_mff = MFF(name="MFF")(taps, x_d.shape[1:3], train)
        out = RefineR(self.block_channel[3], name="R")(
            jnp.concatenate([x_d, x_mff], axis=-1), train
        )
        return out
