"""MiDaS-style residual decoder, MidasNet, and Discriminator (NHWC flax).

Behavioural twin of ReSIDE/models/lasinger2019.py:123-491:

  * Pre-activation ``ResidualBlock`` / ``BottleneckBlock`` whose optional 1×1
    projection is applied to the *raw* input (lasinger2019.py:158-161).
  * ``DecoderBlock``: ``out = prev + res1(enc); out = res2(out)`` (res2 is
    skipped — but still parameterized — for the deepest block), then bilinear
    align_corners=True resize to the next encoder scale.
  * ``MidasDecoder``: top-down over reversed encoder taps with target sizes
    [s(t3), s(t2), s(t1), 2·s(t1)], then head conv1(3×3,128)+BN+ReLU →
    resize to ``output_size`` → conv2(3×3,32)+BN+ReLU → conv3(1×1→1)
    (+ ReLU iff ``non_negative``).
  * ``MidasNet``: encoder + decoder with WH↔HW-converting size metadata and
    the self-describing checkpoint schema (handled in
    checkpoints/serialization.py).
  * ``Discriminator``: patch-style critic — unused by any entry point in the
    reference (vestigial) but kept for API completeness.
"""

from __future__ import annotations

from typing import Callable, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from efficientdepthestimation_tpu.models.common import BatchNorm, Conv
from efficientdepthestimation_tpu.ops.conv import avg_pool_global
from efficientdepthestimation_tpu.ops.resize import resize_bilinear_align_corners

__all__ = ["ResidualBlock", "BottleneckBlock", "DecoderBlock", "MidasDecoder",
           "MidasNet", "Discriminator"]


class ResidualBlock(nn.Module):
    features: int
    stride: int = 1
    project: bool = False  # in_channels != out_channels in the reference

    @nn.compact
    def __call__(self, x, train: bool = False):
        out = nn.relu(x)
        out = Conv(self.features, (3, 3), (self.stride,) * 2, 1, use_bias=False,
                   name="conv1")(out)
        out = BatchNorm(name="bn1")(out, use_running_average=not train)
        out = nn.relu(out)
        out = Conv(self.features, (3, 3), (1, 1), 1, use_bias=False, name="conv2")(out)
        out = BatchNorm(name="bn2")(out, use_running_average=not train)
        if self.project:
            res = Conv(self.features, (1, 1), (self.stride,) * 2, 0, use_bias=False,
                       name="down_sample.0")(x)
            res = BatchNorm(name="down_sample.1")(res, use_running_average=not train)
        else:
            res = x
        return out + res


class BottleneckBlock(nn.Module):
    features: int
    project: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False):
        mid = max(1, self.features // 4)
        out = nn.relu(x)
        out = Conv(mid, (1, 1), (1, 1), 0, use_bias=False, name="conv1")(out)
        out = BatchNorm(name="bn1")(out, use_running_average=not train)
        out = nn.relu(out)
        out = Conv(mid, (3, 3), (1, 1), 1, use_bias=False, name="conv2")(out)
        out = BatchNorm(name="bn2")(out, use_running_average=not train)
        out = nn.relu(out)
        out = Conv(self.features, (1, 1), (1, 1), 0, use_bias=False, name="conv3")(out)
        out = BatchNorm(name="bn3")(out, use_running_average=not train)
        if self.project:
            res = Conv(self.features, (1, 1), (1, 1), 0, use_bias=False,
                       name="down_sample.0")(x)
            res = BatchNorm(name="down_sample.1")(res, use_running_average=not train)
        else:
            res = x
        return out + res


def _make_block(block_type: str, features: int, in_features: int, name: str):
    project = in_features != features
    if block_type == "bottleneck":
        return BottleneckBlock(features, project=project, name=name)
    return ResidualBlock(features, project=project, name=name)


class DecoderBlock(nn.Module):
    features: int
    in_features: int
    block_type: str = "residual"

    @nn.compact
    def __call__(self, enc, prev, size: tuple[int, int], train: bool = False):
        res1 = _make_block(self.block_type, self.features, self.in_features, "res_block1")
        res2 = _make_block(self.block_type, self.features, self.features, "res_block2")
        if prev is None:
            out = res1(enc, train)
            if self.is_initializing():
                # The reference parameterizes res_block2 on the deepest block
                # even though its forward never runs it (lasinger2019.py:238-242);
                # materialize the params so checkpoints line up key-for-key.
                res2(out, train)
        else:
            out = prev + res1(enc, train)
            out = res2(out, train)
        return resize_bilinear_align_corners(out, size)


class MidasDecoder(nn.Module):
    encoder_block_channels: tuple[int, ...]
    num_features: int | str = "auto"
    non_negative: bool = False
    block_type: str = "residual"

    @property
    def feature_count(self) -> int:
        if self.num_features == "auto":
            return int(self.encoder_block_channels[0])
        return int(self.num_features)

    @nn.compact
    def __call__(self, taps: Sequence[jax.Array], output_size: tuple[int, int],
                 train: bool = False):
        f = self.feature_count
        sizes = [t.shape[1:3] for t in reversed(list(taps)[:-1])]
        sizes.append((sizes[-1][0] * 2, sizes[-1][1] * 2))

        out = None
        for i, (enc, size) in enumerate(zip(reversed(list(taps)), sizes)):
            out = DecoderBlock(
                f, int(enc.shape[-1]), self.block_type, name=f"blocks.{i}"
            )(enc, out, size, train)

        out = Conv(128, (3, 3), (1, 1), 1, use_bias=False, name="conv1")(out)
        out = BatchNorm(name="bn1")(out, use_running_average=not train)
        out = nn.relu(out)
        out = resize_bilinear_align_corners(out, output_size)
        out = Conv(32, (3, 3), (1, 1), 1, use_bias=False, name="conv2")(out)
        out = BatchNorm(name="bn2")(out, use_running_average=not train)
        out = nn.relu(out)
        out = Conv(1, (1, 1), (1, 1), 0, use_bias=True, name="conv3")(out)
        if self.non_negative:
            out = nn.relu(out)
        return out


class MidasNet(nn.Module):
    """Encoder + MiDaS decoder.

    ``output_size`` / ``input_size`` are stored in HW order here (the torch
    class keeps HW internally and converts at its WH-facing properties,
    lasinger2019.py:335-367); the checkpoint schema stores WH for parity.
    """

    encoder_factory: Callable[..., nn.Module]
    encoder_block_channels: tuple[int, ...]
    output_size: tuple[int, int] = (114, 152)   # HW
    input_size: tuple[int, int] | None = None   # HW, metadata only
    num_features: int | str = "auto"
    non_negative: bool = False
    adversarial_training: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False):
        taps = self.encoder_factory(name="encoder")(x, train)
        return MidasDecoder(
            tuple(self.encoder_block_channels),
            self.num_features,
            self.non_negative,
            name="decoder",
        )(taps, self.output_size, train)


class Discriminator(nn.Module):
    """Patch-style GAN critic (lasinger2019.py:426-491). Vestigial in the
    reference (never used by an entry point) — provided for API parity."""

    in_channels: int = 4
    adversarial_training: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = Conv(32, (7, 7), (1, 1), 0, use_bias=True, name="net.0")(x)
        x = BatchNorm(name="net.1")(x, use_running_average=not train)
        x = ResidualBlock(64, 2, project=True, name="net.2")(x, train)
        x = ResidualBlock(128, 2, project=True, name="net.3")(x, train)
        x = ResidualBlock(256, 2, project=True, name="net.4")(x, train)
        x = ResidualBlock(1024, 2, project=True, name="net.5")(x, train)
        x = nn.relu(x)
        x = Conv(1, (1, 1), (1, 1), 0, use_bias=True, name="net.7")(x)
        return avg_pool_global(x)
