"""Shared flax building blocks with exact PyTorch numerics.

Naming convention: submodules are named with the reference's torch attribute
names (``conv1``, ``bn1``, ``layer1.0`` …) so that joining a flax param path
with '.' yields the torch state-dict key. The importer relies on this.
"""

from __future__ import annotations

import math
from typing import Any, Callable, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from efficientdepthestimation_tpu.ops.conv import conv2d

__all__ = ["Conv", "BatchNorm", "kaiming_uniform", "torch_bias_init"]


def kaiming_uniform(fan_in_axes=(0, 1, 2)):
    """torch's default conv init: kaiming_uniform(a=sqrt(5)) over fan_in."""

    def init(key, shape, dtype=jnp.float32):
        fan_in = 1
        for ax in fan_in_axes:
            fan_in *= shape[ax]
        gain = math.sqrt(2.0 / (1.0 + 5.0))  # a = sqrt(5)
        bound = gain * math.sqrt(3.0 / fan_in)
        return jax.random.uniform(key, shape, dtype, -bound, bound)

    return init


def torch_bias_init(fan_in: int):
    """torch's default bias init: U(-1/sqrt(fan_in), 1/sqrt(fan_in))."""

    def init(key, shape, dtype=jnp.float32):
        bound = 1.0 / math.sqrt(fan_in) if fan_in > 0 else 0.0
        return jax.random.uniform(key, shape, dtype, -bound, bound)

    return init


class Conv(nn.Module):
    """2-D conv, NHWC/HWIO, torch-style integer or explicit padding."""

    features: int
    kernel_size: tuple[int, int]
    stride: tuple[int, int] = (1, 1)
    padding: Any = 0
    groups: int = 1
    use_bias: bool = True
    precision: Any = None

    @nn.compact
    def __call__(self, x):
        k = self.kernel_size
        cin = x.shape[-1]
        kernel = self.param(
            "kernel",
            kaiming_uniform(),
            (k[0], k[1], cin // self.groups, self.features),
        )
        bias = None
        if self.use_bias:
            fan_in = k[0] * k[1] * (cin // self.groups)
            bias = self.param("bias", torch_bias_init(fan_in), (self.features,))
        return conv2d(
            x,
            kernel.astype(x.dtype),
            stride=self.stride,
            padding=self.padding,
            groups=self.groups,
            bias=None if bias is None else bias.astype(x.dtype),
            precision=self.precision,
        )


class BatchNorm(nn.Module):
    """BatchNorm2d with torch's exact train/eval semantics.

    * eval: normalize with running stats.
    * train: normalize with the batch's *biased* variance, update EMAs as
      ``running = (1 - momentum) * running + momentum * batch`` where the
      variance EMA uses the *unbiased* batch variance (torch behaviour).

    Running stats live in the ``batch_stats`` collection under ``mean``/``var``
    (mapped to torch's ``running_mean``/``running_var`` by the importer).
    """

    momentum: float = 0.1
    eps: float = 1e-5
    use_running_average: bool | None = None

    @nn.compact
    def __call__(self, x, use_running_average: bool | None = None):
        use_ra = nn.merge_param(
            "use_running_average", self.use_running_average, use_running_average
        )
        c = x.shape[-1]
        scale = self.param("scale", nn.initializers.ones, (c,))
        bias = self.param("bias", nn.initializers.zeros, (c,))
        ra_mean = self.variable("batch_stats", "mean", nn.initializers.zeros, None, (c,), jnp.float32)
        ra_var = self.variable("batch_stats", "var", nn.initializers.ones, None, (c,), jnp.float32)

        if use_ra:
            mean, var = ra_mean.value, ra_var.value
        else:
            xf = x.astype(jnp.float32)
            mean = jnp.mean(xf, axis=(0, 1, 2))
            var = jnp.mean(jnp.square(xf), axis=(0, 1, 2)) - jnp.square(mean)
            if not self.is_initializing():
                n = x.shape[0] * x.shape[1] * x.shape[2]
                unbiased = var * (n / max(n - 1, 1))
                ra_mean.value = (1 - self.momentum) * ra_mean.value + self.momentum * mean
                ra_var.value = (1 - self.momentum) * ra_var.value + self.momentum * unbiased

        inv = jax.lax.rsqrt(var + self.eps) * scale
        out = x.astype(jnp.float32) * inv + (bias - mean * inv)
        return out.astype(x.dtype)
