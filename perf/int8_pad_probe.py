"""Probe: zero-padding a misaligned cin up to 128 to unlock int8.

ENB0-HU's decoder towers run 5x5 convs at cin 104/130 — below the int8
gate's 128-alignment requirement (measured 0.89-0.95x unpadded). Padding
the input-channel dim with zeros is numerically EXACT (zero channels
contribute nothing to the contraction), costs one bandwidth pass, and
turns the site into an aligned int8 conv. This probe decides whether the
pad + aligned-int8 form beats straight bf16 at the real sites.

Run: python perf/int8_pad_probe.py
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from efficientdepthestimation_tpu.utils.jitcache import enable_persistent_cache

enable_persistent_cache()

import jax
import jax.numpy as jnp
from jax import lax

DN = lax.conv_dimension_numbers((1, 1, 1, 1), (1, 1, 1, 1),
                                ("NHWC", "HWIO", "NHWC"))


def timed(fn, args, label, iters=20):
    run = jax.jit(lambda c, *a: c + fn(*a))
    carry = jnp.zeros((), jnp.float32)
    for _ in range(3):
        carry = run(carry, *args)
    float(carry)
    carry = jnp.zeros((), jnp.float32)
    t0 = time.perf_counter()
    for _ in range(iters):
        carry = run(carry, *args)
    float(carry)
    ms = (time.perf_counter() - t0) / iters * 1e3
    print(json.dumps({"label": label, "ms": round(ms, 3)}), flush=True)
    return ms


def main():
    key = jax.random.PRNGKey(0)
    # (name, B, H, W, Cin, Cout, k) — misaligned serving sites
    shapes = [
        ("r_conv01_enb0", 128, 114, 152, 104, 104, 5),
        ("r_conv0_rn50", 128, 114, 152, 130, 128, 5),
        ("r_conv2_enb0", 128, 114, 152, 104, 1, 5),
    ]
    out = {}
    for name, b, h, w, ci, co, k in shapes:
        pad = (-ci) % 128
        cip = ci + pad
        kx, kk = jax.random.split(jax.random.fold_in(key, hash(name) % 997))
        xf = jax.random.normal(kx, (b, h, w, ci), jnp.bfloat16)
        kf = jax.random.normal(kk, (k, k, ci, co), jnp.bfloat16)

        def bf16(x, kn):
            y = lax.conv_general_dilated(x, kn, (1, 1), "SAME",
                                         dimension_numbers=DN)
            return jnp.sum(y.astype(jnp.float32))

        # realistic int8 form: quantize f32->s8 in-program, zero-pad the
        # activation's channel dim to 128 alignment, aligned s8 conv,
        # dequant epilogue (weights pre-quantized+padded outside)
        ki = (kf.astype(jnp.float32) * 10).astype(jnp.int8)
        kip = jnp.pad(ki, ((0, 0), (0, 0), (0, pad), (0, 0)))
        sc = jnp.full((co,), 0.01, jnp.float32)

        def int8_padded(x, kn, scale):
            xfull = x.astype(jnp.float32)
            s_x = jnp.maximum(jnp.max(jnp.abs(xfull)), 1e-30) / 127.0
            xq = jnp.clip(jnp.round(xfull / s_x), -127, 127).astype(jnp.int8)
            xq = jnp.pad(xq, ((0, 0), (0, 0), (0, 0), (0, pad)))
            y = lax.conv_general_dilated(xq, kn, (1, 1), "SAME",
                                         dimension_numbers=DN,
                                         preferred_element_type=jnp.int32)
            return jnp.sum((y.astype(jnp.float32) * (s_x * scale))
                           .astype(jnp.bfloat16).astype(jnp.float32))

        ms_bf16 = timed(bf16, (xf, kf), f"{name} bf16 cin={ci}")
        ms_pad = timed(int8_padded, (xf, kip, sc),
                       f"{name} s8 pad->{cip}")
        out[name] = {"bf16_ms": round(ms_bf16, 3),
                     "int8_pad_ms": round(ms_pad, 3),
                     "cin": ci, "cin_padded": cip,
                     "speedup": round(ms_bf16 / ms_pad, 2)}
    print(json.dumps(out, indent=2))
    with open("perf/int8_pad_probe.json", "w") as f:
        json.dump(out, f, indent=2)


if __name__ == "__main__":
    main()
