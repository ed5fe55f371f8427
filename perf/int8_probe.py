"""Probe: does XLA lower int8 convolutions onto the v5e MXU efficiently?

Times representative conv shapes from the serving models (stem / mid /
1x1-expand) as bf16 vs s8xs8->s32, plus a full-model-ish chain, before we
invest in a quantized serving path. Chained-checksum timing (one scalar
fetch fences the sequence — see PERFORMANCE.md "Honest TPU timing").

Run: python perf/int8_probe.py
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


def conv(x, k, stride=1, acc=None):
    return lax.conv_general_dilated(
        x, k, (stride, stride), "SAME", dimension_numbers=DN,
        preferred_element_type=acc)


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
    shapes = [
        # (name, B, H, W, Cin, Cout, k, stride) — serving-model hot shapes
        ("stem3x3", 128, 228, 304, 3, 32, 3, 2),
        ("mid3x3", 128, 57, 76, 144, 144, 3, 1),
        ("expand1x1", 128, 57, 76, 24, 144, 1, 1),
        ("rn50_3x3", 128, 29, 38, 256, 256, 3, 1),
        ("upproj5x5", 128, 57, 76, 1024, 512, 5, 1),
        # The convs the serving models actually run (RN50-HU / ENB0-HU at
        # 228x304 input, batch 128) — the R stage is 25.5 ms at 71% MFU
        # and D is 39.4 ms at 55% (perf/stages_resnet50_bf16.json), so
        # these decide whether an int8 path is worth building.
        ("r_conv0_rn50", 128, 114, 152, 130, 128, 5, 1),
        ("r_conv1_rn50", 128, 114, 152, 128, 128, 5, 1),
        ("r_conv2_rn50", 128, 114, 152, 128, 1, 5, 1),
        ("d_conv1x1_rn50", 128, 8, 10, 2048, 1024, 1, 1),
        ("d_up1_rn50", 128, 15, 19, 1024, 1024, 5, 1),
        ("d_up2_rn50", 128, 29, 38, 512, 512, 5, 1),
        ("d_up3_rn50", 128, 57, 76, 256, 256, 5, 1),
        ("d_up4_rn50", 128, 114, 152, 128, 128, 5, 1),
        ("mff_conv", 128, 114, 152, 64, 64, 5, 1),
        ("r_conv01_enb0", 128, 114, 152, 104, 104, 5, 1),
    ]
    out = {}
    for name, b, h, w, ci, co, k, s in shapes:
        kx, kk = jax.random.split(jax.random.fold_in(key, hash(name) % 997))
        xf = jax.random.normal(kx, (b, h, w, ci), jnp.bfloat16)
        kf = jax.random.normal(kk, (k, k, ci, co), jnp.bfloat16)
        xi = (xf.astype(jnp.float32) * 10).astype(jnp.int8)
        ki = (kf.astype(jnp.float32) * 10).astype(jnp.int8)
        ms_bf16 = timed(
            lambda x, kn: jnp.sum(conv(x, kn, s).astype(jnp.float32)),
            (xf, kf), f"{name} bf16")
        ms_int8 = timed(
            lambda x, kn: jnp.sum(conv(x, kn, s, jnp.int32)
                                  .astype(jnp.float32)),
            (xi, ki), f"{name} s8s8s32")
        # int8 with dequant epilogue (the realistic serving form)
        sc = jnp.full((co,), 0.01, jnp.float32)
        ms_int8_dq = timed(
            lambda x, kn, scale: jnp.sum(
                (conv(x, kn, s, jnp.int32).astype(jnp.float32) * scale)
                .astype(jnp.bfloat16).astype(jnp.float32)),
            (xi, ki, sc), f"{name} s8+dequant")
        out[name] = {"bf16_ms": round(ms_bf16, 3),
                     "int8_ms": round(ms_int8, 3),
                     "int8_dq_ms": round(ms_int8_dq, 3),
                     "speedup": round(ms_bf16 / ms_int8_dq, 2)}
    print(json.dumps(out, indent=2))
    with open("perf/int8_probe.json", "w") as f:
        json.dump(out, f, indent=2)


if __name__ == "__main__":
    main()
