"""Pallas vs XLA direct-path UpProjection at the RN50 D.up4 site.

Compares, at batch 128 bf16 with branch-stacked output channels (128):
  xla_direct : resize_bilinear_align_corners -> one stacked 5x5 conv
  pallas     : ops/pallas/upproj.py (upsampled intermediate VMEM-resident)
  algebraic  : ops/fused.upsample_conv (contraction-first rewrite)

Run: python perf/upproj_pallas_bench.py [batch]
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    from efficientdepthestimation_tpu.utils.jitcache import enable_persistent_cache
    enable_persistent_cache()

    import jax
    import jax.numpy as jnp

    from efficientdepthestimation_tpu.ops.conv import conv2d
    from efficientdepthestimation_tpu.ops.fused import upsample_conv
    from efficientdepthestimation_tpu.ops.pallas.upproj import upsample_conv_pallas
    from efficientdepthestimation_tpu.ops.resize import (
        resize_bilinear_align_corners,
    )

    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 128
    in_hw, out_hw, cin, cout = (57, 76), (114, 152), 128, 128  # RN50 D.up4, pair-stacked

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((batch, *in_hw, cin)), jnp.bfloat16)
    k = jnp.asarray(rng.standard_normal((5, 5, cin, cout)) * 0.05, jnp.bfloat16)

    variants = {
        "xla_direct": lambda xx, kk: conv2d(
            resize_bilinear_align_corners(xx, out_hw), kk, stride=1, padding=2),
        "pallas": lambda xx, kk: upsample_conv_pallas(xx, kk, out_hw),
        "algebraic": lambda xx, kk: upsample_conv(xx, kk, out_hw),
    }

    ref = None
    for name, fn in variants.items():
        @jax.jit
        def step(xx, kk, carry, fn=fn):
            return carry + jnp.sum(fn(xx, kk).astype(jnp.float32))

        out = jax.jit(fn)(x, k)
        if ref is None:
            ref = np.asarray(out, np.float32)
        else:
            err = float(np.max(np.abs(np.asarray(out, np.float32) - ref)))
            rel = err / (float(np.max(np.abs(ref))) + 1e-9)
            assert rel < 2e-2, (name, rel)  # bf16 accumulation-order noise

        carry = jnp.zeros((), jnp.float32)
        for _ in range(3):
            carry = step(x, k, carry)
        float(carry)
        carry = jnp.zeros((), jnp.float32)
        t0 = time.perf_counter()
        iters = 20
        for _ in range(iters):
            carry = step(x, k, carry)
        assert np.isfinite(float(carry))
        ms = (time.perf_counter() - t0) / iters * 1e3
        gflop = 2 * batch * out_hw[0] * out_hw[1] * 25 * cin * cout / 1e9
        print(json.dumps({
            "variant": name, "batch": batch, "ms": round(ms, 3),
            "tflops_per_s": round(gflop / ms, 1),
        }), flush=True)


if __name__ == "__main__":
    main()
