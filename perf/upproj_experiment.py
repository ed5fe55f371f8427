"""Measure direct vs contraction-first UpProjection paths per decoder step.

For each conv∘upsample site in RN50-HU (D.up1..up4 and MFF.up1..up4) this
times, on the real chip with forced completion:

  * direct: bilinear-upsample (matmul form) then 5×5 conv (both branches)
  * fused:  ops/fused.upsample_conv (contraction at small res, shifted
            resize matrices) for both branches

Output: per-site ms + the winner, to drive ``should_fuse``'s cost model.
Run: ``python perf/upproj_experiment.py``.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def measure(fn, *args, warmup=3, iters=30):
    """fn(*args, carry) -> carry. Chained carry, one fetch per window —
    amortizes the ~28 ms tunnel round-trip over the whole window."""
    import jax.numpy as jnp

    carry = jnp.zeros((), jnp.float32)
    for _ in range(warmup):
        carry = fn(*args, carry)
    float(carry)
    carry = jnp.zeros((), jnp.float32)
    t0 = time.perf_counter()
    for _ in range(iters):
        carry = fn(*args, carry)
    assert np.isfinite(float(carry))
    return (time.perf_counter() - t0) / iters


# (name, in_hw, out_hw, cin, cout) — RN50-HU at 228×304 input, and the MFF
# branches (all to 114×152, cout 16).
SITES_RN50 = [
    ("D.up1", (8, 10), (15, 19), 1024, 512),
    ("D.up2", (15, 19), (29, 38), 512, 256),
    ("D.up3", (29, 38), (57, 76), 256, 128),
    ("D.up4", (57, 76), (114, 152), 128, 64),
    ("MFF.up1", (57, 76), (114, 152), 256, 16),
    ("MFF.up2", (29, 38), (114, 152), 512, 16),
    ("MFF.up3", (15, 19), (114, 152), 1024, 16),
    ("MFF.up4", (8, 10), (114, 152), 2048, 16),
]

SITES_ENB0 = [
    ("D.up1", (8, 10), (15, 19), 160, 80),
    ("D.up2", (15, 19), (29, 38), 80, 40),
    ("D.up3", (29, 38), (57, 76), 40, 20),
    ("D.up4", (57, 76), (114, 152), 20, 10),
    ("MFF.up1", (57, 76), (114, 152), 24, 16),
    ("MFF.up2", (29, 38), (114, 152), 40, 16),
    ("MFF.up3", (15, 19), (114, 152), 112, 16),
    ("MFF.up4", (8, 10), (114, 152), 320, 16),
]


def main():
    from efficientdepthestimation_tpu.utils.jitcache import enable_persistent_cache
    enable_persistent_cache()

    import jax
    import jax.numpy as jnp

    from efficientdepthestimation_tpu.ops.conv import conv2d
    from efficientdepthestimation_tpu.ops.fused import upsample_conv_pair
    from efficientdepthestimation_tpu.ops.resize import resize_bilinear_align_corners

    parser = argparse.ArgumentParser()
    parser.add_argument("--batch", type=int, default=128)
    parser.add_argument("--sites", default="rn50", choices=["rn50", "enb0"])
    args = parser.parse_args()

    sites = SITES_RN50 if args.sites == "rn50" else SITES_ENB0
    rng = np.random.default_rng(0)
    rows = []
    for name, in_hw, out_hw, cin, cout in sites:
        x = jnp.asarray(
            rng.standard_normal((args.batch, *in_hw, cin)), jnp.bfloat16)
        k1 = jnp.asarray(rng.standard_normal((5, 5, cin, cout)) * 0.05,
                         jnp.bfloat16)
        k2 = jnp.asarray(rng.standard_normal((5, 5, cin, cout)) * 0.05,
                         jnp.bfloat16)

        @jax.jit
        def direct(x, k1, k2, carry, out_hw=out_hw):
            up = resize_bilinear_align_corners(x, out_hw)
            b1 = conv2d(up, k1, stride=1, padding=2)
            b2 = conv2d(up, k2, stride=1, padding=2)
            return carry + jnp.sum(b1.astype(jnp.float32)) + jnp.sum(
                b2.astype(jnp.float32))

        @jax.jit
        def fused(x, k1, k2, carry, out_hw=out_hw):
            b1, b2 = upsample_conv_pair(x, k1, k2, out_hw)
            return carry + jnp.sum(b1.astype(jnp.float32)) + jnp.sum(
                b2.astype(jnp.float32))

        d_ms = measure(direct, x, k1, k2) * 1e3
        f_ms = measure(fused, x, k1, k2) * 1e3
        row = {"site": name, "in": in_hw, "out": out_hw, "cin": cin,
               "cout": cout, "direct_ms": round(d_ms, 2),
               "fused_ms": round(f_ms, 2),
               "winner": "fused" if f_ms < d_ms else "direct"}
        rows.append(row)
        print(json.dumps(row), flush=True)

    with open(f"perf/upproj_{args.sites}.json", "w") as f:
        json.dump({"batch": args.batch, "rows": rows}, f, indent=2)


if __name__ == "__main__":
    main()
