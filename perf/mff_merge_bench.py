"""MFF tail-merge micro-bench: module (4 separate 16-ch branch tails) vs
merged grouped-conv vs merged block-diagonal-conv, on real serving shapes.

Taps are RN50/ENB0-shaped for 640×480 serving inputs; batch/bf16 match the
staged serving path. Run: python perf/mff_merge_bench.py [encoder] [batch].
"""

from __future__ import annotations

import functools
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TAP_CHANNELS = {
    "resnet50": (256, 512, 1024, 2048),
    "efficientnet-b0": (24, 40, 112, 1280),
}


def main():
    from efficientdepthestimation_tpu.utils.jitcache import enable_persistent_cache
    enable_persistent_cache()

    import jax
    import jax.numpy as jnp

    from efficientdepthestimation_tpu.models.hu2018 import MFF, mff_apply_merged

    encoder = sys.argv[1] if len(sys.argv) > 1 else "resnet50"
    batch = int(sys.argv[2]) if len(sys.argv) > 2 else 128

    chans = TAP_CHANNELS[encoder]
    hw = [(120, 160), (60, 80), (30, 40), (15, 20)]  # 640×480 input, /4../32
    size = (240, 320)

    rng = np.random.default_rng(0)
    taps = [jnp.asarray(rng.standard_normal((batch, h, w, c)),
                        jnp.bfloat16) for (h, w), c in zip(hw, chans)]

    mff = MFF()
    variables = mff.init(jax.random.PRNGKey(0),
                         [t.astype(jnp.float32) for t in taps], size)
    variables = jax.tree_util.tree_map(
        lambda v: v.astype(jnp.bfloat16) if v.dtype == jnp.float32 else v,
        variables)

    module = jax.jit(lambda v, t: mff.apply(v, t, size, False))
    grouped = jax.jit(functools.partial(mff_apply_merged, size=size,
                                        block_diag=False))
    blockdiag = jax.jit(functools.partial(mff_apply_merged, size=size,
                                          block_diag=True))
    checksum = jax.jit(lambda d, carry: carry + jnp.sum(d.astype(jnp.float32)))

    def measure(fn, warmup=3, iters=20):
        carry = jnp.zeros((), jnp.float32)
        for _ in range(warmup):
            carry = checksum(fn(variables, taps), carry)
        float(carry)
        carry = jnp.zeros((), jnp.float32)
        t0 = time.perf_counter()
        for _ in range(iters):
            carry = checksum(fn(variables, taps), carry)
        assert np.isfinite(float(carry))
        return (time.perf_counter() - t0) / iters

    for name, fn in (("module", module), ("merged_grouped", grouped),
                     ("merged_blockdiag", blockdiag)):
        ms = measure(fn) * 1e3
        print(json.dumps({"encoder": encoder, "batch": batch, "variant": name,
                          "mff_ms": round(ms, 2)}), flush=True)


if __name__ == "__main__":
    main()
