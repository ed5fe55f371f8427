"""E2E staged-serving check of the MFF tail-merge variants.

Same e2e path as perf/staged_sweep.py (uint8 640x480 -> preprocess ->
bf16 Hu forward -> f32 upsample to 640x480), staged serving only, with
mff_merge in {module, grouped, blockdiag}.
Run: python perf/mff_merge_e2e.py [encoder] [batch]
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

    from efficientdepthestimation_tpu.apps.common import (
        init_variables,
        make_staged_infer_fn,
    )
    from efficientdepthestimation_tpu.data.transforms import (
        eval_preprocess_image_only,
    )
    from efficientdepthestimation_tpu.models import build_model

    encoder = sys.argv[1] if len(sys.argv) > 1 else "resnet50"
    batch = int(sys.argv[2]) if len(sys.argv) > 2 else 128

    model = build_model(encoder, "hu2018")
    variables = init_variables(model, (228, 304), batch=1)
    rng = np.random.default_rng(0)

    pre = jax.jit(lambda fr: eval_preprocess_image_only(fr))
    checksum = jax.jit(lambda d, carry: carry + jnp.sum(d))
    frames = jnp.asarray(
        rng.integers(0, 256, (batch, 480, 640, 3), dtype=np.uint8))

    def measure(infer, warmup=3, iters=15):
        carry = jnp.zeros((), jnp.float32)
        for _ in range(warmup):
            carry = checksum(infer(pre(frames)), carry)
        float(carry)
        carry = jnp.zeros((), jnp.float32)
        t0 = time.perf_counter()
        for _ in range(iters):
            carry = checksum(infer(pre(frames)), carry)
        assert np.isfinite(float(carry))
        return (time.perf_counter() - t0) / iters

    for mff_merge in ("module", "grouped", "blockdiag"):
        infer = make_staged_infer_fn(model, variables, upsample_to=(480, 640),
                                     dtype=jnp.bfloat16, mff_merge=mff_merge)
        ms = measure(infer) * 1e3
        print(json.dumps({"encoder": encoder, "batch": batch,
                          "mff_merge": mff_merge, "e2e_ms": round(ms, 2),
                          "fps": round(batch / (ms / 1e3), 1)}), flush=True)


if __name__ == "__main__":
    main()
