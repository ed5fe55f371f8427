"""Staged-vs-monolithic e2e serving sweep across batch sizes.

e2e = uint8 640×480 → on-device preprocess → Hu forward (bf16) → f32
upsample to 640×480. Staged splits preprocess / encoder / D / MFF / R(+up)
into chained jits. Run: python perf/staged_sweep.py [encoder] [batches...]
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
        make_infer_fn,
        make_staged_infer_fn,
        make_tiled_infer_fn,
    )
    from efficientdepthestimation_tpu.data.transforms import (
        eval_preprocess_image_only,
    )
    from efficientdepthestimation_tpu.models import build_model

    argv = [a for a in sys.argv[1:] if a != "--int8"]
    int8 = "--int8" in sys.argv
    encoder = argv[0] if argv else "resnet50"
    batches = [int(b) for b in argv[1:]] or [96, 128, 192, 256]

    model = build_model(encoder, "hu2018")
    variables = init_variables(model, (228, 304), batch=1)
    rng = np.random.default_rng(0)

    pre = jax.jit(lambda fr: eval_preprocess_image_only(fr))
    checksum = jax.jit(lambda d, carry: carry + jnp.sum(d))

    mono = make_infer_fn(model, variables, upsample_to=(480, 640),
                         dtype=jnp.bfloat16)
    staged = make_staged_infer_fn(model, variables, upsample_to=(480, 640),
                                  dtype=jnp.bfloat16)
    tiled = make_tiled_infer_fn(model, variables, upsample_to=(480, 640),
                                dtype=jnp.bfloat16)
    variants = [("staged", staged), ("monolithic", mono), ("tiled128", tiled)]
    if int8:
        variants += [
            ("staged+int8", make_staged_infer_fn(
                model, variables, upsample_to=(480, 640),
                dtype=jnp.bfloat16, int8=True)),
            ("monolithic+int8", make_infer_fn(
                model, variables, upsample_to=(480, 640),
                dtype=jnp.bfloat16, int8=True)),
            ("tiled128+int8", make_tiled_infer_fn(
                model, variables, upsample_to=(480, 640),
                dtype=jnp.bfloat16, int8=True)),
        ]

    def measure(infer, frames, warmup=3, iters=15):
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

    for batch in batches:
        frames = jnp.asarray(
            rng.integers(0, 256, (batch, 480, 640, 3), dtype=np.uint8))
        for name, infer in variants:
            try:
                ms = measure(infer, frames) * 1e3
            except Exception as e:  # OOM at large batch
                print(json.dumps({"encoder": encoder, "variant": name,
                                  "batch": batch, "error": str(e)[:100]}),
                      flush=True)
                continue
            print(json.dumps({
                "encoder": encoder, "variant": name, "batch": batch,
                "e2e_ms": round(ms, 2),
                "e2e_fps": round(batch / ms * 1e3, 1),
            }), flush=True)


if __name__ == "__main__":
    main()
