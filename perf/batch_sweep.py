"""Sweep batch sizes for the model-stage and e2e serving throughput.

Usage: python perf/batch_sweep.py [encoder] [batches...]
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

    from efficientdepthestimation_tpu.apps.common import init_variables
    from efficientdepthestimation_tpu.data.transforms import (
        eval_preprocess_image_only,
    )
    from efficientdepthestimation_tpu.models import build_model
    from efficientdepthestimation_tpu.ops.resize import (
        resize_bilinear_align_corners,
    )

    encoder = sys.argv[1] if len(sys.argv) > 1 else "resnet50"
    batches = [int(b) for b in sys.argv[2:]] or [32, 64, 96, 128, 192]

    model = build_model(encoder, "hu2018")
    variables = init_variables(model, (228, 304), batch=1)
    cast = jax.device_put(jax.tree_util.tree_map(
        lambda x: x.astype(jnp.bfloat16) if x.dtype == jnp.float32 else x,
        variables))
    rng = np.random.default_rng(0)

    @jax.jit
    def model_only(v, images, carry):
        return carry + jnp.sum(model.apply(v, images).astype(jnp.float32))

    @jax.jit
    def e2e(v, fr, carry):
        images = eval_preprocess_image_only(fr).astype(jnp.bfloat16)
        depth = model.apply(v, images)
        depth = resize_bilinear_align_corners(
            depth.astype(jnp.float32), (480, 640))
        return carry + jnp.sum(depth)

    def measure(fn, *args, warmup=3, iters=15):
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

    for batch in batches:
        images = jnp.asarray(
            rng.standard_normal((batch, 228, 304, 3)), jnp.bfloat16)
        frames = jnp.asarray(
            rng.integers(0, 256, (batch, 480, 640, 3), dtype=np.uint8))
        m_ms = measure(model_only, cast, images) * 1e3
        e_ms = measure(e2e, cast, frames) * 1e3
        print(json.dumps({
            "encoder": encoder, "batch": batch,
            "model_ms": round(m_ms, 2),
            "model_fps": round(batch / m_ms * 1e3, 1),
            "e2e_ms": round(e_ms, 2),
            "e2e_fps": round(batch / e_ms * 1e3, 1),
        }), flush=True)


if __name__ == "__main__":
    main()
