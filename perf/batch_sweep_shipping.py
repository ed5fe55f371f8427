"""Batch-size sweep through the SHIPPING serving path (make_serving_fn).

The committed batch-size evidence (PERFORMANCE.md "Batch size") predates the
round-5 fused-preprocess serving fn and the packed measurement fix; this
probe re-asks "is 128 still the knee?" through the exact pipeline bench.py
times: uint8 640×480 frames → fused preprocess → baked bf16 forward →
640×480 upsample, policy-aware path selection, checksum fused into the
program, one host fetch per window.

Usage: python perf/batch_sweep_shipping.py [encoder] [batches...]
Writes perf/batch_sweep_shipping_<encoder>.json.
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main():
    from efficientdepthestimation_tpu.utils.jitcache import enable_persistent_cache
    enable_persistent_cache()

    import jax
    import jax.numpy as jnp

    from efficientdepthestimation_tpu.apps.common import (
        load_any_checkpoint,
        make_serving_fn,
    )

    encoder = sys.argv[1] if len(sys.argv) > 1 else "efficientnet-b0"
    batches = [int(b) for b in sys.argv[2:]] or [64, 128, 192, 256]
    policy = os.path.join(REPO, "perf", "serving_policy_v5e.json")
    trained = os.path.join(REPO, "e2e", "ENB0-HU-synthetic.ede")

    model, variables = load_any_checkpoint(trained)
    rng = np.random.default_rng(0)

    results = {}
    for batch in batches:
        frames = jnp.asarray(
            rng.integers(0, 256, (batch, 480, 640, 3), dtype=np.uint8))
        pipeline = make_serving_fn(
            model, variables, batch_hint=batch, upsample_to=(480, 640),
            dtype=jnp.bfloat16, preprocess=True,
            policy_path=policy if os.path.isfile(policy) else None)

        @jax.jit
        def step(frames_u8, carry, _p=pipeline):
            return carry + jnp.sum(_p(frames_u8))

        carry = jnp.zeros((), jnp.float32)
        for _ in range(3):
            carry = step(frames, carry)
        float(carry)  # fence: warmup complete

        iters = max(4, int(round(1280 / batch)))
        carry = jnp.zeros((), jnp.float32)
        t0 = time.perf_counter()
        for _ in range(iters):
            carry = step(frames, carry)
        assert np.isfinite(float(carry))
        dt = time.perf_counter() - t0
        fps = batch * iters / dt
        results[f"b{batch}"] = {
            "fps": round(fps, 1),
            "ms_per_batch": round(1e3 * dt / iters, 2),
            "iters": iters,
        }
        print(f"{encoder} b{batch}: {fps:.1f} fps", flush=True)

    out = os.path.join(REPO, "perf", f"batch_sweep_shipping_{encoder}.json")
    with open(out, "w") as f:
        json.dump({"encoder": encoder, "decoder": "hu2018",
                   "pipeline": "make_serving_fn preprocess=True (shipping)",
                   "results": results}, f, indent=2)
    print(json.dumps(results))


if __name__ == "__main__":
    main()
