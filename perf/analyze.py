"""Per-stage performance analysis on the real TPU chip.

Measures the e2e serving pipeline (uint8 640×480 → preprocess → model →
upsample → 640×480 depth) and its stages for each flagship model, across
batch sizes and precisions, with *forced completion* (per-call scalar fetch —
block_until_ready does not guarantee completion through the axon tunnel).
Run: ``python perf/analyze.py``; writes perf/report.json.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


V5E_BF16_PEAK_TFLOPS = 197.0  # v5e per-chip bf16 peak (MXU)


def measure(fn, *args, warmup=3, iters=20):
    """fn(*args, carry) -> carry; chained scalar carry, one fetch per window
    (amortizes the ~28 ms tunnel round-trip that a per-call fetch pays)."""
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


def cost_flops(jitted, *args):
    """XLA cost-analysis FLOPs of a compiled program (NaN if unavailable)."""
    try:
        an = jitted.lower(*args).compile().cost_analysis()
        if isinstance(an, list):
            an = an[0]
        return float(an.get("flops", float("nan")))
    except Exception:
        return float("nan")


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

    parser = argparse.ArgumentParser()
    parser.add_argument("--models", nargs="*", default=[
        "efficientnet-b0:hu2018", "efficientnet-b4:hu2018", "resnet50:hu2018",
        "efficientnet-b0:lasinger2019", "resnet50:lasinger2019",
    ])
    parser.add_argument("--batches", nargs="*", type=int, default=[32])
    parser.add_argument("--dtypes", nargs="*", default=["bf16"])
    parser.add_argument("--output", default="perf/report.json")
    args = parser.parse_args()

    rng = np.random.default_rng(0)
    report = {"device": str(jax.devices()[0]), "results": []}
    dtype_map = {"bf16": jnp.bfloat16, "f32": jnp.float32}

    for spec in args.models:
        encoder, decoder = spec.split(":")
        model = build_model(encoder, decoder)
        for batch in args.batches:
            frames = jnp.asarray(
                rng.integers(0, 256, (batch, 480, 640, 3), dtype=np.uint8))
            # params are batch-independent; init at batch 1 to bound init memory
            variables = init_variables(model, (228, 304), batch=1)
            for dtype_name in args.dtypes:
                dtype = dtype_map[dtype_name]
                cast_vars = jax.device_put(jax.tree_util.tree_map(
                    lambda x: x.astype(dtype) if x.dtype == jnp.float32 else x,
                    variables))

                @jax.jit
                def pre_s(fr, carry):
                    return carry + jnp.sum(
                        eval_preprocess_image_only(fr).astype(dtype)
                        .astype(jnp.float32))

                @jax.jit
                def stage_pre(fr):
                    return eval_preprocess_image_only(fr).astype(dtype)

                @jax.jit
                def model_s(v, images, carry):
                    return carry + jnp.sum(
                        model.apply(v, images).astype(jnp.float32))

                @jax.jit
                def stage_model(v, images):
                    return model.apply(v, images)

                @jax.jit
                def up_s(depth, carry):
                    return carry + jnp.sum(resize_bilinear_align_corners(
                        depth.astype(jnp.float32), (480, 640)))

                @jax.jit
                def full_s(v, fr, carry):
                    images = eval_preprocess_image_only(fr).astype(dtype)
                    depth = model.apply(v, images)
                    depth = resize_bilinear_align_corners(
                        depth.astype(jnp.float32), (480, 640))
                    return carry + jnp.sum(depth)

                # constant-baked variants (cast_vars closure-captured; the
                # production fixed-checkpoint serving path)
                @jax.jit
                def model_bk(images, carry):
                    return carry + jnp.sum(
                        model.apply(cast_vars, images).astype(jnp.float32))

                @jax.jit
                def full_bk(fr, carry):
                    images = eval_preprocess_image_only(fr).astype(dtype)
                    depth = model.apply(cast_vars, images)
                    depth = resize_bilinear_align_corners(
                        depth.astype(jnp.float32), (480, 640))
                    return carry + jnp.sum(depth)

                images = jax.block_until_ready(stage_pre(frames))
                depth = jax.block_until_ready(stage_model(cast_vars, images))
                entry = {
                    "model": spec, "batch": batch, "dtype": dtype_name,
                    "preprocess_ms": measure(pre_s, frames) * 1e3,
                    "model_ms": measure(model_s, cast_vars, images) * 1e3,
                    "model_baked_ms": measure(model_bk, images) * 1e3,
                    "upsample_ms": measure(up_s, depth) * 1e3,
                    "e2e_ms": measure(full_s, cast_vars, frames) * 1e3,
                    "e2e_baked_ms": measure(full_bk, frames) * 1e3,
                }
                entry["fps_per_chip"] = batch / (entry["e2e_ms"] / 1e3)
                entry["fps_per_chip_baked"] = batch / (
                    entry["e2e_baked_ms"] / 1e3)
                # Analytic FLOPs (XLA cost analysis) → achieved TFLOP/s and
                # MFU for the model stage, so progress is measured against
                # the MXU peak, not only against the 30 fps GPU baseline.
                model_flops = cost_flops(stage_model, cast_vars, images)
                if np.isfinite(model_flops):
                    tfs = model_flops / (entry["model_ms"] / 1e3) / 1e12
                    entry["model_gflops_per_batch"] = round(model_flops / 1e9, 1)
                    entry["model_tflops_per_s"] = round(tfs, 1)
                    entry["model_mfu_pct"] = round(
                        100 * tfs / V5E_BF16_PEAK_TFLOPS, 1)
                    tfs_bk = model_flops / (entry["model_baked_ms"] / 1e3) / 1e12
                    entry["model_baked_mfu_pct"] = round(
                        100 * tfs_bk / V5E_BF16_PEAK_TFLOPS, 1)
                report["results"].append(entry)
                print(json.dumps(entry))

    os.makedirs("perf", exist_ok=True)
    with open(args.output, "w") as f:
        json.dump(report, f, indent=2)
    print(f"wrote {args.output}")


if __name__ == "__main__":
    main()
