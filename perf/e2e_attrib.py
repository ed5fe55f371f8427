"""Prefix-ablation attribution for the e2e serving pipeline.

bench.py's batch-128 ENB0-HU e2e time (~57 ms) is ~26 ms larger than the
model stage measured alone (~31 ms, perf/inprogram_attrib.py). This script
attributes that gap among the pipeline's non-model stages by timing growing
prefixes of the exact bench.py program, chained-fence:

  P0: uint8 ingest + eval preprocess (Scale240 + crop + normalize)
  P1: P0 + bf16 cast + model forward
  P2: P1 + f32 align-corners upsample to 640x480
  P3: P2 + checksum materialization of the full-res depth output
        (the bench returns depth AND sums it -> depth is an output buffer)

Run: python perf/e2e_attrib.py [--encoder efficientnet-b0] [--batch 128]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def measure(fn, *args, warmup=3, iters=10):
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


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--encoder", default="efficientnet-b0")
    parser.add_argument("--batch", type=int, default=128)
    parser.add_argument("--out", default=None)
    args = parser.parse_args()

    from efficientdepthestimation_tpu.utils.jitcache import enable_persistent_cache
    enable_persistent_cache()

    import jax
    import jax.numpy as jnp

    from efficientdepthestimation_tpu.data.transforms import (
        eval_preprocess_image_only,
    )
    from efficientdepthestimation_tpu.models import build_model
    from efficientdepthestimation_tpu.ops.resize import (
        resize_bilinear_align_corners,
    )

    model = build_model(args.encoder, "hu2018")
    rng = np.random.default_rng(0)
    frames = jnp.asarray(
        rng.integers(0, 256, (args.batch, 480, 640, 3), dtype=np.uint8))
    init_images = jnp.zeros((args.batch, 228, 304, 3), jnp.float32)
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        init_images)
    variables = jax.device_put(jax.tree_util.tree_map(
        lambda x: x.astype(jnp.bfloat16) if x.dtype == jnp.float32 else x,
        variables))

    @jax.jit
    def p0(variables, frames_u8, carry):
        images = eval_preprocess_image_only(frames_u8)
        return carry + jnp.sum(images.astype(jnp.float32))

    @jax.jit
    def p1(variables, frames_u8, carry):
        images = eval_preprocess_image_only(frames_u8)
        depth = model.apply(variables, images.astype(jnp.bfloat16))
        return carry + jnp.sum(depth.astype(jnp.float32))

    @jax.jit
    def p2(variables, frames_u8, carry):
        images = eval_preprocess_image_only(frames_u8)
        depth = model.apply(variables, images.astype(jnp.bfloat16))
        depth = resize_bilinear_align_corners(
            depth.astype(jnp.float32), (480, 640))
        return carry + jnp.sum(depth)

    @jax.jit
    def p3(variables, frames_u8, carry):
        # exact bench.py program: depth is ALSO a program output buffer
        images = eval_preprocess_image_only(frames_u8)
        depth = model.apply(variables, images.astype(jnp.bfloat16))
        depth = resize_bilinear_align_corners(
            depth.astype(jnp.float32), (480, 640))
        return depth, carry + jnp.sum(depth)

    def p3_wrap(variables, frames_u8, carry):
        _, carry = p3(variables, frames_u8, carry)
        return carry

    results = {}
    prev = 0.0
    for name, fn in [("preprocess", p0), ("+model", p1),
                     ("+upsample", p2), ("+depth_output", p3_wrap)]:
        ms = measure(fn, variables, frames, iters=10) * 1e3
        results[name] = {"cum_ms": round(ms, 2),
                         "delta_ms": round(ms - prev, 2)}
        prev = ms
        print(f"{name:15s} cum {ms:8.2f} ms   delta {results[name]['delta_ms']:8.2f} ms",
              flush=True)

    fps = args.batch / (prev / 1e3)
    print(f"e2e fps/chip: {fps:.1f}")
    payload = {"encoder": args.encoder, "batch": args.batch,
               "stages": results, "e2e_fps": round(fps, 1)}
    out = args.out or os.path.join(
        os.path.dirname(os.path.abspath(__file__)),
        f"e2e_attrib_{args.encoder}_b{args.batch}.json")
    with open(out, "w") as f:
        json.dump(payload, f, indent=2)
    print(f"wrote {out}")


if __name__ == "__main__":
    main()
