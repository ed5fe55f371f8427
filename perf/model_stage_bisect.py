"""Bisect the ENB0-HU model-stage discrepancy: 31.4 ms vs ~53 ms at b128.

perf/inprogram_attrib.py (prefix ablation, scalar-checksum-only program)
timed the full ENB0-HU model at 31.4 ms/b128, but every e2e path that
returns the depth map — monolithic, staged, and the chained-program split
(perf/preproc_split_probe.py) — pays ~53 ms for the same model stage. The
two measurements differ in exactly two ways; this probe isolates them:

  scalar_static : jit -> checksum only, static random bf16 images
                  (reproduces inprogram_attrib; expect ~31 ms)
  out_static    : jit -> (depth, checksum), same static images
                  (adds output materialization)
  out_fed_once  : jit -> (depth, checksum), images produced ONCE by the
                  preprocess program (tests boundary-buffer layout)
  out_fed_each  : preprocess re-run every iteration (full chain; expect ~53)
  scalar_fed_each : chain preprocess each iter but return checksum only

Run: python perf/model_stage_bisect.py [--encoder efficientnet-b0]
     [--batch 128]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def measure(fn, warmup=3, iters=10):
    import jax.numpy as jnp

    carry = jnp.zeros((), jnp.float32)
    for _ in range(warmup):
        carry = fn(carry)
    float(carry)
    carry = jnp.zeros((), jnp.float32)
    t0 = time.perf_counter()
    for _ in range(iters):
        carry = fn(carry)
    assert np.isfinite(float(carry))
    return (time.perf_counter() - t0) / iters


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--encoder", default="efficientnet-b0")
    parser.add_argument("--decoder", default="hu2018")
    parser.add_argument("--batch", type=int, default=128)
    args = parser.parse_args()

    from efficientdepthestimation_tpu.utils.jitcache import enable_persistent_cache
    enable_persistent_cache()

    import jax
    import jax.numpy as jnp

    from efficientdepthestimation_tpu.data.transforms import (
        eval_preprocess_image_only,
    )
    from efficientdepthestimation_tpu.models import build_model

    model = build_model(args.encoder, args.decoder)
    rng = np.random.default_rng(0)
    frames = jnp.asarray(
        rng.integers(0, 256, (args.batch, 480, 640, 3), dtype=np.uint8))
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        jnp.zeros((1, 228, 304, 3), jnp.float32))
    variables = jax.device_put(jax.tree_util.tree_map(
        lambda x: x.astype(jnp.bfloat16) if x.dtype == jnp.float32 else x,
        variables))

    static_images = jax.jit(lambda k: jax.random.normal(
        k, (args.batch, 228, 304, 3), jnp.bfloat16))(jax.random.PRNGKey(1))
    jax.block_until_ready(static_images)

    @jax.jit
    def pre_bf16(frames_u8):
        return eval_preprocess_image_only(frames_u8).astype(jnp.bfloat16)

    @jax.jit
    def model_scalar(variables, images, carry):
        depth = model.apply(variables, images)
        return carry + jnp.sum(depth.astype(jnp.float32))

    @jax.jit
    def model_out(variables, images, carry):
        depth = model.apply(variables, images)
        return depth, carry + jnp.sum(depth.astype(jnp.float32))

    fed_once = pre_bf16(frames)
    jax.block_until_ready(fed_once)

    def run_scalar_static(carry):
        return model_scalar(variables, static_images, carry)

    def run_out_static(carry):
        _, carry = model_out(variables, static_images, carry)
        return carry

    def run_out_fed_once(carry):
        _, carry = model_out(variables, fed_once, carry)
        return carry

    def run_out_fed_each(carry):
        images = pre_bf16(frames)
        _, carry = model_out(variables, images, carry)
        return carry

    def run_scalar_fed_each(carry):
        images = pre_bf16(frames)
        return model_scalar(variables, images, carry)

    results = {}
    for name, fn in [
        ("scalar_static", run_scalar_static),
        ("out_static", run_out_static),
        ("out_fed_once", run_out_fed_once),
        ("out_fed_each", run_out_fed_each),
        ("scalar_fed_each", run_scalar_fed_each),
    ]:
        ms = measure(fn) * 1e3
        results[name] = round(ms, 2)
        print(f"{name:16s} {ms:8.2f} ms", flush=True)

    payload = {"encoder": args.encoder, "decoder": args.decoder,
               "batch": args.batch, "results": results}
    out = os.path.join(
        os.path.dirname(os.path.abspath(__file__)),
        f"model_stage_bisect_{args.encoder}_b{args.batch}.json")
    with open(out, "w") as f:
        json.dump(payload, f, indent=2)
    print(f"wrote {out}")


if __name__ == "__main__":
    main()
