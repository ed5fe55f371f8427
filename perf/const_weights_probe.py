"""Constant-baked weights vs argument weights for the serving forward.

perf/checksum_fusion_probe.py narrowed the ENB0-HU 31 vs 57 ms gap to one
difference: the fast manual chain closure-captures the weight tree (jit
embeds it as compile-time constants — XLA can fold BatchNorm affines into
conv kernels and pre-lay-out weights), while the serving paths pass weights
as jit arguments (round-1 commit 27952f1 moved them there because captured
constants re-staged per call over the axon tunnel at the time).

Variants (b128, 228x304 bf16 in, scalar-fenced):

  arg_scalar     : model.apply, weights as argument, checksum out
  const_scalar   : model.apply, weights closure-captured, checksum out
  const_out      : weights captured, returns (depth, checksum)
  const_e2e      : uint8 preprocess + model + 480x640 upsample, captured
  arg_e2e        : same monolith with weights as argument (bench.py today)

Run: python perf/const_weights_probe.py [--encoder efficientnet-b0]
     [--decoder hu2018] [--batch 128] [--iters 10]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--encoder", default="efficientnet-b0")
    parser.add_argument("--decoder", default="hu2018")
    parser.add_argument("--batch", type=int, default=128)
    parser.add_argument("--iters", type=int, default=10)
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

    model = build_model(args.encoder, args.decoder)
    variables = model.init({"params": jax.random.PRNGKey(0)},
                           jnp.zeros((1, 228, 304, 3)))
    variables = jax.device_put(jax.tree_util.tree_map(
        lambda v: v.astype(jnp.bfloat16) if v.dtype == jnp.float32 else v,
        variables))
    images = jax.jit(lambda k: jax.random.normal(
        k, (args.batch, 228, 304, 3), jnp.bfloat16))(jax.random.PRNGKey(1))
    rng = np.random.default_rng(0)
    frames = jnp.asarray(
        rng.integers(0, 256, (args.batch, 480, 640, 3), dtype=np.uint8))
    jax.block_until_ready((images, frames))

    @jax.jit
    def arg_scalar(c, v, x):
        return c + jnp.sum(model.apply(v, x).astype(jnp.float32))

    @jax.jit
    def const_scalar(c, x):
        return c + jnp.sum(model.apply(variables, x).astype(jnp.float32))

    @jax.jit
    def const_out(c, x):
        depth = model.apply(variables, x)
        return depth, c + jnp.sum(depth.astype(jnp.float32))

    def e2e(v, frames_u8):
        imgs = eval_preprocess_image_only(frames_u8)
        depth = model.apply(v, imgs.astype(jnp.bfloat16))
        return resize_bilinear_align_corners(
            depth.astype(jnp.float32), (480, 640))

    @jax.jit
    def const_e2e(c, frames_u8):
        depth = e2e(variables, frames_u8)
        return depth, c + jnp.sum(depth)

    @jax.jit
    def arg_e2e(c, v, frames_u8):
        depth = e2e(v, frames_u8)
        return depth, c + jnp.sum(depth)

    def timed(step, warmup=3):
        carry = jnp.zeros((), jnp.float32)
        for _ in range(warmup):
            carry = step(carry)
        float(carry)
        carry = jnp.zeros((), jnp.float32)
        t0 = time.perf_counter()
        for _ in range(args.iters):
            carry = step(carry)
        assert np.isfinite(float(carry))
        return (time.perf_counter() - t0) / args.iters * 1e3

    def drop_first(fn):
        def step(c):
            out = fn(c)
            return out[-1] if isinstance(out, tuple) else out
        return step

    results = {}
    for name, step in [
        ("arg_scalar", lambda c: arg_scalar(c, variables, images)),
        ("const_scalar", lambda c: const_scalar(c, images)),
        ("const_out", drop_first(lambda c: const_out(c, images))),
        ("const_e2e", drop_first(lambda c: const_e2e(c, frames))),
        ("arg_e2e", drop_first(lambda c: arg_e2e(c, variables, frames))),
    ]:
        ms = timed(step)
        fps = args.batch / (ms / 1e3)
        results[name] = {"ms": round(ms, 2), "fps": round(fps, 1)}
        print(f"{name:14s} {ms:8.2f} ms   {fps:8.1f} fps", flush=True)

    out = os.path.join(
        os.path.dirname(os.path.abspath(__file__)),
        f"const_weights_{args.encoder}_{args.decoder}_b{args.batch}.json")
    with open(out, "w") as f:
        json.dump({"encoder": args.encoder, "decoder": args.decoder,
                   "batch": args.batch, "results": results}, f, indent=2)
    print(f"wrote {out}")


if __name__ == "__main__":
    main()
