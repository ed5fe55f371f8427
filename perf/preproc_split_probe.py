"""Probe: split uint8 preprocess out of the e2e serving monolith.

perf/e2e_attrib.py showed the ENB0-HU b128 composition penalty: preprocess
alone 5.7 ms, model alone ~31 ms, but the preprocess+model monolith 59.5 ms
(~23 ms lost to composition — same shape as the RN50 buffer-assignment
cliff, PERFORMANCE.md "composition gap"). Chained jits dispatch
asynchronously with device-resident intermediates, so splitting should cost
nothing but the intermediate buffer. Candidates (all end at the full-res
depth map, checksum-fenced):

  mono    : preprocess + model + upsample in ONE program (bench.py today)
  split2  : jit(preprocess) -> jit(model + upsample)
  split3  : jit(preprocess) -> jit(model) -> jit(upsample)
  split2b : jit(preprocess + bf16 cast) -> jit(model + upsample)
            (cast in stage 1 so the boundary buffer is bf16: half the HBM
            round-trip of a f32 boundary)

Run: python perf/preproc_split_probe.py [--encoder efficientnet-b0]
     [--batch 128] [--decoder hu2018]
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

    model = build_model(args.encoder, args.decoder)
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
    def mono(variables, frames_u8, carry):
        images = eval_preprocess_image_only(frames_u8)
        depth = model.apply(variables, images.astype(jnp.bfloat16))
        depth = resize_bilinear_align_corners(
            depth.astype(jnp.float32), (480, 640))
        return depth, carry + jnp.sum(depth)

    @jax.jit
    def pre_f32(frames_u8):
        return eval_preprocess_image_only(frames_u8)

    @jax.jit
    def pre_bf16(frames_u8):
        return eval_preprocess_image_only(frames_u8).astype(jnp.bfloat16)

    @jax.jit
    def model_up(variables, images, carry):
        depth = model.apply(variables, images.astype(jnp.bfloat16))
        depth = resize_bilinear_align_corners(
            depth.astype(jnp.float32), (480, 640))
        return depth, carry + jnp.sum(depth)

    @jax.jit
    def model_only(variables, images):
        return model.apply(variables, images.astype(jnp.bfloat16))

    @jax.jit
    def up_only(depth, carry):
        depth = resize_bilinear_align_corners(
            depth.astype(jnp.float32), (480, 640))
        return depth, carry + jnp.sum(depth)

    def run_mono(carry):
        _, carry = mono(variables, frames, carry)
        return carry

    def run_split2(carry):
        images = pre_f32(frames)
        _, carry = model_up(variables, images, carry)
        return carry

    def run_split2b(carry):
        images = pre_bf16(frames)
        _, carry = model_up(variables, images, carry)
        return carry

    def run_split3(carry):
        images = pre_bf16(frames)
        depth = model_only(variables, images)
        _, carry = up_only(depth, carry)
        return carry

    results = {}
    for name, fn in [("mono", run_mono), ("split2", run_split2),
                     ("split2b", run_split2b), ("split3", run_split3)]:
        ms = measure(fn) * 1e3
        fps = args.batch / (ms / 1e3)
        results[name] = {"ms": round(ms, 2), "fps": round(fps, 1)}
        print(f"{name:8s} {ms:8.2f} ms   {fps:8.1f} fps", flush=True)

    payload = {"encoder": args.encoder, "decoder": args.decoder,
               "batch": args.batch, "results": results}
    out = args.out or os.path.join(
        os.path.dirname(os.path.abspath(__file__)),
        f"preproc_split_{args.encoder}_b{args.batch}.json")
    with open(out, "w") as f:
        json.dump(payload, f, indent=2)
    print(f"wrote {out}")


if __name__ == "__main__":
    main()
