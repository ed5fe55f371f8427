"""TRUE single-frame device latency — separated from the dispatch floor.

Round-2's batch-1 table measured every family at 3.3–3.9 ms: the host→TPU
tunnel's per-dispatch round trip, not the model (VERDICT round 2, weak #6).
Here the model runs as a CHAIN inside one compiled program: ``lax.scan``
iterates the full serving pipeline N times with a real (un-foldable) scalar
data dependency between iterations, so iteration k+1 cannot start before k
finishes and the device executes N back-to-back single-frame inferences per
dispatch. Per-iteration time = true device latency; the difference to the
one-dispatch number is the tunnel floor.

Run: python perf/b1_latency.py [--configs enc:dec,...] [--chain 50]
Writes perf/b1_latency.json.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

ALL_CONFIGS = ("efficientnet-b0:hu2018,efficientnet-b4:hu2018,"
               "resnet50:hu2018,senet154:hu2018,densenet161:hu2018,"
               "efficientnet-b0:lasinger2019,efficientnet-b4:lasinger2019,"
               "resnet50:lasinger2019")


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--configs", default=ALL_CONFIGS)
    parser.add_argument("--chain", type=int, default=50,
                        help="in-program iterations per dispatch")
    parser.add_argument("--repeats", type=int, default=5)
    args = parser.parse_args()

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

    rng = np.random.default_rng(0)
    results = {}
    n = args.chain
    for config in args.configs.split(","):
        encoder, decoder = config.strip().split(":")
        if decoder == "lasinger2019":
            model = build_model(encoder, decoder, input_size=(228, 304),
                                output_size=(114, 152))
        else:
            model = build_model(encoder, decoder)
        variables = init_variables(model)
        baked = jax.device_put(jax.tree_util.tree_map(
            lambda v: v.astype(jnp.bfloat16)
            if hasattr(v, "astype") and v.dtype == jnp.float32 else v,
            variables))
        frames = jnp.asarray(rng.integers(0, 256, (1, 480, 640, 3),
                                          dtype=np.uint8))

        def pipeline(weights, frames_u8, eps):
            images = eval_preprocess_image_only(frames_u8).astype(jnp.bfloat16)
            # un-foldable perturbation: chains iteration k+1 onto k's output
            images = images + eps.astype(jnp.bfloat16)
            depth = model.apply(weights, images).astype(jnp.float32)
            return resize_bilinear_align_corners(depth, (480, 640))

        def build(weights_mode):
            if weights_mode == "baked":
                w = baked

                @jax.jit
                def chained(frames_u8):
                    def body(carry, _):
                        depth = pipeline(w, frames_u8, carry * 1e-30)
                        return jnp.max(depth), ()

                    carry, _ = jax.lax.scan(body, jnp.float32(0.0), None,
                                            length=n)
                    return carry

                @jax.jit
                def single(frames_u8):
                    return jnp.max(pipeline(w, frames_u8, jnp.float32(0.0)))

                return chained, single

            @jax.jit
            def chained(weights, frames_u8):
                def body(carry, _):
                    depth = pipeline(weights, frames_u8, carry * 1e-30)
                    return jnp.max(depth), ()

                carry, _ = jax.lax.scan(body, jnp.float32(0.0), None, length=n)
                return carry

            @jax.jit
            def single(weights, frames_u8):
                return jnp.max(pipeline(weights, frames_u8, jnp.float32(0.0)))

            return (lambda f: chained(baked, f)), (lambda f: single(baked, f))

        def build_staged_baked():
            """The autotuned serving path for families whose monolithic bake
            overflows the remote-compile payload (SENet-154 b128 ships
            staged+bake at 779 fps, perf/serving_policy_v5e.json): per-stage
            programs keep each payload under the 413 limit. No in-program
            scan can span the four chained jits, so device latency is
            measured as STEADY-STATE PIPELINED per-frame time (async
            dispatch overlaps host and device; the queue hides the tunnel)
            and the stage-boundary cost shows up in one_dispatch - steady."""
            from efficientdepthestimation_tpu.apps.common import (
                make_staged_infer_fn,
            )

            staged = make_staged_infer_fn(model, variables,
                                          upsample_to=(480, 640),
                                          dtype=jnp.bfloat16,
                                          bake_weights=True)
            pre = jax.jit(lambda f: eval_preprocess_image_only(f))

            def fn(frames_u8):
                return staged(pre(frames_u8))

            return fn

        # Baked (serving default) first; very large families (SENet-154,
        # DenseNet-161) overflow the remote-compile payload with ~250 MB of
        # weight constants -> the autotuned staged+bake path, then argument
        # weights as the last resort.
        weights_mode = "baked"
        chained, single = build(weights_mode)
        staged_fn = None
        try:
            float(chained(frames))
        except Exception as exc:
            print(f"  baked compile failed ({str(exc)[:80]}); "
                  f"trying staged+bake", flush=True)
            try:
                staged_fn = build_staged_baked()
                jax.block_until_ready(staged_fn(frames))
                weights_mode = "staged+baked"
            except Exception as exc2:
                print(f"  staged+bake failed ({str(exc2)[:80]}); "
                      f"falling back to arg weights", flush=True)
                weights_mode = "args"
                chained, single = build(weights_mode)
                float(chained(frames))

        if weights_mode == "staged+baked":
            # steady-state pipelined b1 stream (fence: checksum over every
            # call's output so completion of the whole window is forced)
            m = max(2 * n, 40)
            chain_ms = []
            for _ in range(args.repeats):
                t0 = time.perf_counter()
                outs = [staged_fn(frames) for _ in range(m)]
                float(jnp.stack([jnp.sum(o) for o in outs]).sum())
                chain_ms.append((time.perf_counter() - t0) * 1e3 / m)
            t0 = time.perf_counter()
            for _ in range(20):
                s = jax.block_until_ready(staged_fn(frames))
            float(jnp.sum(s))
            dispatch_ms = (time.perf_counter() - t0) * 1e3 / 20
        else:
            float(single(frames))
            chain_ms = []
            for _ in range(args.repeats):
                t0 = time.perf_counter()
                float(chained(frames))
                chain_ms.append((time.perf_counter() - t0) * 1e3 / n)
            t0 = time.perf_counter()
            for _ in range(20):
                s = single(frames)
            float(s)
            dispatch_ms = (time.perf_counter() - t0) * 1e3 / 20

        device_ms = min(chain_ms)
        key = f"{encoder}-{decoder}"
        results[key] = {
            "device_ms_b1": round(device_ms, 3),
            "device_fps_b1": round(1e3 / device_ms, 1),
            "one_dispatch_ms_b1": round(dispatch_ms, 3),
            "tunnel_floor_ms": round(max(0.0, dispatch_ms - device_ms), 3),
            "weights": weights_mode,
            "measure": ("pipelined-staged" if weights_mode == "staged+baked"
                        else "scan-chain"),
        }
        print(f"{key:38s} device {device_ms:7.3f} ms "
              f"({1e3 / device_ms:7.1f} fps)   one-dispatch "
              f"{dispatch_ms:6.3f} ms", flush=True)
        del chained, single, baked

    out = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                       "b1_latency.json")
    with open(out, "w") as f:
        json.dump({"chain": n, "results": results}, f, indent=2)
    print(f"wrote {out}")


if __name__ == "__main__":
    main()
