"""Measure make_serving_fn's auto-selected path per (family, batch) e2e.

The headline serving table: uint8 640x480 ingest -> on-device preprocess ->
bf16 forward -> align-corners upsample to 640x480, through the production
``make_serving_fn`` default policy (constant-baked weights since round 2's
third session). Compare with --no-bake for the arg-weights policy.

Run: python perf/serving_table.py [--configs enc:dec,enc:dec,...]
     [--batches 128,256] [--int8] [--no-bake]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

DEFAULT_CONFIGS = ("efficientnet-b0:hu2018,efficientnet-b4:hu2018,"
                   "resnet50:hu2018,senet154:hu2018,densenet161:hu2018,"
                   "efficientnet-b0:lasinger2019,efficientnet-b4:lasinger2019,"
                   "resnet50:lasinger2019")


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--configs", default=DEFAULT_CONFIGS)
    parser.add_argument("--batches", default="128")
    parser.add_argument("--iters", type=int, default=10)
    parser.add_argument("--int8", action="store_true")
    parser.add_argument("--no-bake", action="store_true")
    parser.add_argument("--tag", default="")
    args = parser.parse_args()

    from efficientdepthestimation_tpu.utils.jitcache import enable_persistent_cache
    enable_persistent_cache()

    import jax
    import jax.numpy as jnp

    from efficientdepthestimation_tpu.apps.common import (
        init_variables,
        make_serving_fn,
    )
    from efficientdepthestimation_tpu.data.transforms import (
        eval_preprocess_image_only,
    )
    from efficientdepthestimation_tpu.models import build_model

    @jax.jit
    def preprocess(frames_u8):
        return eval_preprocess_image_only(frames_u8)

    rng = np.random.default_rng(0)
    table = {}
    for config in args.configs.split(","):
        encoder, decoder = config.strip().split(":")
        if decoder == "lasinger2019":
            model = build_model(encoder, decoder, input_size=(228, 304),
                                output_size=(114, 152))
        else:
            model = build_model(encoder, decoder)
        variables = init_variables(model)
        for batch in (int(b) for b in args.batches.split(",")):
            frames = jnp.asarray(rng.integers(
                0, 256, (batch, 480, 640, 3), dtype=np.uint8))
            infer = make_serving_fn(
                model, variables, batch_hint=batch, upsample_to=(480, 640),
                dtype=jnp.bfloat16, int8=args.int8,
                bake_weights=False if args.no_bake else None)

            def step():
                return jnp.sum(infer(preprocess(frames)))

            for _ in range(3):
                s = step()
            assert np.isfinite(float(s))
            t0 = time.perf_counter()
            checks = [step() for _ in range(args.iters)]
            assert np.isfinite(float(checks[-1]))
            ms = (time.perf_counter() - t0) / args.iters * 1e3
            fps = batch / (ms / 1e3)
            key = f"{encoder}-{decoder}-b{batch}"
            table[key] = {"ms": round(ms, 2), "fps": round(fps, 1)}
            print(f"{key:44s} {ms:8.2f} ms  {fps:8.1f} fps", flush=True)
            del infer, frames

    suffix = ("_int8" if args.int8 else "") + \
        ("_nobake" if args.no_bake else "") + \
        (f"_{args.tag}" if args.tag else "")
    out_path = os.path.join(
        os.path.dirname(os.path.abspath(__file__)),
        f"serving_table{suffix}.json")
    with open(out_path, "w") as f:
        json.dump({"configs": args.configs, "batches": args.batches,
                   "int8": args.int8, "no_bake": args.no_bake,
                   "table": table}, f, indent=2)
    print(f"wrote {out_path}")


if __name__ == "__main__":
    main()
