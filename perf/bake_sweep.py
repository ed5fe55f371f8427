"""Serving-path sweep: {mono, staged} x {arg, baked weights} (+int8) e2e.

Measures the REAL serving builders (apps.common.make_infer_fn /
make_staged_infer_fn with bake_weights) end-to-end — uint8 640x480 ingest,
on-device preprocess, bf16 forward, align-corners upsample to 640x480 —
sequentially on one chip (concurrent probes corrupt each other's timings).
Also reports the max |baked - arg| / max|arg| output deviation on one batch
(XLA constant folding may reassociate float ops).

Run: python perf/bake_sweep.py [--encoders efficientnet-b0,resnet50,...]
     [--batch 128] [--int8]
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
    parser.add_argument("--encoders",
                        default="efficientnet-b0,efficientnet-b4,resnet50")
    parser.add_argument("--decoder", default="hu2018")
    parser.add_argument("--batch", type=int, default=128)
    parser.add_argument("--iters", type=int, default=10)
    parser.add_argument("--int8", action="store_true",
                        help="also measure int8 variants of each path")
    args = parser.parse_args()

    from efficientdepthestimation_tpu.utils.jitcache import enable_persistent_cache
    enable_persistent_cache()

    import jax
    import jax.numpy as jnp

    from efficientdepthestimation_tpu.apps.common import (
        init_variables,
        make_infer_fn,
        make_staged_infer_fn,
    )
    from efficientdepthestimation_tpu.data.transforms import (
        eval_preprocess_image_only,
    )
    from efficientdepthestimation_tpu.models import build_model

    rng = np.random.default_rng(0)
    frames = jnp.asarray(
        rng.integers(0, 256, (args.batch, 480, 640, 3), dtype=np.uint8))

    @jax.jit
    def preprocess(frames_u8):
        return eval_preprocess_image_only(frames_u8)

    images = preprocess(frames)
    jax.block_until_ready(images)

    def timed(infer, warmup=3):
        def step():
            out = infer(preprocess(frames))
            return jnp.sum(out)
        for _ in range(warmup):
            s = step()
        assert np.isfinite(float(s))
        checks = []
        t0 = time.perf_counter()
        for _ in range(args.iters):
            checks.append(step())
        assert np.isfinite(float(checks[-1]))
        ms = (time.perf_counter() - t0) / args.iters * 1e3
        return ms

    all_results = {}
    for encoder in args.encoders.split(","):
        encoder = encoder.strip()
        model = build_model(encoder, args.decoder)
        variables = init_variables(model, batch=1)

        paths = [
            ("mono_arg", make_infer_fn, {}),
            ("mono_bake", make_infer_fn, {"bake_weights": True}),
            ("staged_arg", make_staged_infer_fn, {}),
            ("staged_bake", make_staged_infer_fn, {"bake_weights": True}),
        ]
        if args.int8:
            paths += [
                ("mono_bake_int8", make_infer_fn,
                 {"bake_weights": True, "int8": True}),
                ("staged_bake_int8", make_staged_infer_fn,
                 {"bake_weights": True, "int8": True}),
            ]

        results = {}
        ref_out = None
        for name, maker, kw in paths:
            infer = maker(model, variables, upsample_to=(480, 640),
                          dtype=jnp.bfloat16, **kw)
            ms = timed(infer)
            fps = args.batch / (ms / 1e3)
            entry = {"ms": round(ms, 2), "fps": round(fps, 1)}
            out = np.asarray(infer(images))
            if name == "mono_arg":
                ref_out = out
            else:
                rel = float(np.max(np.abs(out - ref_out)) /
                            max(np.max(np.abs(ref_out)), 1e-9))
                entry["max_rel_dev_vs_mono_arg"] = round(rel, 6)
            results[name] = entry
            print(f"{encoder:16s} {name:18s} {ms:8.2f} ms  {fps:8.1f} fps  "
                  f"{entry.get('max_rel_dev_vs_mono_arg', '')}", flush=True)
            del infer
        all_results[encoder] = results

    out_path = os.path.join(
        os.path.dirname(os.path.abspath(__file__)),
        f"bake_sweep_{args.decoder}_b{args.batch}.json")
    with open(out_path, "w") as f:
        json.dump({"decoder": args.decoder, "batch": args.batch,
                   "int8": args.int8, "results": all_results}, f, indent=2)
    print(f"wrote {out_path}")


if __name__ == "__main__":
    main()
