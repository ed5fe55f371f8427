"""Two follow-ups to constant-baked serving weights.

1. Re-race the MFF tail merge under baking. The grouped/block-diagonal
   merges were measured and rejected pre-bake (runtime assembly of the
   merged weight cost more than it saved — PERFORMANCE.md "MFF tail
   merge"); with baked weights the assembly constant-folds, so the
   verdict may flip. Races staged_bake x mff_merge {module, grouped,
   blockdiag} e2e.

2. Quantify the baked-compile cost (the documented trade (a)): cold
   trace+compile+first-run wall time of the e2e monolith, arg vs baked
   weights, with the persistent cache DISABLED.

Run: python perf/bake_mff_compile_probe.py [--encoder efficientnet-b0]
     [--batch 128] [--skip-mff] [--skip-compile]
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
    parser.add_argument("--batch", type=int, default=128)
    parser.add_argument("--iters", type=int, default=10)
    parser.add_argument("--skip-mff", action="store_true")
    parser.add_argument("--skip-compile", action="store_true")
    args = parser.parse_args()

    # persistent cache intentionally NOT enabled: compile timings below must
    # be cold, and the mff race re-jits per variant anyway.
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

    model = build_model(args.encoder, "hu2018")
    variables = init_variables(model)
    rng = np.random.default_rng(0)
    frames = jnp.asarray(
        rng.integers(0, 256, (args.batch, 480, 640, 3), dtype=np.uint8))

    @jax.jit
    def preprocess(frames_u8):
        return eval_preprocess_image_only(frames_u8)

    images = preprocess(frames)
    jax.block_until_ready(images)

    payload = {"encoder": args.encoder, "batch": args.batch}

    if not args.skip_mff:
        results = {}
        for mff_merge in ("module", "grouped", "blockdiag"):
            infer = make_staged_infer_fn(
                model, variables, upsample_to=(480, 640),
                dtype=jnp.bfloat16, mff_merge=mff_merge, bake_weights=True)

            def step():
                return jnp.sum(infer(images))

            for _ in range(3):
                s = step()
            assert np.isfinite(float(s))
            t0 = time.perf_counter()
            checks = [step() for _ in range(args.iters)]
            assert np.isfinite(float(checks[-1]))
            ms = (time.perf_counter() - t0) / args.iters * 1e3
            results[mff_merge] = {"ms": round(ms, 2),
                                  "fps": round(args.batch / (ms / 1e3), 1)}
            print(f"staged_bake mff={mff_merge:9s} {ms:8.2f} ms", flush=True)
            del infer
        payload["mff_merge_staged_bake"] = results

    if not args.skip_compile:
        compile_s = {}
        for name, kw in (("arg", {}), ("baked", {"bake_weights": True})):
            infer = make_infer_fn(model, variables, upsample_to=(480, 640),
                                  dtype=jnp.bfloat16, **kw)
            t0 = time.perf_counter()
            out = infer(images)
            jax.block_until_ready(out)
            assert np.isfinite(float(jnp.sum(out)))
            compile_s[name] = round(time.perf_counter() - t0, 1)
            print(f"cold compile+first-run {name:5s}: {compile_s[name]}s",
                  flush=True)
            del infer
        payload["cold_compile_first_run_s"] = compile_s

    out_path = os.path.join(
        os.path.dirname(os.path.abspath(__file__)),
        f"bake_mff_compile_{args.encoder}_b{args.batch}.json")
    with open(out_path, "w") as f:
        json.dump(payload, f, indent=2)
    print(f"wrote {out_path}")


if __name__ == "__main__":
    main()
