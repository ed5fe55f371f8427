"""AOT-export a serving artifact — the deployment path the reference lacks.

The reference serves by shipping its source tree plus a ``.pth``
(``ReSIDE/inference_benchmark.py:30-47``); this app instead writes ONE
self-contained StableHLO artifact holding the entire 640×480 serving
pipeline (ingest → preprocess → forward → upsample), loadable with bare
``jax`` via :func:`checkpoints.export.load_serving_artifact`.

    python -m efficientdepthestimation_tpu.apps.export \
        --model runs/ENB0-HU.pth --out enb0_hu.edz --batch 128 --verify
"""

from __future__ import annotations

import argparse
from typing import List, Optional

from efficientdepthestimation_tpu.apps.common import (
    infer_arch_from_path,
    init_variables,
    load_any_checkpoint,
)


def main(args: Optional[List[str]] = None):
    from efficientdepthestimation_tpu.utils.jitcache import enable_persistent_cache

    enable_persistent_cache()
    parser = argparse.ArgumentParser(description="Export an AOT serving artifact")
    parser.add_argument("--model", type=str, default=None,
                        help="checkpoint (.pth or EDE); arch sniffed from name")
    parser.add_argument("--encoder", type=str, default="efficientnet-b0",
                        help="used (with random init) when --model is absent")
    parser.add_argument("--decoder", type=str, default="hu2018")
    parser.add_argument("--out", required=True, type=str)
    parser.add_argument("--batch", type=str, default="128",
                        help="static batch size, or 'dynamic' for a symbolic batch")
    parser.add_argument("--in-hw", type=int, nargs=2, default=(480, 640))
    parser.add_argument("--crop-hw", type=int, nargs=2, default=(228, 304))
    parser.add_argument("--out-hw", type=int, nargs=2, default=(480, 640))
    parser.add_argument("--f32", action="store_true",
                        help="keep float32 weights/activations (default bf16)")
    parser.add_argument("--no-bake", action="store_true",
                        help="weights as call arguments (swappable) instead of"
                             " compile-time constants")
    parser.add_argument("--platforms", type=str, default=None,
                        help="comma-separated lowering targets, e.g. tpu,cpu")
    parser.add_argument("--verify", action="store_true",
                        help="reload the artifact and check it against the live"
                             " model on random frames")
    import sys

    raw_args = list(args) if args is not None else sys.argv[1:]
    args = parser.parse_args(args)

    import jax
    import jax.numpy as jnp
    import numpy as np

    from efficientdepthestimation_tpu.checkpoints.export import (
        load_serving_artifact,
        save_serving_artifact,
    )
    from efficientdepthestimation_tpu.models import build_model

    if args.model is not None:
        encoder, decoder = infer_arch_from_path(args.model)
        explicit = {a for a in ("--encoder", "--decoder")
                    if any(s == a or s.startswith(a + "=")
                           for s in raw_args)}
        if explicit:
            print(f"warning: {sorted(explicit)} ignored — architecture "
                  f"{encoder}-{decoder} inferred from --model filename")
        model, variables = load_any_checkpoint(
            args.model, example_input_hw=tuple(args.crop_hw))
    else:
        encoder, decoder = args.encoder, args.decoder
        model = build_model(encoder, decoder)
        variables = init_variables(model, tuple(args.crop_hw))

    batch = None if args.batch == "dynamic" else int(args.batch)
    platforms = (tuple(p.strip() for p in args.platforms.split(","))
                 if args.platforms else None)
    meta = save_serving_artifact(
        args.out, model, variables, encoder=encoder, decoder=decoder,
        batch=batch, in_hw=tuple(args.in_hw), crop_hw=tuple(args.crop_hw),
        out_hw=tuple(args.out_hw), dtype=None if args.f32 else jnp.bfloat16,
        bake_weights=not args.no_bake, platforms=platforms)
    print(f"Wrote {args.out}: {meta}")

    if args.verify:
        from efficientdepthestimation_tpu.checkpoints.export import _pipeline

        fn, _ = load_serving_artifact(args.out)
        rng = np.random.default_rng(0)
        b = batch if batch is not None else 2
        frames = jnp.asarray(
            rng.integers(0, 256, (b, *args.in_hw, 3), dtype=np.uint8))
        got = np.asarray(fn(frames))
        dtype = None if args.f32 else jnp.bfloat16
        if dtype is not None:
            variables = jax.tree_util.tree_map(
                lambda v: v.astype(dtype)
                if hasattr(v, "astype") and v.dtype == jnp.float32 else v,
                variables)
        want = np.asarray(_pipeline(model, tuple(args.crop_hw),
                                    tuple(args.out_hw), dtype)(variables, frames))
        err = float(np.max(np.abs(got - want)))
        # Baked constant folding reassociates at the compute dtype's
        # precision: 1 ulp of bf16 at meter-scale depths is ~0.03, so the
        # bf16 tolerance matches tests/test_export.py, not f32 epsilon.
        tol = 1e-5 if args.f32 else 1e-2
        print(f"verify: max abs diff vs live model = {err:.3e} (tol {tol:g})")
        if err >= tol:
            raise ValueError(
                f"artifact verify failed: max abs diff {err:.3e} >= {tol:g} "
                f"({'f32' if args.f32 else 'bf16'} export, batch={b}, "
                f"in_hw={tuple(args.in_hw)})")
    return meta


if __name__ == "__main__":
    main()
