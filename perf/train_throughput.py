"""Steady-state training-step throughput on the real chip.

Measures the full one-program train step (on-device augmentation stack +
forward + fused Sobel loss + backward + Adam + BN updates + metric sums)
exactly as apps/train.py dispatches it, with donated state and a single
trailing fetch so dispatch stays pipelined. This is the work
ReSIDE/train.py:210-252 does per batch on GPU.

Run: python perf/train_throughput.py [encoder] [batches...]
  EDE_F32=1 disables mixed precision; EDE_PALLAS=1 uses the Pallas loss.
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    from efficientdepthestimation_tpu.utils.jitcache import enable_persistent_cache
    enable_persistent_cache()

    import jax
    import jax.numpy as jnp

    from efficientdepthestimation_tpu.apps.common import init_variables
    from efficientdepthestimation_tpu.models import build_model
    from efficientdepthestimation_tpu.training.train_step import (
        adam_with_l2,
        create_train_state,
        make_train_step,
    )

    encoder = sys.argv[1] if len(sys.argv) > 1 else "resnet50"
    batches = [int(b) for b in sys.argv[2:]] or [32, 64]
    bf16 = os.environ.get("EDE_F32", "0") != "1"
    pallas = os.environ.get("EDE_PALLAS", "0") == "1"
    split = os.environ.get("EDE_SPLIT", "0") == "1"

    model = build_model(encoder, "hu2018")
    variables = init_variables(model, (228, 304), batch=2)
    tx = adam_with_l2(1e-4, 1e-4)
    step = make_train_step(use_pallas_loss=pallas, mixed_precision=bf16,
                           split_preprocess=split)

    rng = np.random.default_rng(0)
    key = jax.random.PRNGKey(0)

    for batch in batches:
        # fresh buffers per batch size: the train step donates the state,
        # whose arrays alias ``variables`` — donation deletes them otherwise
        fresh = jax.tree_util.tree_map(lambda v: jnp.array(v, copy=True),
                                       variables)
        state = jax.device_put(create_train_state(model, fresh, tx))
        data = {
            "image": jnp.asarray(
                rng.integers(0, 256, (batch, 480, 640, 3), dtype=np.uint8)),
            "depth": jnp.asarray(
                rng.integers(10, 250, (batch, 480, 640), dtype=np.uint8)),
            "num_valid": jnp.asarray(batch, jnp.int32),
        }
        try:
            for _ in range(4):  # compile + warm (state donated through)
                state, metrics = step(state, data, key)
            float(metrics["loss"])
            t0 = time.perf_counter()
            iters = 15
            for _ in range(iters):
                state, metrics = step(state, data, key)
            final = float(metrics["loss"])  # forces the full chain
            dt = (time.perf_counter() - t0) / iters
        except Exception as e:  # OOM at large batch
            print(json.dumps({"encoder": encoder, "batch": batch,
                              "error": str(e)[:120]}), flush=True)
            continue
        assert np.isfinite(final)
        row = {
            "encoder": encoder, "batch": batch,
            "bf16": bf16, "pallas_loss": pallas, "split": split,
            "step_ms": round(dt * 1e3, 2),
            "images_per_s_per_chip": round(batch / dt, 1),
        }
        if not split:
            # whole-program FLOPs (aug + fwd + bwd + Adam + metrics) from
            # XLA cost analysis -> training MFU vs the v5e bf16 MXU peak
            try:
                an = step.lower(state, data, key).compile().cost_analysis()
                if isinstance(an, list):
                    an = an[0]
                flops = float(an.get("flops", float("nan")))
                if np.isfinite(flops):
                    row["step_gflops"] = round(flops / 1e9, 1)
                    row["train_mfu_pct"] = round(
                        100 * flops / dt / 197.0e12, 1)
            except Exception:
                pass
        print(json.dumps(row), flush=True)


if __name__ == "__main__":
    main()
