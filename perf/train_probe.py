"""Isolate the batch-128 f32-params forward elephant: which leaf dtype and
which batch size trigger it, forward-only (no grad, no BN mutation).

Run: python perf/train_probe.py [encoder]
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def measure(fn, *args, warmup=2, iters=8):
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
    return (time.perf_counter() - t0) / iters * 1e3


def main():
    from efficientdepthestimation_tpu.utils.jitcache import enable_persistent_cache
    enable_persistent_cache()

    import jax
    import jax.numpy as jnp

    from efficientdepthestimation_tpu.apps.common import init_variables
    from efficientdepthestimation_tpu.models import build_model

    encoder = sys.argv[1] if len(sys.argv) > 1 else "efficientnet-b0"
    model = build_model(encoder, "hu2018")
    variables = init_variables(model, (228, 304), batch=2)

    def cast_tree(tree, dtype):
        return jax.tree_util.tree_map(
            lambda v: v.astype(dtype) if v.dtype == jnp.float32 else v, tree)

    rng = np.random.default_rng(0)

    @jax.jit
    def fwd_train(v, im, carry):
        out, _ = model.apply(v, im, True, mutable=["batch_stats"],
                             rngs={"dropout": jax.random.PRNGKey(1)})
        return carry + jnp.sum(out.astype(jnp.float32))

    @jax.jit
    def fwd_eval(v, im, carry):
        out = model.apply(v, im, False)
        return carry + jnp.sum(out.astype(jnp.float32))

    @jax.jit
    def fwd_train_incast(v, im, carry):
        vb = cast_tree(v, jnp.bfloat16)
        out, _ = model.apply(vb, im, True, mutable=["batch_stats"],
                             rngs={"dropout": jax.random.PRNGKey(1)})
        return carry + jnp.sum(out.astype(jnp.float32))

    @jax.jit
    def fwd_train_incast_barrier(v, im, carry):
        vb = jax.lax.optimization_barrier(cast_tree(v, jnp.bfloat16))
        out, _ = model.apply(vb, im, True, mutable=["batch_stats"],
                             rngs={"dropout": jax.random.PRNGKey(1)})
        return carry + jnp.sum(out.astype(jnp.float32))

    rows = {}
    for batch in (64, 96, 128):
        im = jnp.asarray(rng.standard_normal((batch, 228, 304, 3)), jnp.bfloat16)
        p32 = variables
        pall16 = jax.device_put(cast_tree(variables, jnp.bfloat16))
        p16s32 = {"params": cast_tree(variables["params"], jnp.bfloat16),
                  "batch_stats": variables["batch_stats"]}
        p32s16 = {"params": variables["params"],
                  "batch_stats": cast_tree(variables["batch_stats"], jnp.bfloat16)}
        rows[f"b{batch}_train_p32_s32"] = measure(fwd_train, p32, im)
        rows[f"b{batch}_train_p16_s16"] = measure(fwd_train, pall16, im)
        rows[f"b{batch}_train_p16_s32"] = measure(fwd_train, p16s32, im)
        rows[f"b{batch}_train_p32_s16"] = measure(fwd_train, p32s16, im)
        if batch in (96, 128):
            rows[f"b{batch}_train_incast"] = measure(fwd_train_incast, p32, im)
            rows[f"b{batch}_train_incast_barrier"] = measure(
                fwd_train_incast_barrier, p32, im)
        if batch == 128:
            rows[f"b{batch}_eval_p32_s32"] = measure(fwd_eval, p32, im)
            rows[f"b{batch}_eval_p16_s16"] = measure(fwd_eval, pall16, im)
        print(json.dumps({k: round(v, 2) for k, v in rows.items()}), flush=True)


if __name__ == "__main__":
    main()
