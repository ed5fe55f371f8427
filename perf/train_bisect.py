"""Bisect the batch-128 train-step cliff: which ingredient of the core
step (vs the bare value_and_grad) costs 13x?

Variants, all on preprocessed tensors (no augmentation):
  fwdbwd_bf16params : value_and_grad, params pre-cast to bf16 (the
                      perf/train_profile.py formulation that measures fast)
  fwdbwd_f32params  : value_and_grad, f32 master params + bf16 images (what
                      the real step does via per-op casting)
  +adam             : f32 params, plus the adam_with_l2 update applied
  +metrics          : plus depth_metrics_batch
  core              : make_train_step(preprocess=False), donate=False
  core_donate       : make_train_step(preprocess=False), donate=True

Run: python perf/train_bisect.py [encoder] [batch]
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def measure(fn, *args, warmup=3, iters=10):
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
    from efficientdepthestimation_tpu.training.loss import depth_loss
    from efficientdepthestimation_tpu.training.metrics import depth_metrics_batch
    from efficientdepthestimation_tpu.training.train_step import (
        adam_with_l2,
        create_train_state,
        make_train_step,
    )

    encoder = sys.argv[1] if len(sys.argv) > 1 else "efficientnet-b0"
    batch = int(sys.argv[2]) if len(sys.argv) > 2 else 128

    model = build_model(encoder, "hu2018")
    variables = init_variables(model, (228, 304), batch=2)
    tx = adam_with_l2(1e-4, 1e-4)

    bf16_vars = jax.device_put(jax.tree_util.tree_map(
        lambda v: v.astype(jnp.bfloat16) if v.dtype == jnp.float32 else v,
        variables))

    rng = np.random.default_rng(0)
    images = jnp.asarray(rng.standard_normal((batch, 228, 304, 3)), jnp.bfloat16)
    depths = jnp.asarray(rng.uniform(1, 9, (batch, 114, 152, 1)), jnp.float32)
    key = jax.random.PRNGKey(0)

    def loss_of(params, stats, im, de):
        out, updates = model.apply(
            {"params": params, "batch_stats": stats}, im, True,
            mutable=["batch_stats"], rngs={"dropout": jax.random.PRNGKey(1)})
        return depth_loss(out, de), (out, updates["batch_stats"])

    @jax.jit
    def fwdbwd_bf16params(v, im, de, carry):
        (loss, _), grads = jax.value_and_grad(
            lambda p: loss_of(p, v["batch_stats"], im, de), has_aux=True
        )(v["params"])
        return carry + loss

    @jax.jit
    def fwdbwd_f32params(v, im, de, carry):
        (loss, _), grads = jax.value_and_grad(
            lambda p: loss_of(p, v["batch_stats"], im, de), has_aux=True
        )(v["params"])
        return carry + loss

    @jax.jit
    def plus_adam(v, opt_state, im, de, carry):
        (loss, (_, stats)), grads = jax.value_and_grad(
            lambda p: loss_of(p, v["batch_stats"], im, de), has_aux=True
        )(v["params"])
        updates, _ = tx.update(grads, opt_state, v["params"])
        leaf = jax.tree_util.tree_leaves(updates)[0]
        return carry + loss + jnp.sum(leaf.astype(jnp.float32)) * 0

    @jax.jit
    def plus_metrics(v, opt_state, im, de, carry):
        (loss, (out, stats)), grads = jax.value_and_grad(
            lambda p: loss_of(p, v["batch_stats"], im, de), has_aux=True
        )(v["params"])
        updates, _ = tx.update(grads, opt_state, v["params"])
        m = depth_metrics_batch(out, de)
        leaf = jax.tree_util.tree_leaves(updates)[0]
        return carry + loss + m["abs_rel"] * 0 + jnp.sum(leaf.astype(jnp.float32)) * 0

    rows = {}
    rows["fwdbwd_bf16params"] = measure(fwdbwd_bf16params, bf16_vars, images, depths)
    rows["fwdbwd_f32params"] = measure(fwdbwd_f32params, variables, images, depths)
    opt_state = tx.init(variables["params"])
    rows["plus_adam"] = measure(plus_adam, variables, opt_state, images, depths)
    rows["plus_metrics"] = measure(plus_metrics, variables, opt_state, images, depths)

    for donate, name in ((False, "core"), (True, "core_donate")):
        step = make_train_step(preprocess=False, donate=donate,
                               mixed_precision=True)
        state = jax.device_put(create_train_state(
            model, jax.tree_util.tree_map(lambda v: jnp.array(v, copy=True),
                                          variables), tx))
        data = {"image": images, "depth": depths,
                "num_valid": jnp.asarray(batch, jnp.int32)}
        for _ in range(3):
            state, metrics = step(state, data, key)
        float(metrics["loss"])
        t0 = time.perf_counter()
        iters = 10
        for _ in range(iters):
            state, metrics = step(state, data, key)
        final = float(metrics["loss"])
        assert np.isfinite(final)
        rows[name] = (time.perf_counter() - t0) / iters * 1e3

    print(json.dumps({"encoder": encoder, "batch": batch,
                      **{k: round(v, 2) for k, v in rows.items()}}),
          flush=True)


if __name__ == "__main__":
    main()
