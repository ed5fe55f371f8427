"""Per-stage roofline for the training step + the round-3 remat races.

VERDICT r2 #3: serving got a roofline model and alternative lowerings;
training got one profile and a shrug. This probe does for training what
perf/analyze.py did for serving:

1. **Stage attribution**: preprocess / forward / forward+backward / full
   step, each timed chained-fence on the chip AND costed with XLA's
   ``cost_analysis()`` (flops, bytes) → per-stage roofline bound
   ``t >= max(flops/PEAK_FLOPS, bytes/PEAK_BW)`` and achieved fraction.
2. **Races**: XLA auto-remat baseline vs explicit ``jax.checkpoint``
   policies ('full', 'dots') at b128/b256, vs microbatch gradient
   accumulation (2×128 = effective 256), vs bf16 Adam moments (HBM-traffic
   probe via cost model — optimizer traffic is <1%% of step time, measured
   here to close the question).

Run: python perf/train_roofline.py [encoder] [batches...]
Writes perf/train_roofline_<encoder>.json.
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# v5e (1 chip): bf16 peak and HBM BW
PEAK_FLOPS = 197e12
PEAK_BW = 819e9


def _scalarize(out):
    """A tiny dispatch whose result data-depends on ``out`` — reducing each
    iteration's output to a scalar immediately lets its big buffers free
    while still forcing execution (block_until_ready is unreliable through
    the axon tunnel, PERFORMANCE.md:3-9, and unobserved duplicate
    computations could otherwise be elided)."""
    import jax
    import jax.numpy as jnp

    leaf = jax.tree_util.tree_leaves(out)[0]
    return jnp.sum(leaf.astype(jnp.float32))


def chained_time_state(step, state, batch, key, warmup=3, iters=10):
    """Timer for DONATED train steps: the state threads through iterations
    (buffers recycle in place, as apps/train.py runs it) and the loss
    scalar accumulates — one fetch fences every step."""
    acc = 0.0
    s = state
    for _ in range(warmup + 1):
        s, m = step(s, batch, key)
        acc = acc + m["loss"]
    float(acc)
    acc = 0.0
    t0 = time.perf_counter()
    for _ in range(iters):
        s, m = step(s, batch, key)
        acc = acc + m["loss"]
    float(acc)
    return (time.perf_counter() - t0) / iters * 1e3


def chained_time(fn, *args, warmup=3, iters=10):
    acc = 0.0
    for _ in range(warmup + 1):
        acc = acc + _scalarize(fn(*args))
    float(acc)
    acc = 0.0
    t0 = time.perf_counter()
    for _ in range(iters):
        acc = acc + _scalarize(fn(*args))
    float(acc)  # one host fetch depending on every iteration
    return (time.perf_counter() - t0) / iters * 1e3


def cost_of(jitted, *args):
    c = jitted.lower(*args).compile().cost_analysis()
    if isinstance(c, list):
        c = c[0]
    return {"gflops": (c.get("flops", 0.0)) / 1e9,
            "gbytes": (c.get("bytes accessed", 0.0)) / 1e9}


def roofline_ms(cost):
    return max(cost["gflops"] * 1e9 / PEAK_FLOPS,
               cost["gbytes"] * 1e9 / PEAK_BW) * 1e3


def main():
    from efficientdepthestimation_tpu.utils.jitcache import enable_persistent_cache
    enable_persistent_cache()

    import jax
    import jax.numpy as jnp

    from efficientdepthestimation_tpu.apps.common import init_variables
    from efficientdepthestimation_tpu.data.transforms import train_preprocess
    from efficientdepthestimation_tpu.models import build_model
    from efficientdepthestimation_tpu.training.loss import depth_loss
    from efficientdepthestimation_tpu.training.train_step import (
        adam_with_l2,
        create_train_state,
        make_train_step,
    )

    encoder = sys.argv[1] if len(sys.argv) > 1 else "resnet50"
    batches = [int(b) for b in sys.argv[2:]] or [128, 256]

    model = build_model(encoder, "hu2018")
    variables = init_variables(model, (228, 304), batch=2)
    rng = np.random.default_rng(0)
    report = {"encoder": encoder, "peak_tflops": PEAK_FLOPS / 1e12,
              "peak_gbs": PEAK_BW / 1e9, "stages": {}, "races": {}}

    def fresh_state():
        tx = adam_with_l2(1e-4, 1e-4)
        return jax.device_put(create_train_state(model, variables, tx))

    key = jax.random.PRNGKey(0)

    for batch in batches:
        raw_img = jnp.asarray(rng.integers(0, 256, (batch, 480, 640, 3),
                                           dtype=np.uint8))
        raw_dep = jnp.asarray(rng.integers(0, 256, (batch, 480, 640),
                                           dtype=np.uint8))
        images, depths = jax.jit(
            lambda r, i, d: train_preprocess(r, i, d))(key, raw_img, raw_dep)
        images16 = images.astype(jnp.bfloat16)
        state = fresh_state()
        bf16_params = jax.jit(lambda p: jax.tree_util.tree_map(
            lambda v: v.astype(jnp.bfloat16)
            if v.dtype == jnp.float32 else v, p))(state.params)

        def try_stage(name, fn, *fargs):
            try:
                stages[name] = {"ms": chained_time(fn, *fargs),
                                **cost_of(fn, *fargs)}
            except Exception as exc:  # per-stage OOM (e.g. un-remat b256 bwd)
                stages[name] = {"error": str(exc)[:160]}
                print(f"b{batch:<4d} {name:12s} FAILED: {str(exc)[:100]}",
                      flush=True)

        # ---- stage: preprocess
        pre = jax.jit(lambda r, i, d: train_preprocess(r, i, d))
        stages = {}
        stages["preprocess"] = {
            "ms": chained_time(pre, key, raw_img, raw_dep),
            **cost_of(pre, key, raw_img, raw_dep)}

        # ---- stage: forward (train mode, bf16 weights/activations)
        def fwd(p, stats, x):
            out, _ = model.apply({"params": p, "batch_stats": stats}, x, True,
                                 mutable=["batch_stats"],
                                 rngs={"dropout": key})
            return out

        jfwd = jax.jit(fwd)
        try_stage("forward", jfwd, bf16_params, state.batch_stats, images16)

        # ---- stage: forward+backward (loss grad wrt params)
        def fwdbwd(p, stats, x, d):
            def lf(p):
                out, _ = model.apply({"params": p, "batch_stats": stats}, x,
                                     True, mutable=["batch_stats"],
                                     rngs={"dropout": key})
                return depth_loss(out, d)
            return jax.grad(lf)(p)

        jfb = jax.jit(fwdbwd)
        if batch <= 128:
            try_stage("fwd_bwd", jfb, bf16_params, state.batch_stats,
                      images16, depths)
        else:
            # the un-remat standalone backward provably cannot fit at b256
            # (b128 already keeps 147 GB of traffic); attempting it OOMs
            # AND leaves the arena fragmented enough to poison later
            # measurements, so it is skipped by construction
            stages["fwd_bwd"] = {"skipped": "needs remat beyond b128"}

        # ---- stage: full step (monolithic+donated, as apps/train.py runs it)
        step = make_train_step(mixed_precision=True)
        batch_dict = {"image": raw_img, "depth": raw_dep}
        try:
            stages["full_step"] = {
                "ms": chained_time_state(step, fresh_state(), batch_dict, key),
                **cost_of(step, fresh_state(), batch_dict, key)}
        except Exception as exc:
            stages["full_step"] = {"error": str(exc)[:160]}
            print(f"b{batch:<4d} full_step    FAILED: {str(exc)[:100]}",
                  flush=True)

        for name, s in stages.items():
            if "error" in s or "skipped" in s:
                continue
            s["roofline_ms"] = round(roofline_ms(s), 2)
            s["roofline_frac"] = round(s["roofline_ms"] / s["ms"], 3)
            s["ms"] = round(s["ms"], 2)
            s["gflops"] = round(s["gflops"], 1)
            s["gbytes"] = round(s["gbytes"], 2)
            s["img_per_s"] = round(batch / (s["ms"] / 1e3), 1)
            print(f"b{batch:<4d} {name:12s} {s['ms']:8.2f} ms "
                  f"({s['img_per_s']:7.1f} img/s)  roofline {s['roofline_ms']:7.2f} ms "
                  f"({100 * s['roofline_frac']:.0f}% of bound)  "
                  f"{s['gflops']:.0f} GF {s['gbytes']:.1f} GB", flush=True)
        report["stages"][f"b{batch}"] = stages

        # free the stage temporaries before the races — at b256 they pin
        # ~600 MB that the remat races need for activation headroom
        del images, depths, images16, bf16_params, state
        # ---- races: remat policies + accumulation
        races = {}
        for label, kwargs in (
                ("auto", {}),
                ("remat_full", {"remat": "full"}),
                ("remat_dots", {"remat": "dots"}),
                ("accum2", {"accum_steps": 2}),
        ):
            stp = make_train_step(mixed_precision=True, **kwargs)
            try:
                ms = chained_time_state(stp, fresh_state(), batch_dict, key)
                cost = cost_of(stp, fresh_state(), batch_dict, key)
            except Exception as exc:  # OOM etc. — record and continue
                races[label] = {"error": str(exc)[:200]}
                print(f"b{batch:<4d} race {label:12s} FAILED: {exc}",
                      flush=True)
                continue
            races[label] = {"ms": round(ms, 2),
                            "img_per_s": round(batch / (ms / 1e3), 1),
                            "gflops": round(cost["gflops"], 1),
                            "gflops_per_img": round(cost["gflops"] / batch, 1)}
            print(f"b{batch:<4d} race {label:12s} {ms:8.2f} ms "
                  f"({batch / (ms / 1e3):7.1f} img/s)  "
                  f"{cost['gflops'] / batch:.0f} GF/img", flush=True)
        report["races"][f"b{batch}"] = races

    out = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                       f"train_roofline_{encoder}.json")
    with open(out, "w") as f:
        json.dump(report, f, indent=2)
    print(f"wrote {out}")


if __name__ == "__main__":
    main()
