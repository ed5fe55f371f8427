"""Per-submodule profiling for a Hu2018 model on the real chip.

Breaks the forward into encoder / D / MFF / R, timing each with forced
completion (scalar fetch), and reports XLA cost-analysis FLOPs + achieved
TFLOP/s + MFU for each stage. Run: ``python perf/stage_profile.py``.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

V5E_BF16_PEAK_TFLOPS = 197.0  # v5e: 394 TOPs int8 / 197 TFLOPs bf16 per chip


def measure(fn, *args, warmup=3, iters=20):
    """fn(*args, carry) -> carry; chained carry, one fetch per window."""
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
    return (time.perf_counter() - t0) / iters


def cost_flops(jitted, *args):
    try:
        an = jitted.lower(*args).compile().cost_analysis()
        if isinstance(an, list):
            an = an[0]
        return float(an.get("flops", float("nan")))
    except Exception:
        return float("nan")


def main():
    from efficientdepthestimation_tpu.utils.jitcache import enable_persistent_cache
    enable_persistent_cache()

    import jax
    import jax.numpy as jnp

    from efficientdepthestimation_tpu.apps.common import init_variables
    from efficientdepthestimation_tpu.models import build_model
    from efficientdepthestimation_tpu.models.registry import encoder_spec
    from efficientdepthestimation_tpu.models.hu2018 import DecoderD, MFF, RefineR

    parser = argparse.ArgumentParser()
    parser.add_argument("--encoder", default="resnet50")
    parser.add_argument("--batch", type=int, default=128)
    parser.add_argument("--dtype", default="bf16", choices=["bf16", "f32"])
    args = parser.parse_args()

    dtype = jnp.bfloat16 if args.dtype == "bf16" else jnp.float32
    spec = encoder_spec(args.encoder)
    model = build_model(args.encoder, "hu2018")
    variables = init_variables(model, (228, 304), batch=1)
    cast = jax.device_put(jax.tree_util.tree_map(
        lambda x: x.astype(dtype) if x.dtype == jnp.float32 else x, variables))

    def subvars(name):
        return {"params": cast["params"][name],
                "batch_stats": cast["batch_stats"][name]}

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((args.batch, 228, 304, 3)), dtype)

    enc = spec.factory()
    enc_v = subvars("E")

    @jax.jit
    def run_enc(v, x):
        return enc.apply(v, x, False)

    taps = jax.block_until_ready(run_enc(enc_v, x))

    d_mod = DecoderD(spec.num_features)
    mff_mod = MFF()
    r_mod = RefineR(spec.block_channels[-1])
    d_v, mff_v, r_v = subvars("D"), subvars("MFF"), subvars("R")

    @jax.jit
    def run_d(v, taps):
        return d_mod.apply(v, taps, False)

    x_d = jax.block_until_ready(run_d(d_v, taps))

    @jax.jit
    def run_mff(v, taps):
        return mff_mod.apply(v, taps, x_d.shape[1:3], False)

    x_mff = jax.block_until_ready(run_mff(mff_v, taps))
    cat = jnp.concatenate([x_d, x_mff], axis=-1)

    @jax.jit
    def run_r(v, cat):
        return r_mod.apply(v, cat, False)

    # scalar-carry variants (force completion through the tunnel)
    def s(fn):
        def wrapped(*a):
            *args, carry = a
            return carry + sum(jnp.sum(t.astype(jnp.float32))
                               for t in jax.tree_util.tree_leaves(fn(*args)))
        return jax.jit(wrapped)

    full = jax.jit(lambda v, x: model.apply(v, x))
    full_s = s(lambda v, x: model.apply(v, x))
    enc_s = s(lambda v, x: enc.apply(v, x, False))
    d_s = s(lambda v, t: d_mod.apply(v, t, False))
    mff_s = s(lambda v, t: mff_mod.apply(v, t, x_d.shape[1:3], False))
    r_s = s(lambda v, c: r_mod.apply(v, c, False))

    stages = [
        ("full", full_s, (cast, x), full, (cast, x)),
        ("encoder", enc_s, (enc_v, x), run_enc, (enc_v, x)),
        ("D", d_s, (d_v, taps), run_d, (d_v, taps)),
        ("MFF", mff_s, (mff_v, taps), run_mff, (mff_v, taps)),
        ("R", r_s, (r_v, cat), run_r, (r_v, cat)),
    ]
    report = []
    for name, sfn, sargs, cfn, cargs in stages:
        ms = measure(sfn, *sargs) * 1e3
        fl = cost_flops(cfn, *cargs)
        tfs = fl / (ms / 1e3) / 1e12 if np.isfinite(fl) else float("nan")
        row = {"stage": name, "ms": round(ms, 2),
               "gflops": round(fl / 1e9, 1) if np.isfinite(fl) else None,
               "tflops_per_s": round(tfs, 1) if np.isfinite(tfs) else None,
               "mfu_pct": round(100 * tfs / V5E_BF16_PEAK_TFLOPS, 1)
               if np.isfinite(tfs) else None}
        report.append(row)
        print(json.dumps(row))

    with open(f"perf/stages_{args.encoder}_{args.dtype}.json", "w") as f:
        json.dump({"batch": args.batch, "stages": report}, f, indent=2)


if __name__ == "__main__":
    main()
