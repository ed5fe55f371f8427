"""In-program stage attribution for ENB0-HU via prefix ablation.

Standalone stage timings are NOT additive (encoder standalone measured
39 ms, yet the whole ENB0-LR model — same encoder — runs 13 ms;
perf/stages_efficientnet-b0_bf16.json sums to 136 ms vs 55 ms full).
The trustworthy decomposition is *marginal* cost inside one compiled
program: time prefixes of the pipeline

    enc | enc+D | enc+D+MFF | enc+D+MFF+R (= full)

and difference them. Also times the full model under each depthwise
lowering (xla / shift / pallas fused MBConv).

All data device-generated (host uploads over the tunnel are MB/s-slow).

Run: python perf/inprogram_attrib.py [batch] [variant]
"""

from __future__ import annotations

import json
import sys
import time


def main():
    from efficientdepthestimation_tpu.utils.jitcache import enable_persistent_cache
    enable_persistent_cache()

    import jax
    import jax.numpy as jnp

    from efficientdepthestimation_tpu.apps.common import (
        _fused_encoder_apply,
    )
    from efficientdepthestimation_tpu.models import build_model
    from efficientdepthestimation_tpu.models.hu2018 import DecoderD, MFF, RefineR
    from efficientdepthestimation_tpu.ops.conv import depthwise_impl

    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 128
    variant = sys.argv[2] if len(sys.argv) > 2 else "efficientnet-b0"
    dt = jnp.bfloat16

    model = build_model(variant, "hu2018")
    variables = model.init({"params": jax.random.PRNGKey(0)},
                           jnp.zeros((1, 228, 304, 3)))
    variables = jax.device_put(jax.tree_util.tree_map(
        lambda v: v.astype(dt) if v.dtype == jnp.float32 else v, variables))
    images = jax.jit(lambda k: jax.random.normal(
        k, (batch, 228, 304, 3), dt))(jax.random.PRNGKey(1))
    jax.block_until_ready(images)

    enc = model.encoder_factory()
    d_mod = DecoderD(model.num_features)
    mff_mod = MFF()
    r_mod = RefineR(model.block_channel[3])

    def sub(name):
        out = {"params": variables["params"][name]}
        if "batch_stats" in variables:
            out["batch_stats"] = variables["batch_stats"][name]
        return out

    def prefix(depth_, dw="xla"):
        def fwd(v, x):
            with depthwise_impl(dw):
                taps = enc.apply(sub("E"), x, False)
            acc = sum(jnp.sum(t.astype(jnp.float32)) for t in taps)
            if depth_ >= 1:
                x_d = d_mod.apply(sub("D"), taps, False)
                acc = acc + jnp.sum(x_d.astype(jnp.float32))
            if depth_ >= 2:
                x_mff = mff_mod.apply(sub("MFF"), taps, x_d.shape[1:3], False)
                acc = acc + jnp.sum(x_mff.astype(jnp.float32))
            if depth_ >= 3:
                out = r_mod.apply(sub("R"),
                                  jnp.concatenate([x_d, x_mff], axis=-1),
                                  False)
                acc = acc + jnp.sum(out.astype(jnp.float32))
            return acc
        return fwd

    def timed(fn, label, warmup=2, iters=10):
        run = jax.jit(lambda c, v, x: c + fn(v, x))
        carry = jnp.zeros((), jnp.float32)
        t0 = time.perf_counter()
        for _ in range(warmup):
            carry = run(carry, variables, images)
        float(carry)
        print(f"# {label}: compiled+warm {time.perf_counter()-t0:.1f}s",
              flush=True)
        carry = jnp.zeros((), jnp.float32)
        t0 = time.perf_counter()
        for _ in range(iters):
            carry = run(carry, variables, images)
        float(carry)
        ms = (time.perf_counter() - t0) / iters * 1e3
        print(json.dumps({"label": label, "ms": round(ms, 2)}), flush=True)
        return ms

    out = {"batch": batch, "variant": variant}
    out["enc"] = timed(prefix(0), "enc")
    out["enc_d"] = timed(prefix(1), "enc+D")
    out["enc_d_mff"] = timed(prefix(2), "enc+D+MFF")
    out["full"] = timed(prefix(3), "full")
    out["marginal_d"] = round(out["enc_d"] - out["enc"], 2)
    out["marginal_mff"] = round(out["enc_d_mff"] - out["enc_d"], 2)
    out["marginal_r"] = round(out["full"] - out["enc_d_mff"], 2)

    out["full_dw_shift"] = timed(prefix(3, dw="shift"), "full dw=shift")
    out["enc_dw_shift"] = timed(prefix(0, dw="shift"), "enc dw=shift")

    fused_apply = _fused_encoder_apply(model)
    if fused_apply is not None:
        out["full_dw_pallas"] = timed(
            lambda v, x: jnp.sum(fused_apply(v, x).astype(jnp.float32)),
            "full dw=pallas")
        from efficientdepthestimation_tpu.models.efficientnet import (
            efficientnet_apply_fused,
        )
        out["enc_dw_pallas"] = timed(
            lambda v, x: sum(jnp.sum(t.astype(jnp.float32)) for t in
                             efficientnet_apply_fused(sub("E"), x, variant)),
            "enc dw=pallas")

    print(json.dumps(out), flush=True)
    with open(f"perf/attrib_{variant}_b{batch}.json", "w") as f:
        json.dump(out, f, indent=2)


if __name__ == "__main__":
    main()
