"""Isolate why the manual ENB0-HU chain (31.4 ms) beats model.apply (57 ms).

perf/model_stage_bisect.py showed model.apply at 56.9 ms/b128 even with a
scalar-only output, while perf/inprogram_attrib.py's manual submodule chain
measures 31.4 ms for the identical math. The one structural difference is
the attribution chain's *intermediate checksums*: `jnp.sum(taps)`,
`jnp.sum(x_d)`, `jnp.sum(x_mff)` folded into the carry. Extra scalar uses
of the big intermediates change XLA's fusion/buffer decisions. Variants:

  manual_sums   : exact inprogram_attrib prefix(3) (expect ~31 ms)
  manual_nosums : same chain, final-output sum only (graph == model.apply)
  manual_tapsum : only the encoder-tap sums kept
  apply_scalar  : model.apply + final sum (expect ~57 ms)

Run: python perf/checksum_fusion_probe.py [--encoder efficientnet-b0]
     [--batch 128]
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
    args = parser.parse_args()

    from efficientdepthestimation_tpu.utils.jitcache import enable_persistent_cache
    enable_persistent_cache()

    import jax
    import jax.numpy as jnp

    from efficientdepthestimation_tpu.models import build_model
    from efficientdepthestimation_tpu.models.hu2018 import DecoderD, MFF, RefineR

    model = build_model(args.encoder, "hu2018")
    variables = model.init({"params": jax.random.PRNGKey(0)},
                           jnp.zeros((1, 228, 304, 3)))
    variables = jax.device_put(jax.tree_util.tree_map(
        lambda v: v.astype(jnp.bfloat16) if v.dtype == jnp.float32 else v,
        variables))
    images = jax.jit(lambda k: jax.random.normal(
        k, (args.batch, 228, 304, 3), jnp.bfloat16))(jax.random.PRNGKey(1))
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

    def manual(sums: str):
        def fwd(v, x):
            taps = enc.apply(sub("E"), x, False)
            acc = jnp.zeros((), jnp.float32)
            if sums in ("all", "taps"):
                acc = acc + sum(jnp.sum(t.astype(jnp.float32)) for t in taps)
            x_d = d_mod.apply(sub("D"), taps, False)
            x_mff = mff_mod.apply(sub("MFF"), taps, x_d.shape[1:3], False)
            if sums == "all":
                acc = acc + jnp.sum(x_d.astype(jnp.float32))
                acc = acc + jnp.sum(x_mff.astype(jnp.float32))
            out = r_mod.apply(sub("R"),
                              jnp.concatenate([x_d, x_mff], axis=-1), False)
            return acc + jnp.sum(out.astype(jnp.float32))
        return fwd

    def apply_fwd(v, x):
        return jnp.sum(model.apply(v, x).astype(jnp.float32))

    def timed(fn, warmup=3, iters=10):
        run = jax.jit(lambda c, v, x: c + fn(v, x))
        carry = jnp.zeros((), jnp.float32)
        for _ in range(warmup):
            carry = run(carry, variables, images)
        float(carry)
        carry = jnp.zeros((), jnp.float32)
        t0 = time.perf_counter()
        for _ in range(iters):
            carry = run(carry, variables, images)
        assert np.isfinite(float(carry))
        return (time.perf_counter() - t0) / iters * 1e3

    results = {}
    for name, fn in [
        ("manual_sums", manual("all")),
        ("manual_nosums", manual("none")),
        ("manual_tapsum", manual("taps")),
        ("apply_scalar", apply_fwd),
    ]:
        ms = timed(fn)
        results[name] = round(ms, 2)
        print(f"{name:16s} {ms:8.2f} ms", flush=True)

    out = os.path.join(
        os.path.dirname(os.path.abspath(__file__)),
        f"checksum_fusion_{args.encoder}_b{args.batch}.json")
    with open(out, "w") as f:
        json.dump({"encoder": args.encoder, "batch": args.batch,
                   "results": results}, f, indent=2)
    print(f"wrote {out}")


if __name__ == "__main__":
    main()
