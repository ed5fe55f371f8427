"""Why is the monolithic model program slower than the sum of its stages?

Compares, for a Hu2018 model at a given batch:
  (a) monolithic: one jit for the whole model.apply
  (b) staged: four chained jits (encoder → D → MFF → R), device-resident
      intermediates, async dispatch
  (c) barrier: one jit with lax.optimization_barrier between stages
      (same fusion boundaries as (b) but one executable)

Run: python perf/composition_gap.py [encoder] [batch]
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
    from efficientdepthestimation_tpu.models.registry import encoder_spec
    from efficientdepthestimation_tpu.models.hu2018 import DecoderD, MFF, RefineR

    encoder = sys.argv[1] if len(sys.argv) > 1 else "resnet50"
    batch = int(sys.argv[2]) if len(sys.argv) > 2 else 128

    spec = encoder_spec(encoder)
    model = build_model(encoder, "hu2018")
    variables = init_variables(model, (228, 304), batch=1)
    cast = jax.device_put(jax.tree_util.tree_map(
        lambda x: x.astype(jnp.bfloat16) if x.dtype == jnp.float32 else x,
        variables))

    def subvars(name):
        return {"params": cast["params"][name],
                "batch_stats": cast["batch_stats"][name]}

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((batch, 228, 304, 3)), jnp.bfloat16)

    enc = spec.factory()
    d_mod = DecoderD(spec.num_features)
    mff_mod = MFF()
    r_mod = RefineR(spec.block_channels[-1])

    run_enc = jax.jit(lambda v, x: enc.apply(v, x, False))
    taps0 = jax.block_until_ready(run_enc(subvars("E"), x))
    dsize = tuple(d * 2 for d in taps0[0].shape[1:3])
    run_d = jax.jit(lambda v, t: d_mod.apply(v, t, False))
    run_mff = jax.jit(lambda v, t: mff_mod.apply(v, t, dsize, False))
    run_r_s = jax.jit(lambda v, a, b, carry: carry + jnp.sum(r_mod.apply(
        v, jnp.concatenate([a, b], axis=-1), False).astype(jnp.float32)))

    @jax.jit
    def mono(v, x, carry):
        return carry + jnp.sum(model.apply(v, x).astype(jnp.float32))

    ev, dv, mv, rv = subvars("E"), subvars("D"), subvars("MFF"), subvars("R")

    def staged(_, x, carry):
        taps = run_enc(ev, x)
        a = run_d(dv, taps)
        b = run_mff(mv, taps)
        return run_r_s(rv, a, b, carry)

    @jax.jit
    def barrier(v, x, carry):
        def sub(name):
            return {"params": v["params"][name],
                    "batch_stats": v["batch_stats"][name]}
        taps = enc.apply(sub("E"), x, False)
        taps = jax.lax.optimization_barrier(tuple(taps))
        a = d_mod.apply(sub("D"), taps, False)
        b = mff_mod.apply(sub("MFF"), taps, dsize, False)
        a, b = jax.lax.optimization_barrier((a, b))
        out = r_mod.apply(sub("R"), jnp.concatenate([a, b], axis=-1), False)
        return carry + jnp.sum(out.astype(jnp.float32))

    def measure(fn, *args, warmup=3, iters=15):
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

    for name, fn in (("monolithic", mono), ("staged", staged),
                     ("barrier", barrier)):
        ms = measure(fn, cast, x) * 1e3
        print(json.dumps({"variant": name, "batch": batch,
                          "ms": round(ms, 2),
                          "fps": round(batch / ms * 1e3, 1)}), flush=True)


if __name__ == "__main__":
    main()
