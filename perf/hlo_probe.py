"""Probe: why does the full RN50-HU program exceed the sum of its stages?

Compares XLA cost-analysis bytes/flops of the full model program vs the
isolated encoder/D/MFF/R programs, and dumps top HLO op categories.
"""

from __future__ import annotations

import os
import sys
from collections import Counter

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
    cast = jax.tree_util.tree_map(
        lambda x: x.astype(jnp.bfloat16) if x.dtype == jnp.float32 else x,
        variables)

    def subvars(name):
        return {"params": cast["params"][name],
                "batch_stats": cast["batch_stats"][name]}

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((batch, 228, 304, 3)), jnp.bfloat16)

    enc = spec.factory()
    run_enc = jax.jit(lambda v, x: enc.apply(v, x, False))
    taps = run_enc(subvars("E"), x)
    d_mod = DecoderD(spec.num_features)
    run_d = jax.jit(lambda v, t: d_mod.apply(v, t, False))
    x_d = run_d(subvars("D"), taps)
    mff_mod = MFF()
    run_mff = jax.jit(lambda v, t: mff_mod.apply(v, t, x_d.shape[1:3], False))
    x_mff = run_mff(subvars("MFF"), taps)
    r_mod = RefineR(spec.block_channels[-1])
    cat = jnp.concatenate([x_d, x_mff], axis=-1)
    run_r = jax.jit(lambda v, c: r_mod.apply(v, c, False))
    full = jax.jit(lambda v, x: model.apply(v, x))

    def stats(jitted, *args):
        c = jitted.lower(*args).compile()
        an = c.cost_analysis()
        if isinstance(an, list):
            an = an[0]
        mem = c.memory_analysis()
        return {
            "gflops": an.get("flops", 0) / 1e9,
            "gbytes": an.get("bytes accessed", 0) / 1e9,
            "temp_mb": getattr(mem, "temp_size_in_bytes", 0) / 1e6,
        }, c

    rows = {}
    rows["full"], cfull = stats(full, cast, x)
    rows["encoder"], _ = stats(run_enc, subvars("E"), x)
    rows["D"], _ = stats(run_d, subvars("D"), taps)
    rows["MFF"], _ = stats(run_mff, subvars("MFF"), taps)
    rows["R"], _ = stats(run_r, subvars("R"), cat)
    for k, v in rows.items():
        print(k, {kk: round(vv, 2) for kk, vv in v.items()})
    ssum = {k: sum(rows[s][k] for s in ("encoder", "D", "MFF", "R"))
            for k in ("gflops", "gbytes")}
    print("stage_sum", {k: round(v, 2) for k, v in ssum.items()})

    # Top HLO ops by count in the full program
    txt = cfull.as_text()
    ops = Counter()
    for line in txt.splitlines():
        line = line.strip()
        if "=" in line and not line.startswith(("HloModule", "ENTRY", "%", "}", "ROOT")):
            rhs = line.split("=", 1)[1].strip()
            if " " in rhs:
                opname = rhs.split(" ", 1)[1].split("(")[0].strip()
                ops[opname.split(".")[0]] += 1
    for op, n in ops.most_common(15):
        print(f"{n:5d}  {op}")
    # count fusion kinds
    print("copy ops:", txt.count(" copy("))
    print("transpose ops:", txt.count(" transpose("))
    print("convolution ops:", txt.count(" convolution("))


if __name__ == "__main__":
    main()
