"""Bisect the ENB0 encoder's 39 ms (1.7 % MFU) at serving shapes.

Rather than timing each of the 16 MBConv blocks separately (64 jit
programs — prohibitive to compile over the TPU tunnel), each *op class*
is timed as ONE jitted program that runs every block's instance of that op
back-to-back on realistic shapes, chained through a checksum so XLA can't
elide anything:

  * dw_xla    — every depthwise conv, XLA grouped-conv lowering
  * dw_shift  — every depthwise conv as shifted-FMA (slice+multiply-add
                per kernel tap: pure VPU/bandwidth formulation)
  * se        — every squeeze-excite block (global mean → 2 tiny matmuls
                → sigmoid scale)
  * pw        — every pointwise (1×1) projection conv (the MXU part)

Exactness of dw_shift vs dw_xla is asserted once at batch 2 in f32.

Run: python perf/enb0_encoder_probe.py [batch]
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def build_rows(batch):
    from efficientdepthestimation_tpu.models.efficientnet import _block_plan
    _, plan = _block_plan("efficientnet-b0")
    h, w = 114, 152  # after stem s2 on 228x304
    rows = []
    for i, a in enumerate(plan):
        c = a["cin"] * a["expand"]
        rows.append(dict(i=i, h=h, w=w, c=c, k=a["kernel"], s=a["stride"],
                         se=max(1, int(a["cin"] * a["se"])), cout=a["cout"],
                         image_size=a["image_size"]))
        if a["stride"] == 2:
            h, w = (h + 1) // 2, (w + 1) // 2
    return rows


def dw_shifted(x, k, stride, pad):
    """Depthwise conv as a sum of strided-slice × per-channel-tap FMAs."""
    import jax
    import jax.numpy as jnp
    kh, kw, _ = k.shape
    xp = jnp.pad(x, ((0, 0), pad[0], pad[1], (0, 0)))
    oh = (xp.shape[1] - kh) // stride + 1
    ow = (xp.shape[2] - kw) // stride + 1
    out = None
    for di in range(kh):
        for dj in range(kw):
            sl = jax.lax.slice(
                xp, (0, di, dj, 0),
                (xp.shape[0], di + (oh - 1) * stride + 1,
                 dj + (ow - 1) * stride + 1, xp.shape[3]),
                (1, stride, stride, 1))
            term = sl * k[di, dj]
            out = term if out is None else out + term
    return out


def main():
    from efficientdepthestimation_tpu.utils.jitcache import enable_persistent_cache
    enable_persistent_cache()

    import jax
    import jax.numpy as jnp

    from efficientdepthestimation_tpu.ops.conv import conv2d, same_padding_static

    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 128
    dt = jnp.bfloat16
    rng = np.random.default_rng(0)
    rows = build_rows(batch)

    # Inputs/weights generated ON DEVICE (host->device uploads over the
    # tunnel measured at megabytes/s — a 2 GB upload never finishes).
    pads = [same_padding_static(r["image_size"], (r["k"],) * 2, (r["s"],) * 2)
            for r in rows]

    @jax.jit
    def gen_all(key):
        xs, dws, ses, pws, xos = [], [], [], [], []
        for r in rows:
            key, *ks = jax.random.split(key, 6)
            xs.append(jax.random.normal(ks[0], (batch, r["h"], r["w"], r["c"]), dt))
            dws.append(jax.random.normal(ks[1], (r["k"], r["k"], 1, r["c"]), dt))
            ho = r["h"] if r["s"] == 1 else (r["h"] + 1) // 2
            wo = r["w"] if r["s"] == 1 else (r["w"] + 1) // 2
            xos.append(jax.random.normal(ks[2], (batch, ho, wo, r["c"]), dt))
            ses.append((jax.random.normal(ks[3], (1, 1, r["c"], r["se"]), dt),
                        jax.random.normal(ks[4], (1, 1, r["se"], r["c"]), dt)))
            pws.append(jax.random.normal(key, (1, 1, r["c"], r["cout"]), dt))
        return xs, dws, ses, pws, xos

    t0 = time.perf_counter()
    xs, dws, ses, pws, xos = gen_all(jax.random.PRNGKey(0))
    jax.block_until_ready(xs)
    print(f"# data generated on device in {time.perf_counter()-t0:.1f}s",
          flush=True)

    def timed(fn, args, warmup=2, iters=10, label=""):
        run = jax.jit(fn)
        carry = jnp.zeros((), jnp.float32)
        t0 = time.perf_counter()
        for _ in range(warmup):
            carry = run(carry, *args)
        float(carry)
        print(f"# {label}: compiled+warm in {time.perf_counter()-t0:.1f}s",
              flush=True)
        carry = jnp.zeros((), jnp.float32)
        t0 = time.perf_counter()
        for _ in range(iters):
            carry = run(carry, *args)
        assert np.isfinite(float(carry))
        return (time.perf_counter() - t0) / iters * 1e3

    def all_dw_xla(carry, xs, dws):
        for r, x, k in zip(rows, xs, dws):
            y = conv2d(x, k, stride=r["s"], padding=pads[r["i"]], groups=r["c"])
            carry = carry + jnp.sum(y.astype(jnp.float32))
        return carry

    def all_dw_shift(carry, xs, dws):
        for r, x, k in zip(rows, xs, dws):
            y = dw_shifted(x, k[:, :, 0, :], r["s"], pads[r["i"]])
            carry = carry + jnp.sum(y.astype(jnp.float32))
        return carry

    def all_se(carry, xos, ses):
        for x, (w1, w2) in zip(xos, ses):
            sq = jnp.mean(x, axis=(1, 2), keepdims=True)
            sq = conv2d(sq, w1, stride=1, padding=0)
            sq = sq * jax.nn.sigmoid(sq)
            sq = conv2d(sq, w2, stride=1, padding=0)
            y = jax.nn.sigmoid(sq) * x
            carry = carry + jnp.sum(y.astype(jnp.float32))
        return carry

    def all_pw(carry, xos, pws):
        for x, w in zip(xos, pws):
            y = conv2d(x, w, stride=1, padding=0)
            carry = carry + jnp.sum(y.astype(jnp.float32))
        return carry

    # exactness: shifted-FMA == XLA grouped conv (batch 2, f32, per shape)
    for r in rows[:1] + rows[3:4] + rows[-1:]:
        kk = jax.random.split(jax.random.PRNGKey(r["i"]))
        x2 = jax.random.normal(kk[0], (2, r["h"], r["w"], r["c"]), jnp.float32)
        k2 = jax.random.normal(kk[1], (r["k"], r["k"], 1, r["c"]), jnp.float32)
        a1 = jax.jit(lambda x, k: conv2d(x, k, stride=r["s"],
                                         padding=pads[r["i"]],
                                         groups=r["c"]))(x2, k2)
        a2 = jax.jit(lambda x, k: dw_shifted(x, k[:, :, 0, :], r["s"],
                                             pads[r["i"]]))(x2, k2)
        np.testing.assert_allclose(np.asarray(a2), np.asarray(a1),
                                   rtol=1e-5, atol=1e-4)
    print("# exactness ok", flush=True)

    out = {"batch": batch}
    out["dw_xla_ms"] = round(timed(all_dw_xla, (xs, dws), label="dw_xla"), 2)
    out["dw_shift_ms"] = round(timed(all_dw_shift, (xs, dws), label="dw_shift"), 2)
    out["se_ms"] = round(timed(all_se, (xos, ses), label="se"), 2)
    out["pw_ms"] = round(timed(all_pw, (xos, pws), label="pw"), 2)

    # bandwidth floor for the dw pass: read x + write y once each
    bytes_moved = sum(x.size * 2 + xo.size * 2 for x, xo in zip(xs, xos))
    out["dw_hbm_floor_ms"] = round(bytes_moved / 819e9 * 1e3, 2)
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
