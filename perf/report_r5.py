"""Round-5 MFU/roofline refresh at today's winners (VERDICT r4 next #2).

Every committed MFU number predated the constant-baking/staging wins
(perf/report_r2.json, perf/stages_efficientnet-b0_bf16.json). This probe
re-measures all 8 flagship families through the SHIPPING serving path
(``make_serving_fn`` with the cached policy, baked bf16, preprocess fused —
the exact construction bench.py times) and records, per family:

  * e2e fps (chained-fence, forced completion)
  * XLA cost-analysis FLOPs and bytes-accessed of the full pipeline
  * achieved TFLOP/s → FLOP-MFU vs the v5e bf16 peak (197 TFLOP/s)
  * achieved GB/s → HBM-bandwidth utilization vs the v5e peak (819 GB/s)
  * the ROOFLINE bound: light-speed time = max(flops/peak, bytes/bw) —
    states which wall the family actually sits under and % achieved.
    (FLOP-MFU is the wrong roof for depthwise-dominated EfficientNets;
    this is the honest "is it fast or fast-looking" number.)

Plus an encoder-stage roofline for ENB0 (the stage the stale r2 artifact
measured at 39 ms / 1.7% MFU before every fusion/bake win).

Run on the chip: ``python perf/report_r5.py``; writes perf/report_r5.json.
Reference hat: ReSIDE/inference_benchmark.py:65-88 (fps/memory per model).
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from efficientdepthestimation_tpu.utils.jitcache import enable_persistent_cache

enable_persistent_cache()

import jax
import jax.numpy as jnp

from efficientdepthestimation_tpu.apps.common import (
    init_variables,
    make_serving_fn,
)
from efficientdepthestimation_tpu.models import build_model

V5E_BF16_PEAK_TFLOPS = 197.0
V5E_HBM_GBPS = 819.0
BATCH = int(os.environ.get("BATCH", "128"))
ITERS = int(os.environ.get("ITERS", "10"))
POLICY = os.path.join(os.path.dirname(__file__), "serving_policy_v5e.json")

FAMILIES = [
    ("efficientnet-b0", "hu2018"),
    ("efficientnet-b4", "hu2018"),
    ("resnet50", "hu2018"),
    ("densenet161", "hu2018"),
    ("senet154", "hu2018"),
    ("efficientnet-b0", "lasinger2019"),
    ("efficientnet-b4", "lasinger2019"),
    ("resnet50", "lasinger2019"),
]


def timed_fps(fn, frames, batch, iters=ITERS, warmup=3):
    """Forced-completion throughput with MINIMAL extra dispatches.

    Dispatching a separate ``jnp.sum`` program between serving calls stalls
    the tunnel's dispatch pipeline (~60 ms/call measured on a degraded day:
    1,400 fps for a ~3,470 fps program — bench.py's A/B). A TPU executes
    its programs in dispatch order on one stream, so fetching a scalar of
    the LAST call's output forces completion of the whole window; the sums
    of earlier outputs are dispatched AFTER the window closes only to
    assert finiteness without perturbing the timing.
    """
    out = fn(frames)
    jax.block_until_ready(out)
    for _ in range(warmup):
        out = fn(frames)
    float(jnp.sum(out))  # fence
    t0 = time.perf_counter()
    outs = [fn(frames) for _ in range(iters)]
    float(jnp.sum(outs[-1]))  # in-order execution closes the window
    dt = time.perf_counter() - t0
    checksum = float(jnp.stack([jnp.sum(o) for o in outs]).sum())
    assert np.isfinite(checksum)
    return batch * iters / dt


def cost(fn, *args):
    """(flops, bytes_accessed) from XLA cost analysis of fn as ONE program."""
    try:
        an = jax.jit(fn).lower(*args).compile().cost_analysis()
        if isinstance(an, list):
            an = an[0]
        return (float(an.get("flops", float("nan"))),
                float(an.get("bytes accessed", float("nan"))))
    except Exception:
        return float("nan"), float("nan")


def roofline(flops, nbytes, measured_s):
    """Light-speed time under the two-wall roofline + achieved fraction."""
    t_flops = flops / (V5E_BF16_PEAK_TFLOPS * 1e12)
    t_bw = nbytes / (V5E_HBM_GBPS * 1e9)
    bound = "hbm_bandwidth" if t_bw >= t_flops else "mxu_flops"
    t_light = max(t_flops, t_bw)
    return {
        "light_speed_ms": round(t_light * 1e3, 3),
        "bound": bound,
        "pct_of_light_speed": round(100 * t_light / measured_s, 1),
    }


def main():
    print("platform:", jax.default_backend(), jax.devices(), flush=True)
    rng = np.random.default_rng(0)
    frames = jnp.asarray(
        rng.integers(0, 256, (BATCH, 480, 640, 3), dtype=np.uint8))

    records = {}
    for encoder, decoder in FAMILIES:
        name = f"{encoder}-{decoder}"
        if decoder == "lasinger2019":
            model = build_model(encoder, decoder, input_size=(228, 304),
                                output_size=(114, 152))
        else:
            model = build_model(encoder, decoder)
        with jax.default_device(jax.local_devices(backend="cpu")[0]):
            variables = init_variables(model, (228, 304), batch=1)
        variables = jax.tree_util.tree_map(
            lambda x: np.asarray(x).astype(jnp.bfloat16)
            if x.dtype == jnp.float32 else np.asarray(x), variables)

        fn = make_serving_fn(model, variables, batch_hint=BATCH,
                             upsample_to=(480, 640), dtype=jnp.bfloat16,
                             preprocess=True,
                             policy_path=POLICY if os.path.isfile(POLICY)
                             else None)
        fps = timed_fps(fn, frames, BATCH)
        ms = BATCH / fps * 1e3 / BATCH  # per-frame ms
        batch_s = BATCH / fps
        flops, nbytes = cost(fn, frames)
        entry = {
            "batch": BATCH,
            "fps": round(fps, 1),
            "ms_per_batch": round(batch_s * 1e3, 2),
            "gflops_per_batch": round(flops / 1e9, 1),
            "gbytes_per_batch": round(nbytes / 1e9, 3),
            "achieved_tflops_per_s": round(flops / batch_s / 1e12, 1),
            "flop_mfu_pct": round(
                100 * flops / batch_s / 1e12 / V5E_BF16_PEAK_TFLOPS, 1),
            "achieved_hbm_gbps": round(nbytes / batch_s / 1e9, 1),
            "hbm_utilization_pct": round(
                100 * nbytes / batch_s / 1e9 / V5E_HBM_GBPS, 1),
        }
        if np.isfinite(flops) and np.isfinite(nbytes):
            entry["roofline"] = roofline(flops, nbytes, batch_s)
        records[name] = entry
        print(f"{name}: {fps:.0f} fps, {entry['flop_mfu_pct']}% FLOP-MFU, "
              f"{entry['hbm_utilization_pct']}% HBM, "
              f"roofline {entry.get('roofline')}", flush=True)
        del fn

    # ---- ENB0 encoder stage roofline (the stale 1.7%-MFU artifact's twin)
    from efficientdepthestimation_tpu.data.transforms import (
        eval_preprocess_image_only,
    )

    model = build_model("efficientnet-b0", "hu2018")
    with jax.default_device(jax.local_devices(backend="cpu")[0]):
        variables = init_variables(model, (228, 304), batch=1)
    variables = jax.device_put(jax.tree_util.tree_map(
        lambda x: np.asarray(x).astype(jnp.bfloat16)
        if x.dtype == jnp.float32 else np.asarray(x), variables))
    enc = model.encoder_factory()
    ev = {"params": variables["params"]["E"]}
    if "batch_stats" in variables:
        ev["batch_stats"] = variables["batch_stats"]["E"]
    images = eval_preprocess_image_only(frames).astype(jnp.bfloat16)
    jax.block_until_ready(images)

    enc_baked = jax.jit(lambda x: enc.apply(ev, x, False))
    fps_enc = timed_fps(lambda x: enc_baked(x)[3], images, BATCH)
    batch_s = BATCH / fps_enc
    flops, nbytes = cost(lambda x: enc_baked(x), images)
    stage = {
        "stage": "efficientnet-b0 encoder (baked bf16, b128 228x304)",
        "ms_per_batch": round(batch_s * 1e3, 2),
        "gflops_per_batch": round(flops / 1e9, 1),
        "gbytes_per_batch": round(nbytes / 1e9, 3),
        "flop_mfu_pct": round(
            100 * flops / batch_s / 1e12 / V5E_BF16_PEAK_TFLOPS, 1),
        "hbm_utilization_pct": round(
            100 * nbytes / batch_s / 1e9 / V5E_HBM_GBPS, 1),
        "roofline": roofline(flops, nbytes, batch_s)
        if np.isfinite(flops) and np.isfinite(nbytes) else None,
        "stale_r2_artifact": "perf/stages_efficientnet-b0_bf16.json: "
                             "39.3 ms / 1.7% MFU (pre-bake, pre-fusion)",
    }
    print("encoder stage:", json.dumps(stage), flush=True)

    out = {"device": jax.devices()[0].device_kind,
           "peaks": {"bf16_tflops": V5E_BF16_PEAK_TFLOPS,
                     "hbm_gbps": V5E_HBM_GBPS},
           "pipeline": "uint8 640x480 -> preprocess -> forward (bf16, baked,"
                       " policy) -> upsample 640x480; make_serving_fn"
                       " preprocess=True (the bench.py/shipping path)",
           "families": records,
           "enb0_encoder_stage": stage}
    path = os.path.join(os.path.dirname(__file__), "report_r5.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=2)
    print(f"wrote {path}")


if __name__ == "__main__":
    main()
