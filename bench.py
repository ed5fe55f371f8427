"""Benchmark: end-to-end 640×480 NYU-v2 inference throughput per TPU chip.

Measures the full serving pipeline per frame — uint8 640×480 ingest,
on-device preprocessing (PIL-parity Scale(240) + CenterCrop 304×228 +
normalize), flagship ENB0-HU forward in bfloat16, and align-corners upsample
of the depth map back to 640×480 — i.e. the work `ReSIDE/inference_benchmark.py`
and `ReSIDE/test_nyu.py` do per frame on GPU.

Timing methodology: steady-state pipelined throughput with *forced
completion* — a per-call scalar checksum is fetched to the host after the
timed window (`block_until_ready` alone does not guarantee device completion
through the axon tunnel; verified experimentally).

Prints ONE JSON line:
  {"metric": ..., "value": fps_per_chip, "unit": "frames/s/chip", "vs_baseline": ...}

Baseline: the reference's papers report ~30 fps for ENB0-HU batched GPU
inference (RTX-class hardware; the in-repo harness regenerates but does not
publish numbers, BASELINE.md). vs_baseline = fps_per_chip / 30.
"""

from __future__ import annotations

import json
import os
import time

GPU_BASELINE_FPS = 30.0
# Batch sweep on v5e (honest, fetch-fenced, pre-fusion): 32 → 906 fps,
# 128 → 1465 fps, 256 → 1084 fps, 512 → OOM; with the conv∘upsample fusion
# batch 128 reaches ~2228 fps, and with constant-baked weights ~3700.
# 128 is the throughput sweet spot.
BATCH = 128
WARMUP = 3
ITERS = 10


def _arm_watchdog(seconds: float):
    """Print an honest zero-result JSON line and exit if the run wedges.

    The TPU is reached through a tunnel that has multi-hour outages; backend
    init then blocks indefinitely (no error). A hung bench records nothing —
    worse than a zero with an explanation. Returns an Event to set on
    success, which disarms the watchdog.
    """
    import os
    import threading

    done = threading.Event()

    def fire():
        if not done.wait(seconds):
            print(json.dumps({
                "metric": "enb0_hu_e2e_640x480_inference",
                "value": 0.0,
                "unit": "frames/s/chip",
                "vs_baseline": 0.0,
                "notes": f"TPU backend unavailable (no result in {seconds:.0f}s"
                         " — tunnel outage); rerun when the device is back",
            }), flush=True)
            os._exit(2)

    threading.Thread(target=fire, daemon=True).start()
    return done


def main() -> None:
    watchdog_done = _arm_watchdog(1800.0)

    from efficientdepthestimation_tpu.utils.jitcache import enable_persistent_cache
    enable_persistent_cache()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from efficientdepthestimation_tpu.data.transforms import eval_preprocess_image_only
    from efficientdepthestimation_tpu.models import build_model
    from efficientdepthestimation_tpu.ops.resize import resize_bilinear_align_corners

    model = build_model("efficientnet-b0", "hu2018")
    rng = np.random.default_rng(0)
    frames = jnp.asarray(rng.integers(0, 256, (BATCH, 480, 640, 3), dtype=np.uint8))

    # Prefer the committed TRAINED checkpoint (the round-3 E2E artifact,
    # scripts/run_e2e.py — 21.5 MB, vs the reference ENB0-HU's 20.6 MB):
    # real weight values measured ~8% slower than random init through the
    # baked path (perf/trained_weights_bench.json, 3473 vs 3759 fps), so
    # benching the trained artifact is the honest headline.
    trained_path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                "e2e", "ENB0-HU-synthetic.ede")
    weights_note = "trained ENB0-HU (synthetic-NYU e2e artifact)"
    if os.path.isfile(trained_path):
        from efficientdepthestimation_tpu.apps.common import load_any_checkpoint

        model, variables = load_any_checkpoint(trained_path)
    else:
        weights_note = "random bf16 weights (throughput only)"
        init_images = jnp.zeros((BATCH, 228, 304, 3), jnp.float32)
        variables = model.init(
            {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
            init_images,
        )
    # bfloat16 weights + activations (MXU-native). The weight tree is
    # device_put FIRST, then closure-captured so jit bakes it as
    # compile-time constants: XLA folds the BatchNorm affines into adjacent
    # convs and pre-packs weight layouts once at compile time instead of on
    # every call — measured 2128 → 3698 fps on this exact pipeline
    # (perf/const_weights_probe.py; outputs bit-identical to the
    # argument-weights program, perf/bake_sweep_hu2018_b128.json). Capturing
    # *host*-resident weights would instead re-stage them per call — the
    # device_put is load-bearing.
    variables = jax.device_put(jax.tree_util.tree_map(
        lambda x: x.astype(jnp.bfloat16) if x.dtype == jnp.float32 else x,
        variables))

    @jax.jit
    def pipeline(frames_u8, carry):
        images = eval_preprocess_image_only(frames_u8)
        images = images.astype(jnp.bfloat16)
        depth = model.apply(variables, images)
        depth = resize_bilinear_align_corners(depth.astype(jnp.float32), (480, 640))
        # scalar checksum chained through iterations: a single host fetch of
        # the final carry forces completion of the whole sequence while
        # paying the host round-trip only once.
        return depth, carry + jnp.sum(depth)

    carry = jnp.zeros((), jnp.float32)
    out, carry = pipeline(frames, carry)
    assert out.shape == (BATCH, 480, 640, 1)
    for _ in range(WARMUP):
        out, carry = pipeline(frames, carry)
    float(carry)

    carry = jnp.zeros((), jnp.float32)
    t0 = time.perf_counter()
    for _ in range(ITERS):
        out, carry = pipeline(frames, carry)
    final = float(carry)  # forces completion of the full chain
    dt = time.perf_counter() - t0
    assert np.isfinite(final)

    # The measured program runs on exactly one device (no sharding), so the
    # per-chip figure is the raw throughput regardless of how many devices
    # happen to be visible. Weights are random bf16 — a pure throughput
    # measurement, not an accuracy run (noted in the JSON).
    fps_per_chip = BATCH * ITERS / dt
    watchdog_done.set()
    print(json.dumps({
        "metric": "enb0_hu_e2e_640x480_inference",
        "value": round(fps_per_chip, 2),
        "unit": "frames/s/chip",
        "vs_baseline": round(fps_per_chip / GPU_BASELINE_FPS, 3),
        "notes": f"single-device program; {weights_note}; true b1 device "
                 "latency 1.34 ms/frame (perf/b1_latency.json, chained "
                 "in-program scan)",
    }))


if __name__ == "__main__":
    main()
