"""Validate + time the AOT serving artifact on the real chip.

Round-4 version (VERDICT r3 next-round #3). Measures, per batch size:

  * ``live``          — baked-weights jit of the same pipeline (reference);
  * ``baked_export``  — weights embedded as constants IN the exported
    module (the r3 path: 0.39× live at b32 via bare ``Exported.call``;
    its b128 variant hit a >28-min compile cliff, so it's only exported
    at b32 here);
  * ``arg_artifact``  — weights stored beside a small module, passed as
    call arguments (compiles fast at any batch);
  * ``arg+bake_on_load`` — the same small artifact, weights closed over
    the load-site jit as host constants → the serving site gets the
    baked constant-folding speedup WITHOUT the giant exported-constants
    module (checkpoints/export.py:load_serving_artifact).

All loads now wrap the module in an outer ``jax.jit`` (cached-executable
dispatch instead of per-call ``xla.call_module`` re-entry — the r3 gap's
root cause). Writes perf/export_probe.json.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from efficientdepthestimation_tpu.utils.jitcache import enable_persistent_cache

enable_persistent_cache()

import jax
import jax.numpy as jnp
import numpy as np

from efficientdepthestimation_tpu.apps.common import init_variables
from efficientdepthestimation_tpu.checkpoints.export import (
    load_serving_artifact,
    save_serving_artifact,
)
from efficientdepthestimation_tpu.data.transforms import eval_preprocess_image_only
from efficientdepthestimation_tpu.models import build_model

BATCHES = [int(b) for b in os.environ.get("BATCHES", "32,128").split(",")]
BAKED_EXPORT_MAX_BATCH = int(os.environ.get("BAKED_EXPORT_MAX_BATCH", "32"))
ITERS = 10


def timed(fn, frames, batch):
    out = fn(frames)
    for _ in range(3):
        out = fn(frames)
    jax.block_until_ready(out)
    float(jnp.sum(out))  # fence
    t0 = time.perf_counter()
    acc = jnp.zeros((), jnp.float32)
    for _ in range(ITERS):
        out = fn(frames)
        acc = acc + jnp.sum(out)
    float(acc)
    dt = time.perf_counter() - t0
    return batch * ITERS / dt


def probe_batch(model, variables, batch):
    rng = np.random.default_rng(0)
    frames = jnp.asarray(
        rng.integers(0, 256, (batch, 480, 640, 3), dtype=np.uint8))

    # live path: same pipeline through a baked-weights jit
    baked = jax.device_put(variables)

    @jax.jit
    def live(frames_u8):
        images = eval_preprocess_image_only(frames_u8).astype(jnp.bfloat16)
        depth = model.apply(baked, images).astype(jnp.float32)
        from efficientdepthestimation_tpu.ops.resize import (
            resize_bilinear_align_corners,
        )
        return resize_bilinear_align_corners(depth, (480, 640))

    ref = np.asarray(live(frames))
    rec = {"batch": batch, "iters": ITERS, "variants": {}}
    rec["fps_live_baked"] = round(timed(live, frames, batch), 1)
    print(f"[b{batch}] live baked: {rec['fps_live_baked']} fps", flush=True)

    variants = []
    # dtype=bf16 here controls the ACTIVATION cast inside the exported
    # pipeline, matching the live path's bf16 activations (dtype=None was
    # the round-2 apples-to-oranges bug, ADVICE.md).
    arg_path = f"/tmp/enb0_hu_b{batch}_arg.edz"
    t0 = time.perf_counter()
    meta = save_serving_artifact(
        arg_path, model, variables, encoder="efficientnet-b0",
        decoder="hu2018", batch=batch, dtype=jnp.bfloat16,
        bake_weights=False)
    t_arg = time.perf_counter() - t0
    variants.append(("arg_artifact", arg_path, t_arg, False))
    variants.append(("arg+bake_on_load", arg_path, t_arg, True))

    if batch <= BAKED_EXPORT_MAX_BATCH:
        baked_path = f"/tmp/enb0_hu_b{batch}_baked.edz"
        t0 = time.perf_counter()
        save_serving_artifact(
            baked_path, model, variables, encoder="efficientnet-b0",
            decoder="hu2018", batch=batch, dtype=jnp.bfloat16,
            bake_weights=True)
        variants.append(("baked_export", baked_path,
                         time.perf_counter() - t0, False))
    else:
        rec["variants"]["baked_export"] = {
            "skipped": "b128 baked-module compile exceeded 28 min in r3 "
                       "(exported-constants cliff); arg+bake_on_load is "
                       "the supported route at production batch"}

    for name, path, t_export, bake_on_load in variants:
        fn, _ = load_serving_artifact(path, bake_on_load=bake_on_load)
        t0 = time.perf_counter()
        out = np.asarray(fn(frames))  # first call: on-device compile
        t_first = time.perf_counter() - t0
        err = float(np.max(np.abs(out - ref)))
        fps = timed(fn, frames, batch)
        rec["variants"][name] = {
            "export_s": round(t_export, 1),
            "artifact_mb": round(os.path.getsize(path) / 1e6, 1),
            "first_call_s": round(t_first, 1),
            "max_abs_diff_vs_live": err,
            "fps": round(fps, 1),
            "vs_live": round(fps / rec["fps_live_baked"], 3),
        }
        print(f"[b{batch}] {name}: {fps:.1f} fps "
              f"({fps / rec['fps_live_baked']:.2f}x live, err {err:.2e}, "
              f"export {t_export:.1f}s, first call {t_first:.1f}s)",
              flush=True)
    return rec


def main():
    print("platform:", jax.default_backend(), jax.devices(), flush=True)
    model = build_model("efficientnet-b0", "hu2018")
    # init on the host CPU: random weights for a throughput probe don't
    # merit a tunnel compile of the init program
    with jax.default_device(jax.local_devices(backend="cpu")[0]):
        variables = init_variables(model, (228, 304), batch=1)
    variables = jax.tree_util.tree_map(
        lambda x: np.asarray(x).astype(jnp.bfloat16)
        if x.dtype == jnp.float32 else np.asarray(x), variables)
    print("init done", flush=True)

    records = [probe_batch(model, variables, b) for b in BATCHES]
    out = {"records": records}
    print(json.dumps(out))
    with open(os.path.join(os.path.dirname(__file__),
                           "export_probe.json"), "w") as f:
        json.dump(out, f, indent=2)


if __name__ == "__main__":
    main()
