"""Validate + time the AOT serving artifact on the real chip.

Exports the flagship ENB0-HU baked pipeline (random bf16 weights) to a
serving artifact, reloads it, checks it against the live jit path, and
races the two with the chained-checksum fence (bench.py methodology).
Writes perf/export_probe.json.
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

from efficientdepthestimation_tpu.apps.common import init_variables, make_infer_fn
from efficientdepthestimation_tpu.checkpoints.export import (
    load_serving_artifact,
    save_serving_artifact,
)
from efficientdepthestimation_tpu.data.transforms import eval_preprocess_image_only
from efficientdepthestimation_tpu.models import build_model

BATCH = int(os.environ.get("BATCH", "128"))
ITERS = 10


def timed(fn, frames):
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
    return BATCH * ITERS / dt


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

    rng = np.random.default_rng(0)
    frames = jnp.asarray(rng.integers(0, 256, (BATCH, 480, 640, 3), dtype=np.uint8))

    path = "/tmp/enb0_hu_b%d.edz" % BATCH
    t0 = time.perf_counter()
    # dtype=bf16 even though the tree is already bf16: dtype also controls
    # the ACTIVATION cast inside _pipeline. dtype=None (round-2 bug, see
    # ADVICE.md) ran the artifact with f32 activations against the live
    # path's bf16 activations — an apples-to-oranges 3x "gap".
    meta = save_serving_artifact(
        path, model, variables, encoder="efficientnet-b0", decoder="hu2018",
        batch=BATCH, dtype=jnp.bfloat16)
    t_export = time.perf_counter() - t0
    size_mb = os.path.getsize(path) / 1e6
    print(f"exported in {t_export:.1f}s, {size_mb:.1f} MB, meta={meta}",
          flush=True)

    art_fn, _ = load_serving_artifact(path)
    print("artifact loaded; compiling on device...", flush=True)

    # live path: same pipeline through make_infer_fn-style baked jit
    baked = jax.device_put(variables)

    @jax.jit
    def live(frames_u8):
        images = eval_preprocess_image_only(frames_u8).astype(jnp.bfloat16)
        depth = model.apply(baked, images).astype(jnp.float32)
        from efficientdepthestimation_tpu.ops.resize import (
            resize_bilinear_align_corners,
        )
        return resize_bilinear_align_corners(depth, (480, 640))

    a = np.asarray(art_fn(frames))
    print("artifact compiled+ran; compiling live path...", flush=True)
    b = np.asarray(live(frames))
    err = float(np.max(np.abs(a - b)))
    print(f"artifact-vs-live max abs diff: {err:.3e}")

    fps_art = timed(art_fn, frames)
    fps_live = timed(live, frames)
    rec = {"batch": BATCH, "platforms": meta["platforms"],
           "export_s": round(t_export, 1), "artifact_mb": round(size_mb, 1),
           "max_abs_diff": err, "fps_artifact": round(fps_art, 1),
           "fps_live_baked": round(fps_live, 1)}
    print(json.dumps(rec))
    with open(os.path.join(os.path.dirname(__file__), "export_probe.json"), "w") as f:
        json.dump(rec, f, indent=2)


if __name__ == "__main__":
    main()
