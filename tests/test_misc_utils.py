"""Coverage for run logger, profiling utils, and the bench pipeline graph."""

import json
import os

import numpy as np

import jax
import jax.numpy as jnp


def test_run_logger_jsonl(tmp_path, monkeypatch, rng):
    monkeypatch.chdir(tmp_path)
    # no wandb in this environment → local JSONL backend
    from efficientdepthestimation_tpu.utils import RunLogger

    logger = RunLogger("proj", {"a": 1}, name_prefix="enc-dec")
    logger.set_summary("best", 0.5)
    logger.log({"loss": 1.25, "delta1": 0.8}, step=0)
    logger.log_images("examples", rng.uniform(size=(2, 8, 8, 1)), step=0)
    logger.finish()

    assert logger.name.startswith("enc-dec-")
    with open(os.path.join(logger.dir, "log.jsonl")) as f:
        rec = json.loads(f.readline())
    assert rec["loss"] == 1.25
    with open(os.path.join(logger.dir, "summary.json")) as f:
        assert json.load(f)["best"] == 0.5
    assert len(os.listdir(os.path.join(logger.dir, "media", "examples"))) == 2


def test_profiling_helpers():
    from efficientdepthestimation_tpu.utils.profiling import (
        device_memory_stats,
        peak_device_memory,
        timed_blocked,
    )

    stats = device_memory_stats()
    assert isinstance(stats, dict)
    assert peak_device_memory() >= 0

    @jax.jit
    def f(x):
        return x * 2

    dt, out = timed_blocked(f, jnp.ones((8, 8)), warmup=1, iters=3)
    assert dt > 0
    assert float(out[0, 0]) == 2.0


def test_bench_pipeline_compiles_on_cpu():
    """Guard the driver-facing bench graph against breakage (shape eval only)."""
    import bench
    from efficientdepthestimation_tpu.data.transforms import (
        eval_preprocess_image_only,
    )
    from efficientdepthestimation_tpu.models import build_model
    from efficientdepthestimation_tpu.ops.resize import (
        resize_bilinear_align_corners,
    )

    model = build_model("efficientnet-b0", "hu2018")
    frames = jnp.zeros((2, 480, 640, 3), jnp.uint8)
    variables = jax.eval_shape(
        lambda: model.init(jax.random.PRNGKey(0), jnp.zeros((2, 228, 304, 3))))

    def pipeline(variables, frames_u8):
        images = eval_preprocess_image_only(frames_u8).astype(jnp.bfloat16)
        depth = model.apply(variables, images)
        return resize_bilinear_align_corners(depth.astype(jnp.float32), (480, 640))

    out = jax.eval_shape(pipeline, variables, frames)
    assert out.shape == (2, 480, 640, 1)
