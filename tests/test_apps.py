"""End-to-end smoke tests of the CLI apps on tiny synthetic fixtures."""

import os

import numpy as np
import pytest

import jax

from efficientdepthestimation_tpu.apps.common import (
    infer_arch_from_path,
    load_any_checkpoint,
)
from efficientdepthestimation_tpu.checkpoints.serialization import save_checkpoint
from efficientdepthestimation_tpu.models import build_model


@pytest.fixture(scope="module")
def workspace(tmp_path_factory):
    """Tiny resnet18-HU checkpoint + synthetic NYU csv + frame dir."""
    from PIL import Image

    root = tmp_path_factory.mktemp("apps")
    rng = np.random.default_rng(0)

    model = build_model("resnet18", "hu2018")
    import jax.numpy as jnp

    variables = model.init({"params": jax.random.PRNGKey(0)},
                           jnp.zeros((1, 228, 304, 3)))
    ckpt_dir = root / "checkpoints"
    ckpt_dir.mkdir()
    ckpt = str(ckpt_dir / "RN18-HU.ede")
    save_checkpoint(ckpt, jax.tree_util.tree_map(np.asarray, variables),
                    encoder="resnet18", decoder="hu2018")

    image = rng.integers(0, 256, (480, 640, 3), dtype=np.uint8)
    depth16 = rng.integers(500, 9000, (480, 640), dtype=np.uint16)
    img_path = str(root / "rgb.png")
    d16_path = str(root / "depth.png")
    Image.fromarray(image).save(img_path)
    Image.fromarray(depth16, mode="I;16").save(d16_path)

    csv = root / "test.csv"
    with open(csv, "w") as f:
        for _ in range(2):
            f.write(f"{img_path},{d16_path}\n")

    frames = root / "frames"
    frames.mkdir()
    for i in range(2):
        Image.fromarray(image).save(frames / f"{i:03d}.png")

    return dict(root=root, ckpt=ckpt, ckpt_dir=str(ckpt_dir), csv=str(csv),
                frames=str(frames), img_path=img_path)


def test_load_any_checkpoint_ede(workspace):
    model, variables = load_any_checkpoint(workspace["ckpt"])
    assert "params" in variables


def test_staged_infer_matches_monolithic(workspace):
    """The 4-program staged Hu forward (encoder→D→MFF→R, used at large
    serving batch to dodge XLA's monolithic buffer-assignment cliff) must
    produce the same depths as the single-program path."""
    import jax.numpy as jnp

    from efficientdepthestimation_tpu.apps.common import (
        make_infer_fn,
        make_staged_infer_fn,
    )

    model, variables = load_any_checkpoint(workspace["ckpt"])
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.standard_normal((2, 228, 304, 3)), jnp.float32)
    mono = make_infer_fn(model, variables, upsample_to=(480, 640))(x)
    for mff_merge in ("module", "grouped", "blockdiag"):
        staged = make_staged_infer_fn(model, variables, upsample_to=(480, 640),
                                      mff_merge=mff_merge)(x)
        np.testing.assert_allclose(np.asarray(staged), np.asarray(mono),
                                   rtol=2e-5, atol=2e-5)


def test_baked_weights_match_argument_weights(workspace):
    """bake_weights=True (weights as compile-time constants — the fast
    fixed-checkpoint serving path, perf/bake_sweep_*.json) must produce the
    same depths as the argument-weights program on every path shape. XLA's
    constant folding may reassociate float ops, so tolerance, not bitwise."""
    import jax.numpy as jnp

    from efficientdepthestimation_tpu.apps.common import (
        make_infer_fn,
        make_staged_infer_fn,
        make_tiled_infer_fn,
    )

    model, variables = load_any_checkpoint(workspace["ckpt"])
    rng = np.random.default_rng(7)
    x = jnp.asarray(rng.standard_normal((3, 228, 304, 3)), jnp.float32)
    ref = make_infer_fn(model, variables, upsample_to=(480, 640))(x)
    for label, fn in [
        ("mono", make_infer_fn(model, variables, upsample_to=(480, 640),
                               bake_weights=True)),
        ("staged", make_staged_infer_fn(model, variables,
                                        upsample_to=(480, 640),
                                        bake_weights=True)),
        ("tiled", make_tiled_infer_fn(model, variables, tile_batch=2,
                                      upsample_to=(480, 640),
                                      bake_weights=True)),
    ]:
        np.testing.assert_allclose(np.asarray(fn(x)), np.asarray(ref),
                                   rtol=2e-5, atol=2e-5, err_msg=label)


def test_tiled_infer_matches_monolithic(workspace):
    """Batch-tiled serving (sweet-spot tiles + remainder program) must equal
    the single-dispatch forward for batches that are NOT a tile multiple."""
    import jax.numpy as jnp

    from efficientdepthestimation_tpu.apps.common import (
        make_infer_fn,
        make_tiled_infer_fn,
    )

    model, variables = load_any_checkpoint(workspace["ckpt"])
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.standard_normal((5, 228, 304, 3)), jnp.float32)
    mono = make_infer_fn(model, variables, upsample_to=(480, 640))(x)
    for staged in (False, True):
        tiled = make_tiled_infer_fn(model, variables, tile_batch=2,
                                    staged=staged, upsample_to=(480, 640))(x)
        assert tiled.shape == mono.shape
        np.testing.assert_allclose(np.asarray(tiled), np.asarray(mono),
                                   rtol=2e-5, atol=2e-5)


@pytest.mark.slow
def test_dw_impl_serving_matches_default():
    """Every alternative depthwise lowering (shifted-FMA, Pallas fused
    MBConv) must serve the same depths as the XLA grouped-conv default on an
    EfficientNet model."""
    import jax
    import jax.numpy as jnp

    from efficientdepthestimation_tpu.apps.common import make_infer_fn
    from efficientdepthestimation_tpu.models import build_model

    model = build_model("efficientnet-b0", "hu2018")
    variables = model.init({"params": jax.random.PRNGKey(0)},
                           jnp.zeros((1, 76, 104, 3)))
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.standard_normal((2, 76, 104, 3)), jnp.float32)
    ref = make_infer_fn(model, variables)(x)
    for impl in ("shift", "pallas"):
        alt = make_infer_fn(model, variables, dw_impl=impl)(x)
        np.testing.assert_allclose(np.asarray(alt), np.asarray(ref),
                                   rtol=2e-5, atol=2e-5, err_msg=impl)


def test_make_serving_fn_policy_and_equivalence(workspace):
    """make_serving_fn bakes weights for fixed-checkpoint batch serving by
    default (monolithic wins every family then); with bake_weights=False it
    keeps the round-2 policy — staged for wide-top encoders at batch>=128,
    tiled beyond 128, monolithic otherwise — and every path agrees."""
    import jax.numpy as jnp

    from efficientdepthestimation_tpu.apps import common

    model, variables = load_any_checkpoint(workspace["ckpt"])

    calls = []
    real = {"mono": common.make_infer_fn, "staged": common.make_staged_infer_fn,
            "tiled": common.make_tiled_infer_fn}
    try:
        common.make_infer_fn = lambda *a, **k: calls.append("mono") or real["mono"](*a, **k)
        common.make_staged_infer_fn = lambda *a, **k: calls.append("staged") or real["staged"](*a, **k)
        common.make_tiled_infer_fn = lambda *a, **k: calls.append("tiled") or real["tiled"](*a, **k)

        # resnet18 top tap is 512 channels -> narrow -> monolithic even at 128
        common.make_serving_fn(model, variables, batch_hint=128)
        assert calls == ["mono"]
        calls.clear()
        common.make_serving_fn(model, variables, batch_hint=256)
        assert calls[0] == "tiled"
        calls.clear()

        import dataclasses
        wide = dataclasses.replace(model, block_channel=(256, 512, 1024, 2048))
        common.make_serving_fn(wide, variables, batch_hint=64)
        assert calls == ["mono"]
        calls.clear()
        # default (bake): baked monolithic beats staged for wide tops too
        common.make_serving_fn(wide, variables, batch_hint=128)
        assert calls[0] == "mono"
        calls.clear()
        # weight-swapping serving opts out of baking -> staged path returns
        common.make_serving_fn(wide, variables, batch_hint=128,
                               bake_weights=False)
        assert calls[0] == "staged"
        calls.clear()
    finally:
        common.make_infer_fn = real["mono"]
        common.make_staged_infer_fn = real["staged"]
        common.make_tiled_infer_fn = real["tiled"]

    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.standard_normal((3, 228, 304, 3)), jnp.float32)
    mono = common.make_infer_fn(model, variables)(x)
    served = common.make_serving_fn(model, variables, batch_hint=3)(x)
    np.testing.assert_allclose(np.asarray(served), np.asarray(mono),
                               rtol=2e-5, atol=2e-5)


def test_infer_arch_from_path():
    assert infer_arch_from_path("pretrained_model/model_resnet") == ("resnet50", "hu2018")
    assert infer_arch_from_path("x/efficientnet-b0-lasinger2019.pth") == (
        "efficientnet-b0", "lasinger2019")
    assert infer_arch_from_path("senet_best.pth") == ("senet154", "hu2018")


def test_demo_app(workspace, tmp_path):
    from efficientdepthestimation_tpu.apps import demo

    out_dir = str(tmp_path / "demo_out")
    demo.main(["-i", workspace["img_path"], "-m", workspace["ckpt"], "-o", out_dir])
    assert os.listdir(out_dir) == ["rgb.png"]


def test_evaluate_app(workspace):
    from efficientdepthestimation_tpu.apps import evaluate

    tracker, edges = evaluate.main(
        ["--model", workspace["ckpt"], "--test-csv", workspace["csv"],
         "--batch-size", "2"])
    assert np.isfinite(tracker.abs_rel.value)
    assert 0 <= edges["edge_accuracy"] <= 1


def test_test_nyu_app(workspace, tmp_path):
    from efficientdepthestimation_tpu.apps import test_nyu

    out_dir = str(tmp_path / "nyu_out")
    test_nyu.main(["-c", workspace["ckpt_dir"], "--test-csv", workspace["csv"],
                   "-b", "2", "-o", out_dir])
    files = os.listdir(os.path.join(out_dir, "RN18-HU"))
    assert sorted(files) == ["0000.jpg", "0000.png", "0001.jpg", "0001.png"]
    from PIL import Image

    depth = np.asarray(Image.open(os.path.join(out_dir, "RN18-HU", "0000.png")))
    assert depth.dtype == np.int32 or depth.dtype == np.uint16  # 16-bit png


def test_inference_benchmark_app(workspace, tmp_path):
    from efficientdepthestimation_tpu.apps import inference_benchmark

    out_dir = str(tmp_path / "bench_out")
    summary = inference_benchmark.main(
        ["-c", workspace["ckpt_dir"], "-f", workspace["frames"],
         "-n", "2", "-b", "2", "-o", out_dir])
    assert os.path.exists(os.path.join(out_dir, "inference_benchmark.csv"))
    assert os.path.exists(os.path.join(out_dir, "inference_benchmark.tex"))
    assert ("RN18-HU",) in summary.index or "RN18-HU" in summary.index
    # compile time is its own column (trial 1 no longer smears it into the
    # steady-state mean) and memory is never a silent 0.0 — on backends
    # without allocator stats the static reservation is reported and labeled
    cols = {c[0] for c in summary.columns}
    assert {"first_call_time", "memory_usage", "memory_source"} <= cols
    assert float(summary[("memory_usage", "mean")].iloc[0]) > 0
    assert summary[("memory_source", "first")].iloc[0] in ("live", "static")


def test_point_clouds_and_collage_apps(workspace, tmp_path):
    from efficientdepthestimation_tpu.apps import pcd2image, point_clouds

    ply_root = tmp_path / "plys" / "hu2018" / "rn18"
    ply_root.mkdir(parents=True)
    point_clouds.main(["-i", workspace["frames"], "-m", workspace["ckpt"],
                       "-o", str(ply_root), "--max-frames", "6"])
    plys = sorted(os.listdir(ply_root))
    assert plys[0] == "0000.ply"
    # duplicate to satisfy the 6-sample collage layout
    import shutil

    for i in range(len(plys), 6):
        shutil.copy(ply_root / "0000.ply", ply_root / f"{i:04d}.ply")

    out_png = str(tmp_path / "collage.png")
    pcd2image.main(["-i", str(tmp_path / "plys"), "--size", "64",
                    "--output", out_png])
    assert os.path.exists(out_png)


def test_examples_app(workspace, tmp_path):
    from efficientdepthestimation_tpu.apps import examples

    out_dir = str(tmp_path / "examples_out")
    examples.main(["-c", workspace["ckpt_dir"], "--test-csv", workspace["csv"],
                   "-b", "2", "-o", out_dir])
    files = os.listdir(out_dir)
    assert any(f.endswith("_gt.png") for f in files)
    assert any("RN18-HU" in f for f in files)


def test_depth_video_app(workspace, tmp_path):
    from efficientdepthestimation_tpu.apps import depth_video

    out = depth_video.main([
        "-i", workspace["frames"], "-m", workspace["ckpt"],
        "-o", str(tmp_path), "--batch-size", "2",
    ])
    assert os.path.exists(out)
    import cv2

    cap = cv2.VideoCapture(out)
    assert cap.get(cv2.CAP_PROP_FRAME_COUNT) == 2
    # hstack(color, depth) at 2×1920 × (1440−2·180)
    assert cap.get(cv2.CAP_PROP_FRAME_WIDTH) == 3840
    assert cap.get(cv2.CAP_PROP_FRAME_HEIGHT) == 1080
    cap.release()


def test_data_parallel_serving_matches_single_device(workspace):
    """make_infer_fn(mesh=...) shards the batch over the data axis (SPMD
    serving analogue of the reference's DataParallel in test/demo wrappers);
    results must match the single-device path exactly."""
    import jax
    import jax.numpy as jnp

    from efficientdepthestimation_tpu.apps.common import make_infer_fn
    from efficientdepthestimation_tpu.parallel import create_mesh

    model, variables = load_any_checkpoint(workspace["ckpt"])
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.standard_normal((8, 228, 304, 3)), jnp.float32)

    single = make_infer_fn(model, variables, upsample_to=(480, 640))(x)
    mesh = create_mesh()
    sharded = make_infer_fn(model, variables, upsample_to=(480, 640),
                            mesh=mesh)(x)
    assert len(sharded.sharding.device_set) == mesh.shape["data"]
    np.testing.assert_allclose(np.asarray(sharded), np.asarray(single),
                               rtol=1e-5, atol=1e-5)

    # baked weights compose with SPMD serving (captured *sharded* arrays)
    baked = make_infer_fn(model, variables, upsample_to=(480, 640),
                          mesh=mesh, bake_weights=True)(x)
    assert len(baked.sharding.device_set) == mesh.shape["data"]
    np.testing.assert_allclose(np.asarray(baked), np.asarray(single),
                               rtol=1e-5, atol=1e-5)


def test_spatial_parallel_serving_matches_single_device(workspace):
    """make_infer_fn(mesh=..., spatial=True) shards image *rows* across all
    8 devices (GSPMD conv halo exchange) — the latency path for a batch too
    small to data-shard. Batch 1, non-divisible height (228 rows over 8
    devices exercises GSPMD's shard padding)."""
    import jax.numpy as jnp

    from efficientdepthestimation_tpu.apps.common import make_infer_fn
    from efficientdepthestimation_tpu.parallel import create_mesh

    model, variables = load_any_checkpoint(workspace["ckpt"])
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.standard_normal((1, 228, 304, 3)), jnp.float32)

    single = make_infer_fn(model, variables, upsample_to=(480, 640))(x)
    mesh = create_mesh()
    spatial = make_infer_fn(model, variables, upsample_to=(480, 640),
                            mesh=mesh, spatial=True)(x)
    # the program really ran across the whole mesh, not one device
    assert len(spatial.sharding.device_set) == mesh.devices.size
    np.testing.assert_allclose(np.asarray(spatial), np.asarray(single),
                               rtol=1e-5, atol=1e-5)


def test_preprocess_fused_serving_matches_external(workspace):
    """make_serving_fn(preprocess=True) — the bench/deployment e2e path —
    must equal external eval_preprocess_image_only + the plain serving fn,
    for monolithic, staged, and baked variants."""
    import jax.numpy as jnp

    from efficientdepthestimation_tpu.apps.common import (
        make_infer_fn,
        make_serving_fn,
        make_staged_infer_fn,
    )
    from efficientdepthestimation_tpu.data import eval_preprocess_image_only

    model, variables = load_any_checkpoint(workspace["ckpt"])
    rng = np.random.default_rng(11)
    frames = jnp.asarray(rng.integers(0, 256, (2, 480, 640, 3),
                                      dtype=np.uint8))
    images = eval_preprocess_image_only(frames)
    ref = np.asarray(make_infer_fn(model, variables,
                                   upsample_to=(480, 640))(images))

    fused_mono = make_infer_fn(model, variables, upsample_to=(480, 640),
                               preprocess=True)
    np.testing.assert_allclose(np.asarray(fused_mono(frames)), ref,
                               rtol=1e-5, atol=1e-5)

    fused_staged = make_staged_infer_fn(model, variables,
                                        upsample_to=(480, 640),
                                        preprocess=True)
    np.testing.assert_allclose(np.asarray(fused_staged(frames)), ref,
                               rtol=1e-5, atol=1e-5)

    # bench.py's exact construction (baked weights allowed to reassociate
    # float ops → tolerance, not bitwise)
    fused_serving = make_serving_fn(model, variables, batch_hint=2,
                                    upsample_to=(480, 640), preprocess=True)
    np.testing.assert_allclose(np.asarray(fused_serving(frames)), ref,
                               rtol=1e-4, atol=1e-4)
