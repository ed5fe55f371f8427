"""Test configuration: force an 8-device virtual CPU platform.

Must run before the first ``import jax`` anywhere in the test session so the
XLA client is created with 8 host devices — this is the "fake backend" for
multi-chip mesh tests (SURVEY.md §4).
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

# The environment's axon boot hook (sitecustomize) force-sets
# jax_platforms="axon,cpu"; override it before any backend is created so the
# whole test session runs on the 8-device virtual CPU platform.
jax.config.update("jax_platforms", "cpu")

# Persistent compilation cache: model-forward tests are compile-bound on CPU;
# caching makes repeated suite runs fast.
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)

import numpy as np  # noqa: E402
import pytest  # noqa: E402

# --- Smoke tier -------------------------------------------------------------
# One cheap path through every subsystem; `pytest -m smoke` must stay under
# ~2 minutes warm (the inner dev loop — see README "Test tiers").
# Selectors are "file.py::test_name"; parametrized variants all match.
_SMOKE = {
    # numeric substrate
    "test_resize.py::test_bilinear_align_corners_matches_torch",
    "test_resize.py::test_pil_float_resize",
    "test_conv_norm.py::test_conv2d_matches_torch",
    "test_conv_norm.py::test_same_padding_static_matches_efficientnet_pytorch",
    "test_conv_norm.py::test_batch_norm_eval_matches_torch",
    "test_conv_norm.py::test_sobel_matches_reference_kernels",
    # fusion engine + pallas kernels
    "test_fused_upsample_conv.py::test_upsample_conv_matches_direct",
    "test_fused_upsample_conv.py::test_should_fuse_heuristic",
    "test_pallas_depthwise.py::test_channel_tiling_covers_all_tiles",
    # loss / metrics / masking
    "test_loss_metrics.py::test_depth_loss_matches_torch",
    "test_loss_metrics.py::test_fused_pallas_loss_matches_xla",
    "test_loss_metrics.py::test_depth_metrics_match_torch",
    "test_loss_metrics.py::test_metrics_tracker_running_average",
    "test_padding_mask.py::test_masked_loss_equals_unpadded_loss",
    # data pipeline (+ native decoder)
    "test_data_pipeline.py::test_eval_preprocess_matches_pil",
    "test_data_pipeline.py::test_depth_pair_dataset_and_batching",
    "test_data_pipeline.py::test_device_prefetch_order",
    "test_native_loader.py::test_rgb_png_matches_pil",
    # models / registry / checkpoints
    "test_models.py::test_block_channel_constants_match_reference",
    "test_models.py::test_checkpoint_name_parsing",
    "test_models.py::test_hu_model_small_encoders_forward",
    "test_models.py::test_midas_model_output_size",
    "test_pth_import.py::test_midas_self_describing_checkpoint",
    # training / schedule / preemption / multihost
    "test_train_step.py::test_pallas_loss_train_step",
    "test_train_step.py::test_step_lr_schedule",
    "test_preemption.py::test_sigterm_sets_preemption_flag",
    "test_multihost.py::test_make_global_batch_shards_data_axis",
    # quantization + autotuner + serving plumbing
    "test_quant.py::test_quantize_kernel_per_channel",
    "test_quant.py::test_gate_eligibility_static",
    "test_autotune.py::test_load_policy_missing_or_corrupt",
    "test_apps.py::test_infer_arch_from_path",
    "test_apps.py::test_load_any_checkpoint_ede",
    # benchmark harness / renderer / lpips
    "test_benchmark.py::test_ssim_matches_reference",
    "test_benchmark.py::test_psnr_matches_reference",
    "test_benchmark.py::test_midas_resize_sizes",
    "test_benchmark.py::test_perlin_determinism_and_range",
    "test_renderer_mesh.py::test_mesh_identity_view_reproduces_image",
    "test_lpips_convert.py::test_lpips_convert_accepts_lins_dot_keys",
    # host IO / 3D / mturk / logging / ingestion
    "test_utils_io.py::test_raw_float32_round_trip",
    "test_utils_io.py::test_colmap_model_round_trip",
    "test_utils_io.py::test_async_image_writer",
    "test_mturk.py::test_frame_sampler",
    "test_misc_utils.py::test_run_logger_jsonl",
    "test_ingest.py::test_released_table_matches_baseline",
}


def pytest_collection_modifyitems(items):
    for item in items:
        base = f"{os.path.basename(item.fspath)}::{item.originalname}"
        if base in _SMOKE:
            item.add_marker(pytest.mark.smoke)


@pytest.fixture
def rng():
    return np.random.default_rng(0)
