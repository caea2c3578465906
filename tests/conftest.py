"""Test harness: force an 8-virtual-device CPU platform.

Tests never touch the real TPU (the axon tunnel serves ONE chip and one
process at a time — a test suite grabbing it would starve training/bench
runs). The environment's sitecustomize force-registers the axon platform, so
the platform override must happen via jax.config before first backend use,
and XLA_FLAGS before jax import. 8 virtual CPU devices let the
data-parallel mesh tests exercise real sharding + collectives
(SURVEY.md §4's implication: multi-replica tests without hardware).
"""

import os

os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=8")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import pytest  # noqa: E402

REFERENCE_KEYPOINTS = "/root/reference/keypoints"


@pytest.fixture(scope="session")
def ref_keypoints_dir():
    if not os.path.isdir(REFERENCE_KEYPOINTS):
        pytest.skip("reference keypoints not available")
    return REFERENCE_KEYPOINTS


@pytest.fixture()
def tiny_opt():
    from neural_human_video_rendering_tpu.config import Options
    return Options(loadSize=32, tex_tile=16, batchSize=2,
                   n_blocks_translate=1, n_downsample_translate=2,
                   n_blocks_global=1, n_downsample_global=1,
                   n_blocks_bg=1, n_downsample_bg=1,
                   ngf=4, ngf_global=4, ndf=4, num_D=2, n_layers_D=2,
                   dtype="float32", use_pallas_warp=False, no_flip=True,
                   checkpoints_dir="/tmp/nhvr_tests")


# ----------------------------------------------------------------------
# fast / slow tiers (VERDICT r2 weak #5)
#
# `pytest -m "not slow"` is the reviewable fast signal; the list below
# adds the slow marker to every test measured >= ~30 s on a 1-core box
# (round-3 per-test timing; they are all full-train-step XLA compiles —
# the step itself compiles in tens of seconds per distinct config).
# Centralized here so the data-driven list is maintained in one place;
# a handful of structurally-slow tests also carry inline marks.
# ----------------------------------------------------------------------

_SLOW_TESTS = {
    "test_checkpoint.py::test_load_pretrain_warm_start",
    "test_crop_mode.py::test_train_step_with_crop_bg",
    "test_e2e_pipeline.py::test_full_pipeline",
    # EMA: the fast tier keeps test_ema_blend_math_unit (pure math, ms);
    # all three integration tests compile full GAN steps (round-5 trim —
    # the update-math one alone measured ~190 s contended / ~70 s solo)
    "test_ema.py::test_ema_off_by_default",
    "test_ema.py::test_ema_checkpoint_roundtrip_and_inference_preference",
    "test_ema.py::test_ema_update_math",
    # round-5 fast-tier trim: each of these compiles a distinct full-step
    # or full-renderer graph; a cheaper sibling stays in the fast tier
    # (ms_uv: test_aux_shapes_and_scale_ladder; resume: the prune/dedup
    # units + test_pretrain_tex_driver; infer: writes_frames_and_gallery;
    # feat-encoder: test_feat_encoder_shapes; LPIPS: identity/per-sample;
    # local enhancer: shapes_and_structure)
    "test_metrics_dedup.py::test_train_resume_has_unique_epochs",
    "test_ms_uv.py::test_train_step_with_ms_uv",
    "test_ms_uv.py::test_aux_loss_reaches_trunk_params",
    "test_ms_uv.py::test_pretrain_step_with_ms_uv",
    "test_infer.py::test_pose_image_driving_uses_training_geometry",
    "test_feat_encoder.py::test_renderer_without_flag_has_no_encoder",
    "test_lpips.py::test_evaluate_cli_metric_lpips",
    "test_local_enhancer.py::test_local_enhancer_two_levels",
    "test_export_serving.py::test_export_params_as_arguments",
    "test_export_serving.py::test_export_roundtrip_baked_weights",
    "test_feat_encoder.py::test_train_step_trains_encoder",
    "test_feat_encoder.py::test_renderer_instance_feat_params_and_modes",
    "test_flip.py::test_flip_supplies_bg_flip_flag_and_renderer_mirrors",
    "test_image_pool.py::test_train_step_with_pool",
    "test_local_enhancer.py::test_netg_local_full_train_step",
    "test_losses.py::test_train_step_no_lsgan",
    "test_lr_schedule.py::test_stage2_state_gets_the_schedule",
    "test_pallas_warp.py::test_bf16_gradients_close_to_f32",
    "test_pallas_warp.py::test_bf16_even_channel_gradients_close_to_f32",
    "test_pallas_warp.py::test_small_tile_pad_is_bit_exact",
    "test_parallel.py::test_data_parallel_train_step",
    "test_parallel.py::test_run_train_engages_mesh",
    "test_parallel.py::test_run_train_single_device_when_indivisible",
    "test_train_step.py::test_vgg_loss_in_train_step",
    "test_train_step.py::test_temporal_prev_real_mode",
    "test_train_step.py::test_symmetric_temporal_gradient_mode",
    "test_train_step.py::test_full_train_step_runs_and_updates",
    "test_train_step.py::test_train_step_loss_decreases",
    "test_train_step.py::test_train_step_uv_refine_and_limb_coords",
    "test_wire.py::test_train_step_equivalent_packed_vs_raw",
}


def pytest_collection_modifyitems(config, items):
    import os as _os
    for item in items:
        key = f"{_os.path.basename(str(item.fspath))}::{item.name.split('[')[0]}"
        if key in _SLOW_TESTS:
            item.add_marker(pytest.mark.slow)
