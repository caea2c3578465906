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
