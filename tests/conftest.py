"""Test configuration: run everything on a virtual 8-device CPU mesh.

Multi-chip TPU hardware is not available in CI; sharding logic is validated on
8 virtual CPU devices (the driver separately dry-runs the multi-chip path).

The session environment registers a tunneled TPU backend (axon) in every
interpreter via sitecustomize and pins JAX_PLATFORMS=axon; unit tests must NOT
run over that tunnel (remote compiles make each jit take ~minutes), so we
force the platform back to CPU in-process before any backend initialises.
"""
import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)


# ---------------------------------------------------------------------------
# Test tiers: `pytest -m quick` is the fast gate (< 2 min on one CPU core);
# everything else is the heavy parity/integration tier (`-m slow`). Tiering
# is by module: the slow set is every module that builds a full foundation
# model, runs torch twins, or shells out to CLIs.
# ---------------------------------------------------------------------------
import pytest  # noqa: E402

_SLOW_MODULES = {
    "test_attention",          # pallas interpret-mode kernels
    "test_bert",
    "test_cli_conformance",    # ~25 subprocess --help runs (jax import each)
    "test_cli_slice",
    "test_cli_video_slice",
    "test_e2e_accuracy",       # full CLI chain against analytic GT (~3 min)
    "test_clip",
    "test_convert_fixtures",
    "test_cotracker",
    "test_cotracker2",
    "test_dinov2",
    "test_eval_parity",
    "test_fine_cache",
    "test_grounding_dino",
    "test_grounding_dino_parity",
    "test_multi_object",
    "test_multiprocess_scheduler",
    "test_online_estimator",
    "test_sam2_automatic",
    "test_sam2_hiera",
    "test_sam2_image",
    "test_sam2_memory",
    "test_sam2_predictor",
    "test_sam2_sharded",
    "test_sam2_stride",
    "test_sam2_video",
    "test_swin",
    "test_tracking_refiner",
    "test_zoedepth",
    # demoted by measured duration (the quick tier must stay < 2 min):
    "test_knn_sampling",
    "test_pose_estimator",
    "test_rasterizer",
    "test_scale_estimator",
    "test_video_loader",
    "test_zoom_renders",
}


def pytest_collection_modifyitems(config, items):
    for item in items:
        module = item.fspath.purebasename
        if module in _SLOW_MODULES:
            item.add_marker(pytest.mark.slow)
        else:
            item.add_marker(pytest.mark.quick)
