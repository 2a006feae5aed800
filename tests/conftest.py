"""Test configuration: run all unit tests on a virtual 8-device CPU mesh.

Must set env vars BEFORE jax initializes its backends, so this lives at the top
of conftest (pytest imports conftest before test modules import jax).
"""
import os

os.environ["JAX_PLATFORMS"] = "cpu"  # force: the ambient env pins axon (TPU tunnel)
# no persistent compile cache under tests: XLA:CPU AOT artifacts record the
# COMPILE machine's feature flags and loading them on a different host warns
# of potential SIGILL; CPU compiles are cheap anyway
os.environ["SVT_JAX_CACHE"] = "0"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ.setdefault("JAX_ENABLE_X64", "0")
# warmup pre-compiles every device program variant at System.startup — wanted
# on the tunneled TPU runtime, pure overhead for the many tiny CPU test runs
os.environ.setdefault("SVT_WARMUP", "0")

import jax  # noqa: E402

# The baked axon sitecustomize calls jax.config.update("jax_platforms", "axon,cpu")
# at interpreter start, which overrides the env var — override it back.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_default_matmul_precision", "float32")


def pytest_addoption(parser):
    parser.addoption(
        "--slow", action="store_true", default=False,
        help="run tests marked slow (full-coverage profile)")


# highest-value slow tests PROMOTED into the default profile (VERDICT r4
# task 9): the day-to-day signal must include a loop closure, a metric-scale
# e2e, and the 512-keyframe global-BA ceiling — not only units + short e2e
PROMOTED_SLOW = {
    "test_loop_closure_end_to_end",        # full loop-closing path
    "test_stereo_slam_tracks_metric_scale",  # metric scale, no alignment
    "test_global_ba_convergence_512kf",    # map-scalability ceiling
}


def pytest_collection_modifyitems(config, items):
    """Default = fast profile: slow-marked tests are skipped unless --slow
    (or RUN_SLOW=1) is given — EXCEPT the PROMOTED_SLOW set above, which
    runs in every profile. The remaining slow profile carries the long e2e
    runs; CI/driver budgets need the default collection to finish in
    minutes on the 1-core CPU mesh."""
    if config.getoption("--slow") or os.environ.get("RUN_SLOW"):
        return
    import pytest as _pytest

    skip = _pytest.mark.skip(
        reason="slow profile: pass --slow (or RUN_SLOW=1)")
    for item in items:
        if "slow" in item.keywords and item.name not in PROMOTED_SLOW:
            item.add_marker(skip)


# ---------------------------------------------------------------------------
# Shared base map run: ONE inline SLAM pass over the default plane world,
# saved to msgpack. Session-scoped so test_slam_e2e / test_map_io /
# test_reloc_by_pose stop paying ~25 s of compile + feed each for
# near-identical fixtures (the reference test suite's shared fixture layer,
# test/CMakeLists.txt) — they consume the run, the saved artifact, or a
# freshly-loaded copy of it.
# ---------------------------------------------------------------------------
import numpy as np  # noqa: E402
import pytest  # noqa: E402

BASE_CFG = {
    "Camera": None,  # filled from the world
    "Feature": {"num_levels": 4},
    "Preprocessing": {"min_size": 400},
    "Initializer": {"use_fixed_seed": True},
}


@pytest.fixture(scope="session")
def base_map_run(tmp_path_factory):
    from stella_vslam_tpu.config import Config
    from stella_vslam_tpu.system import System
    from tests.synthetic_world import PlaneWorld, lateral_trajectory

    world = PlaneWorld()
    n = 40
    poses_gt = lateral_trajectory(n)
    cfg_dict = {k: (dict(v) if isinstance(v, dict) else v)
                for k, v in BASE_CFG.items()}
    cfg_dict["Camera"] = world.camera_yaml()
    slam = System(Config.from_dict(cfg_dict), inline_mapping=True)
    slam.startup()
    for i, T in enumerate(poses_gt):
        slam.feed_monocular_frame(world.render(T), i * 0.05)
    slam.shutdown()
    path = str(tmp_path_factory.mktemp("basemap") / "map.msgpack")
    slam.save_map_database(path, "msgpack")
    return world, poses_gt, slam, cfg_dict, path
