"""Config surface: the reference's own EuRoC YAML must construct a System
with every live key applied, every deliberately-collapsed key reported as
such (g2o backend selectors, viewer sections), and unknown keys explicitly
flagged — no silent collapse (reference example/euroc/EuRoC_mono.yaml;
config.cc keeps the raw node and ignores unknowns silently, this framework
reports them)."""
import logging

import pytest

from stella_vslam_tpu.config import Config
from stella_vslam_tpu.system import System

EUROC_MONO = "/root/reference/example/euroc/EuRoC_mono.yaml"


@pytest.fixture(scope="module")
def euroc_system():
    cfg = Config.from_yaml_file(EUROC_MONO)
    return System(cfg, inline_mapping=True), cfg


def test_live_keys_applied(euroc_system):
    sys_, cfg = euroc_system
    # Mapping section values flow into the mapper and cleaner
    assert sys_.mapper.num_covis_tri == 20
    assert sys_.mapper.num_covis_fuse == 20
    assert sys_.mapper.baseline_dist_thr_ratio == pytest.approx(0.02)
    assert sys_.mapper.cleaner.redundant_obs_ratio_thr == pytest.approx(0.9)
    # Camera section
    assert sys_.camera.params.fx == pytest.approx(458.654)
    rep = cfg.collapse_report()
    live = set(rep["live"])
    for key in ("Camera.fx", "Feature.num_levels",
                "Mapping.redundant_obs_ratio_thr",
                "Mapping.num_covisibilities_for_landmark_generation"):
        assert key in live, f"{key} not recorded as live: {sorted(live)}"


def test_collapsed_keys_reported(euroc_system):
    _, cfg = euroc_system
    rep = cfg.collapse_report()
    collapsed = "\n".join(rep["collapsed"])
    for key in ("Mapping.backend", "Tracking.backend", "LoopDetector.backend",
                "KeyframeInserter.wait_for_local_bundle_adjustment",
                "Relocalizer.search_neighbor"):
        assert key in collapsed, f"{key} not reported as collapsed:\n{collapsed}"
    # collapsed keys never leak into the ignored (unknown) list
    assert not any("backend" in e for e in rep["ignored"])


def test_unknown_key_warns(caplog):
    cfg = Config.from_dict({
        "Camera": {"model": "perspective", "setup": "monocular",
                   "fx": 400.0, "fy": 400.0, "cx": 320.0, "cy": 240.0,
                   "cols": 640, "rows": 480},
        "Feature": {"num_levels": 4},
        "Tracking": {"no_such_knob": 42},
    })
    with caplog.at_level(logging.WARNING, logger="stella_vslam_tpu.config"):
        System(cfg, inline_mapping=True)
    assert any("no_such_knob" in r.message for r in caplog.records), \
        [r.message for r in caplog.records]


def test_keyframe_inserter_yaml():
    from stella_vslam_tpu.module.keyframe_inserter import KeyframeInserter

    class _Cam:
        pass

    ins = KeyframeInserter.from_yaml(_Cam(), {
        "max_interval": 2.5, "min_interval": 0.2, "enough_lms_thr": 250,
        "lms_ratio_thr_view_changed": 0.6,
    })
    assert ins.max_interval == 2.5
    assert ins.min_interval == 0.2
    assert ins.enough_lms_thr == 250
    assert ins.ratio_view_changed == 0.6
    assert ins.ratio_almost_all == 0.9  # default preserved
