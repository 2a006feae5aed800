"""CLI runner tests: run_synthetic and run_slam (reference example-binary
equivalents), including reference-format YAML config parsing."""
import os

import cv2
import numpy as np
import pytest

from stella_vslam_tpu.util.synthetic import PlaneWorld, lateral_trajectory

REF_STYLE_YAML = """\
# reference-style config (mirrors example/euroc layout)
Camera:
  name: "synthetic"
  setup: "monocular"
  model: "perspective"
  fx: {fx}
  fy: {fy}
  cx: {cx}
  cy: {cy}
  k1: 0.0
  k2: 0.0
  p1: 0.0
  p2: 0.0
  k3: 0.0
  fps: 20.0
  cols: {cols}
  rows: {rows}
  color_order: "Gray"

Preprocessing:
  min_size: 400

Feature:
  name: "default ORB feature extraction setting"
  scale_factor: 1.2
  num_levels: 4
  ini_fast_threshold: 20
  min_fast_threshold: 7

Initializer:
  use_fixed_seed: true
"""


@pytest.mark.slow
def test_run_slam_image_dir(tmp_path):
    from stella_vslam_tpu.run_slam import main

    world = PlaneWorld()
    poses = lateral_trajectory(25)
    img_dir = tmp_path / "imgs"
    img_dir.mkdir()
    for i, T in enumerate(poses):
        cv2.imwrite(str(img_dir / f"{i:06d}.png"),
                    world.render(T).astype(np.uint8))
    cfg_path = tmp_path / "cfg.yaml"
    cfg_path.write_text(REF_STYLE_YAML.format(
        fx=world.fx, fy=world.fy, cx=world.cx, cy=world.cy,
        cols=world.W, rows=world.H,
    ))
    log_dir = tmp_path / "log"
    rc = main([
        "--config", str(cfg_path), "--images", str(img_dir),
        "--eval-log-dir", str(log_dir), "--inline-mapping",
        "--map-db-out", str(tmp_path / "map.msg"),
    ])
    assert rc == 0
    traj = (log_dir / "frame_trajectory.txt").read_text().strip().splitlines()
    assert len(traj) >= 10 and len(traj[0].split()) == 8  # TUM format
    times = (log_dir / "track_times.txt").read_text().strip().splitlines()
    assert len(times) == 25
    assert (tmp_path / "map.msg").exists()
    assert (log_dir / "keyframe_trajectory.txt").exists()


@pytest.mark.slow
def test_run_synthetic_cli(tmp_path, capsys):
    from stella_vslam_tpu.run_synthetic import main

    rc = main([
        "--frames", "30", "--width", "400", "--height", "300",
        "--levels", "4", "--step", "0.02", "--inline-mapping", "--json",
        "--eval-log-dir", str(tmp_path / "log"),
    ])
    assert rc == 0
    import json

    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["tracked"] >= 15
    assert out["ate_rmse_m"] < 0.1
    assert (tmp_path / "log" / "frame_trajectory.txt").exists()
