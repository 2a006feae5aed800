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


RGBD_YAML = """\
Camera:
  name: "synthetic rgbd"
  setup: "RGBD"
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
  focal_x_baseline: {fxb}
  depth_threshold: 40.0

Preprocessing:
  min_size: 400
  depthmap_factor: 5000.0

Feature:
  num_levels: 4

Initializer:
  use_fixed_seed: true
"""


@pytest.mark.slow
def test_run_slam_rgbd_tum_layout(tmp_path):
    """TUM RGB-D parity (VERDICT r4 task 5): depth PNGs in RAW 5000:1 units
    (Preprocessing.depthmap_factor, reference system.cc:86-92 +
    image_converter.cc:41-43), depth paired by nearest TIMESTAMP with one
    depth frame missing and the streams offset by 4 ms — index pairing
    would mis-pair every frame after the drop."""
    from stella_vslam_tpu.run_slam import main

    world = PlaneWorld()
    poses = lateral_trajectory(15, step=0.03)
    rgb_dir = tmp_path / "rgb"
    depth_dir = tmp_path / "depth"
    rgb_dir.mkdir()
    depth_dir.mkdir()
    depth_raw = np.round(world.depth * 5000.0).astype(np.uint16)
    t0 = 1305031452.0  # TUM-era epoch timestamps
    for i, T in enumerate(poses):
        ts = t0 + i * 0.05
        cv2.imwrite(str(rgb_dir / f"{ts:.6f}.png"), world.render(T))
        if i == 7:
            continue  # dropped depth frame
        dmap = np.full((world.H, world.W), depth_raw, np.uint16)
        # depth stream offset 4 ms from rgb (streams are not frame-aligned)
        cv2.imwrite(str(depth_dir / f"{ts + 0.004:.6f}.png"), dmap)
    cfg_path = tmp_path / "rgbd.yaml"
    cfg_path.write_text(RGBD_YAML.format(
        fx=world.fx, fy=world.fy, cx=world.cx, cy=world.cy,
        cols=world.W, rows=world.H, fxb=world.fx * 0.12,
    ))
    log_dir = tmp_path / "log"
    rc = main([
        "--config", str(cfg_path), "--images", str(rgb_dir),
        "--depth-dir", str(depth_dir),
        "--eval-log-dir", str(log_dir), "--inline-mapping",
    ])
    assert rc == 0 or rc is None
    traj = (log_dir / "frame_trajectory.txt").read_text().strip().splitlines()
    # 15 rgb frames, 1 skipped for missing depth, nearly all tracked with
    # depths scaled back to meters (instant stereo-style RGBD init)
    assert len(traj) >= 11, f"only {len(traj)} frames tracked"
    times = (log_dir / "track_times.txt").read_text().strip().splitlines()
    assert len(times) == 14  # the dropped-depth frame was skipped, not fed
