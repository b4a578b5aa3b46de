"""End-to-end monocular SLAM on a synthetic sequence — the M4 milestone gate:
H/F bootstrap initialization, tracking, triangulation-driven mapping; ATE
evaluated with Sim3 alignment (monocular scale is free)."""

import numpy as np
import pytest

from orbslam_mapsave_tpu import config as config_mod
from orbslam_mapsave_tpu.io import dataset, synthetic, trajectory
from orbslam_mapsave_tpu.pipeline import system as system_mod

W, H = 320, 240
FX = 200.0


@pytest.fixture(scope="module")
def mono_seq(tmp_path_factory):
    out = tmp_path_factory.mktemp("mono_seq")
    K = np.array([[FX, 0, W / 2], [0, FX, H / 2], [0, 0, 1.0]])
    # strong lateral translation for a well-conditioned two-view bootstrap
    poses = np.zeros((14, 4, 4))
    for i in range(14):
        poses[i] = np.eye(4)
        poses[i][0, 3] = 0.08 * i  # 8 cm / frame sideways
        poses[i][2, 3] = -0.01 * i
    synthetic.write_tum_sequence(out, K, poses, width=W, height=H, seed=9,
                                 depth_factor=5000.0)
    return {"root": out, "K": K, "poses": poses}


@pytest.mark.slow
def test_mono_slam_end_to_end(mono_seq):
    cfg = config_mod.SystemConfig()
    cfg.camera = config_mod.CameraConfig(
        fx=FX, fy=FX, cx=W / 2, cy=H / 2, width=W, height=H,
        bf=0.0, fps=30,
    )
    cfg.orb = config_mod.ORBConfig(n_features=600, n_levels=4, scale_factor=1.5)
    cfg.max_keypoints = 768
    cfg.max_keyframes = 32
    cfg.max_points = 8192
    slam = system_mod.SLAMSystem(cfg, system_mod.Sensor.MONOCULAR,
                                 enable_loop_closing=False)
    ds = dataset.TUMDataset(mono_seq["root"], depth_factor=5000.0)
    n_ok = 0
    for t, gray, _ in ds:
        pose = slam.track_monocular(gray, t)
        n_ok += pose is not None
    assert slam.n_keyframes >= 2
    assert slam.n_points > 80
    assert n_ok >= 6, f"only {n_ok} tracked frames"

    gt_ts = 1000.0 + np.arange(len(mono_seq["poses"])) / 30.0
    est_ts, est_poses = [], []
    for (t, Tcw, lost) in slam.tracker.trajectory:
        if not lost:
            est_ts.append(t)
            est_poses.append(np.linalg.inv(Tcw))
    ate = trajectory.ate_rmse(
        gt_ts, mono_seq["poses"], np.asarray(est_ts), np.asarray(est_poses),
        with_scale=True,  # monocular: align in Sim3
    )
    assert ate < 0.06, f"mono ATE {ate:.4f} m"
