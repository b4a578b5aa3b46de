"""End-to-end RGB-D SLAM on a synthetic sequence with exact ground truth —
the M2 milestone gate (SURVEY.md §7.2): odometry + mapping + local BA produce
a trajectory whose ATE is small."""

import numpy as np
import pytest

from orbslam_mapsave_tpu import config as config_mod
from orbslam_mapsave_tpu.io import dataset, synthetic, trajectory
from orbslam_mapsave_tpu.pipeline import system as system_mod

W, H = 320, 240
FX = 200.0


@pytest.fixture(scope="module")
def small_seq(tmp_path_factory):
    out = tmp_path_factory.mktemp("rgbd_seq")
    K = np.array([[FX, 0, W / 2], [0, FX, H / 2], [0, 0, 1.0]])
    poses = synthetic.orbit_trajectory(10, radius=0.4, yaw_range=0.4)
    synthetic.write_tum_sequence(out, K, poses, width=W, height=H, seed=5,
                                 depth_factor=5000.0)
    return {"root": out, "K": K, "poses": poses}


def make_system(n_features=600, enable_mapping=True):
    cfg = config_mod.SystemConfig()
    cfg.camera = config_mod.CameraConfig(
        fx=FX, fy=FX, cx=W / 2, cy=H / 2, width=W, height=H,
        bf=FX * 0.08, th_depth=50.0, depth_map_factor=5000.0, fps=30,
    )
    cfg.orb = config_mod.ORBConfig(n_features=n_features, n_levels=4,
                                   scale_factor=1.5)
    cfg.max_keypoints = 768
    cfg.max_keyframes = 32
    cfg.max_points = 8192
    return system_mod.SLAMSystem(
        cfg, system_mod.Sensor.RGBD, enable_loop_closing=False,
        enable_mapping=enable_mapping,
    )


def run_sequence(sys_, root):
    ds = dataset.TUMDataset(root, depth_factor=5000.0)
    poses = []
    for t, gray, depth in ds:
        pose = sys_.track_rgbd(gray, depth, t)
        poses.append(pose)
    return poses


@pytest.mark.slow
def test_rgbd_slam_end_to_end(small_seq):
    sys_ = make_system()
    poses = run_sequence(sys_, small_seq["root"])
    # tracking must never be lost on this easy sequence
    n_ok = sum(p is not None for p in poses)
    assert n_ok == len(poses), f"lost tracking: {n_ok}/{len(poses)}"
    assert sys_.n_keyframes >= 1
    assert sys_.n_points > 200

    # ATE vs exact ground truth
    gt_ts = 1000.0 + np.arange(len(small_seq["poses"])) / 30.0
    est_ts, est_poses = [], []
    for (t, Tcw, lost) in sys_.tracker.trajectory:
        if not lost:
            est_ts.append(t)
            est_poses.append(np.linalg.inv(Tcw))
    ate = trajectory.ate_rmse(gt_ts, small_seq["poses"], np.asarray(est_ts),
                              np.asarray(est_poses))
    assert ate < 0.05, f"ATE {ate:.4f} m"


@pytest.mark.slow
def test_map_save_load_roundtrip(small_seq, tmp_path):
    from orbslam_mapsave_tpu.io import mapio

    sys_ = make_system()
    run_sequence(sys_, small_seq["root"])
    p = tmp_path / "map.bin"
    sys_.save_map(p)
    st2 = mapio.load_map(p)
    s1 = mapio.map_summary(sys_.map)
    s2 = mapio.map_summary(st2)
    assert s1 == s2
    np.testing.assert_array_equal(
        np.asarray(sys_.map.kf_pose), np.asarray(st2.kf_pose)
    )
    np.testing.assert_array_equal(
        np.asarray(sys_.map.pt_desc), np.asarray(st2.pt_desc)
    )
    # byte-stable re-save (SURVEY.md §4.3 serialization parity gate)
    p2 = tmp_path / "map2.bin"
    mapio.save_map(p2, st2)
    st3 = mapio.load_map(p2)
    np.testing.assert_array_equal(
        np.asarray(st3.pt_pos), np.asarray(st2.pt_pos)
    )
