"""Reuse-mode (map save -> load -> relocalize -> localization-only
tracking) — the fork's signature feature end-to-end
(`System.cc:148-195`, `Tracking.cc:167-171`)."""

import numpy as np
import pytest

from orbslam_mapsave_tpu import config as config_mod
from orbslam_mapsave_tpu.io import dataset, synthetic
from orbslam_mapsave_tpu.pipeline import system as system_mod
from orbslam_mapsave_tpu.pipeline import tracking as trk_mod

W, H = 320, 240
FX = 200.0
N = 14


@pytest.fixture(scope="module")
def seq(tmp_path_factory):
    out = tmp_path_factory.mktemp("reuse_seq")
    K = np.array([[FX, 0, W / 2], [0, FX, H / 2], [0, 0, 1.0]])
    poses = synthetic.orbit_trajectory(N, radius=0.4, yaw_range=0.4)
    synthetic.write_tum_sequence(out, K, poses, width=W, height=H, seed=5)
    return out


def make_system(reuse=None):
    cfg = config_mod.SystemConfig()
    cfg.camera = config_mod.CameraConfig(
        fx=FX, fy=FX, cx=W / 2, cy=H / 2, width=W, height=H,
        bf=FX * 0.08, th_depth=50.0, depth_map_factor=5000.0, fps=30,
    )
    cfg.orb = config_mod.ORBConfig(n_features=600, n_levels=4,
                                   scale_factor=1.5)
    cfg.max_keypoints = 768
    cfg.max_keyframes = 32
    cfg.max_points = 8192
    return system_mod.SLAMSystem(
        cfg, system_mod.Sensor.RGBD, enable_loop_closing=False,
        reuse_map_path=reuse,
    )


@pytest.mark.slow
def test_reuse_mode_relocalizes_and_tracks(seq, tmp_path):
    sys_ = make_system()
    ds = dataset.TUMDataset(seq, depth_factor=5000.0)
    for t, gray, depth in ds:
        sys_.track_rgbd(gray, depth, t)
    p = tmp_path / "map.npz"
    sys_.save_map(p)
    assert sys_.n_points > 200

    sys2 = make_system(reuse=str(p))
    assert sys2.localization_only
    assert sys2.tracker.state == trk_mod.LOST
    ok = []
    for t, gray, depth in dataset.TUMDataset(seq, depth_factor=5000.0):
        pose = sys2.track_rgbd(gray, depth, t)
        ok.append(pose is not None)
    sys2.tracker.flush()
    # relocalized against the loaded map and stayed in localization mode
    assert sys2.tracker.state == trk_mod.OK
    traj = sys2.tracker.trajectory
    n_ok = sum(1 for (_, _, lost) in traj if not lost)
    assert n_ok >= N - 3, f"only {n_ok}/{N} frames localized"
    # localization-only: the map must not have grown
    assert sys2.n_keyframes == sys_.n_keyframes
    assert int(sys2.map.n_pt) == int(sys_.map.n_pt)
