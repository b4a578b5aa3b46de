"""Capacity pressure: slot recycling must keep long runs alive
(VERDICT r1 weak #10). Small caps force the point/keyframe compaction
path to trigger repeatedly during a live run."""

import numpy as np
import pytest

from orbslam_mapsave_tpu import config as config_mod
from orbslam_mapsave_tpu.io import dataset, synthetic
from orbslam_mapsave_tpu.pipeline import system as system_mod

W, H = 320, 240
FX = 200.0
N = 100


@pytest.fixture(scope="module")
def seq(tmp_path_factory):
    out = tmp_path_factory.mktemp("cap_seq")
    K = np.array([[FX, 0, W / 2], [0, FX, H / 2], [0, 0, 1.0]])
    poses = synthetic.circle_trajectory(N, radius=0.5, revs=0.7)
    synthetic.write_tum_sequence(out, K, poses, width=W, height=H, seed=3)
    return out


@pytest.mark.slow
def test_capacity_pressure_recycles_slots(seq):
    cfg = config_mod.SystemConfig()
    cfg.camera = config_mod.CameraConfig(
        fx=FX, fy=FX, cx=W / 2, cy=H / 2, width=W, height=H,
        bf=FX * 0.08, th_depth=50.0, depth_map_factor=5000.0, fps=30,
    )
    cfg.orb = config_mod.ORBConfig(n_features=400, n_levels=4,
                                   scale_factor=1.5)
    cfg.max_keypoints = 512
    cfg.max_keyframes = 16   # tight: forces keyframe compaction
    cfg.max_points = 2048    # tight: ~2 keyframes' worth of fresh points
    sys_ = system_mod.SLAMSystem(cfg, system_mod.Sensor.RGBD,
                                 enable_loop_closing=False)
    n_ok = 0
    for t, gray, depth in dataset.TUMDataset(seq, depth_factor=5000.0):
        pose = sys_.track_rgbd(gray, depth, t)
        n_ok += pose is not None
    sys_.tracker.flush()
    # the allocators must have been recycled (watermarks below hard caps)
    assert int(sys_.map.n_pt) <= cfg.max_points
    assert int(sys_.map.n_kf) <= cfg.max_keyframes
    # and tracking survived the pressure
    assert n_ok >= 0.85 * N, f"tracking lost under capacity pressure: {n_ok}/{N}"
    # valid sets are dense prefixes after compaction
    pv = np.asarray(sys_.map.pt_valid)
    n_pt = int(sys_.map.n_pt)
    assert not pv[n_pt:].any()
