"""Real-TUM-magnitude timestamps (VERDICT r3 weak #4).

A TUM epoch stamp (~1.311e9 s) cannot live in a device f32 (resolution
~128 s at that magnitude); the framework stores device stamps as f32
OFFSETS from a host-side f64 epoch (`Tracker.ts_epoch`) and re-adds the
epoch on export, matching the reference's double-precision timestamps
(`src/System.cc:753-787`, `src/KeyFrame.cc:100`).
"""

import numpy as np
import pytest

from orbslam_mapsave_tpu import config as config_mod
from orbslam_mapsave_tpu.io import synthetic, trajectory
from orbslam_mapsave_tpu.pipeline import system as system_mod

W, H = 320, 240
FX = 200.0
EPOCH = 1311868164.363  # TUM fr1 magnitude


def make_system():
    cfg = config_mod.SystemConfig()
    cfg.camera = config_mod.CameraConfig(
        fx=FX, fy=FX, cx=W / 2, cy=H / 2, width=W, height=H,
        bf=FX * 0.08, th_depth=50.0, fps=30,
    )
    cfg.orb = config_mod.ORBConfig(n_features=600, n_levels=4,
                                   scale_factor=1.5)
    cfg.max_keypoints = 768
    cfg.max_keyframes = 32
    cfg.max_points = 8192
    return system_mod.SLAMSystem(cfg, system_mod.Sensor.RGBD,
                                 enable_loop_closing=False)


@pytest.mark.slow
def test_tum_magnitude_timestamps(tmp_path):
    K = np.array([[FX, 0, W / 2], [0, FX, H / 2], [0, 0, 1.0]])
    n = 8
    poses = synthetic.orbit_trajectory(n, radius=0.4, yaw_range=0.4)
    room = synthetic.BoxRoom(half_size=2.0, seed=5)
    stamps = EPOCH + np.arange(n) / 30.0

    sys_ = make_system()
    for i in range(n):
        gray, depth = room.render(K, poses[i], W, H)
        sys_.track_rgbd(gray, depth, float(stamps[i]))
    sys_.tracker.flush()
    assert sys_.tracker.ts_epoch == float(stamps[0])
    assert sys_.n_keyframes >= 1

    # device-side stamps are SMALL offsets (f32-exact at this scale)
    valid = np.asarray(sys_.map.kf_valid)
    off = np.asarray(sys_.map.kf_timestamp)[valid]
    assert np.all(np.abs(off) < 10.0)

    # exported keyframe stamps reproduce the absolute f64 stamps
    abs_ts = off.astype(np.float64) + sys_.tracker.ts_epoch
    err = np.min(np.abs(abs_ts[:, None] - stamps[None, :]), axis=1)
    assert np.max(err) < 1e-4, f"stamp error {np.max(err)}"

    # ATE association against absolute ground-truth stamps still works —
    # this is exactly what f32 absolute stamps broke (quantized to ~128 s,
    # the 0.02 s window matched nothing). Evaluated over the per-frame
    # trajectory (keyframes may number <3 on this short clip).
    tr = sys_.tracker.trajectory
    tr_ts = np.asarray([t for t, _, _ in tr])
    assert np.allclose(tr_ts, stamps, atol=1e-9)
    est_fr = np.asarray([np.linalg.inv(T) for t, T, lost in tr if not lost])
    ts_fr = np.asarray([t for t, _, lost in tr if not lost])
    ate = trajectory.ate_rmse(stamps, poses, ts_fr, est_fr)
    assert np.isfinite(ate), "timestamp association failed"
    assert ate < 0.05

    # epoch survives a save/load roundtrip
    from orbslam_mapsave_tpu.io import mapio

    p = tmp_path / "m.bin"
    sys_.save_map(p)
    assert mapio.read_ts_epoch(p) == sys_.tracker.ts_epoch
    sys2 = make_system()
    sys2.load_map(p)
    assert sys2.tracker.ts_epoch == sys_.tracker.ts_epoch

    # keyframe trajectory file round-trips through the TUM writer
    f = tmp_path / "kf.txt"
    sys_.save_keyframe_trajectory(f)
    ts_r, _ = trajectory.load_tum_trajectory(f)
    # writer divides by t_div=1e3 (reference parity); undo for comparison
    err = np.min(np.abs(ts_r * 1e3 - stamps[None, :].T), axis=0)
    assert np.max(err) < 0.01
