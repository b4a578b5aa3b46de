"""Stereo modality: `Frame::ComputeStereoMatches` parity
(`/root/reference/src/Frame.cc:584-756`) and end-to-end stereo SLAM
(`System::TrackStereo`, `src/System.cc:261-334`)."""

import numpy as np
import pytest

from orbslam_mapsave_tpu import config as config_mod
from orbslam_mapsave_tpu.geometry import projection
from orbslam_mapsave_tpu.io import synthetic
from orbslam_mapsave_tpu.ops import orb
from orbslam_mapsave_tpu.pipeline import frame as frame_mod
from orbslam_mapsave_tpu.pipeline import system as system_mod

W, H = 320, 240
FX = 200.0
BASELINE = 0.12  # meters


def _translate_x(Twc: np.ndarray, dx: float) -> np.ndarray:
    """Camera pose shifted by dx along its own x axis (stereo rig)."""
    out = Twc.copy()
    out[:3, 3] = Twc[:3, 3] + Twc[:3, :3] @ np.array([dx, 0, 0])
    return out


@pytest.fixture(scope="module")
def stereo_pair():
    K = np.array([[FX, 0, W / 2], [0, FX, H / 2], [0, 0, 1.0]])
    room = synthetic.BoxRoom(half_size=2.0, seed=7)
    Twc = np.eye(4)
    gl, dl = room.render(K, Twc, W, H)
    gr, _ = room.render(K, _translate_x(Twc, BASELINE), W, H)
    return {"K": K, "left": gl, "right": gr, "depth_left": dl}


def test_stereo_matches_recover_depth(stereo_pair):
    cam = projection.Camera.create(FX, FX, W / 2, H / 2,
                                   bf=FX * BASELINE, width=W, height=H)
    spec = orb.ORBSpec.create(H, W, n_features=600, n_levels=4,
                              scale_factor=1.5, max_kp=768)
    builder = frame_mod.FrameBuilder(cam, spec)
    fr = builder.build_stereo(stereo_pair["left"], stereo_pair["right"], 0.0)

    xy = np.asarray(fr.kp_xy_raw)
    depth = np.asarray(fr.kp_depth)
    valid = np.asarray(fr.valid)
    has = valid & (depth > 0)
    # a solid fraction of keypoints must get a stereo match
    assert has.sum() >= 0.4 * valid.sum(), (
        f"only {has.sum()}/{valid.sum()} keypoints matched"
    )
    xi = np.clip(np.round(xy[has, 0]).astype(int), 0, W - 1)
    yi = np.clip(np.round(xy[has, 1]).astype(int), 0, H - 1)
    gt = stereo_pair["depth_left"][yi, xi]
    rel = np.abs(depth[has] - gt) / np.maximum(gt, 1e-6)
    # sub-pixel disparity: median depth error well under 2%
    assert np.median(rel) < 0.02, f"median rel depth err {np.median(rel):.3f}"
    # and few catastrophic outliers survive the median SAD trim
    assert np.mean(rel > 0.1) < 0.1

    # uRight consistency: ur = u - bf/z
    ur = np.asarray(fr.kp_ur)[has]
    disp = xy[has, 0] - ur
    np.testing.assert_allclose(float(cam.bf) / disp, depth[has], rtol=1e-5)


@pytest.mark.slow
def test_stereo_slam_end_to_end(tmp_path):
    K = np.array([[FX, 0, W / 2], [0, FX, H / 2], [0, 0, 1.0]])
    room = synthetic.BoxRoom(half_size=2.0, seed=7)
    poses = synthetic.orbit_trajectory(8, radius=0.4, yaw_range=0.4)

    cfg = config_mod.SystemConfig()
    cfg.camera = config_mod.CameraConfig(
        fx=FX, fy=FX, cx=W / 2, cy=H / 2, width=W, height=H,
        bf=FX * BASELINE, th_depth=35.0, fps=30,
    )
    cfg.orb = config_mod.ORBConfig(n_features=600, n_levels=4,
                                   scale_factor=1.5)
    cfg.max_keypoints = 768
    cfg.max_keyframes = 32
    cfg.max_points = 8192
    sys_ = system_mod.SLAMSystem(cfg, system_mod.Sensor.STEREO,
                                 enable_loop_closing=False)
    for i, Twc in enumerate(poses):
        gl, _ = room.render(K, Twc, W, H)
        gr, _ = room.render(K, _translate_x(Twc, BASELINE), W, H)
        sys_.track_stereo(gl, gr, i / 30.0)
    sys_.tracker.flush()
    traj = sys_.tracker.trajectory
    lost = sum(1 for (_, _, l) in traj if l)
    assert lost == 0, f"lost {lost}/{len(traj)} frames"
    assert sys_.n_keyframes >= 1
    assert sys_.n_points > 200

    # ATE against ground truth (SE3-aligned, same gate as the RGB-D test)
    from orbslam_mapsave_tpu.io import trajectory

    gt_ts = np.arange(len(poses)) / 30.0
    est_ts = np.array([t for (t, _, l) in traj if not l])
    est = np.array([np.linalg.inv(p) for (_, p, l) in traj if not l])
    ate = trajectory.ate_rmse(gt_ts, poses, est_ts, est)
    assert ate < 0.05, f"stereo ATE {ate:.4f} m"
