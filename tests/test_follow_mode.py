"""Streaming --follow input: a writer thread grows the directory WHILE the
system tracks from it (the live-sensor stand-in, VERDICT r4 missing #2;
reference anchor: the live mains `Examples/Monocular.cc:94-132`,
`Examples/RGBD.cpp:69-100`)."""

import shutil
import threading
import time

import numpy as np
import pytest

from orbslam_mapsave_tpu import config as config_mod
from orbslam_mapsave_tpu.io import dataset, synthetic, trajectory
from orbslam_mapsave_tpu.pipeline import system as system_mod

W, H = 320, 240
FX = 200.0
N_FRAMES = 24


@pytest.fixture(scope="module")
def rendered_seq(tmp_path_factory):
    """Pre-render a sequence to a STAGING dir; tests copy frames from it
    into the followed dir at their own pace."""
    out = tmp_path_factory.mktemp("follow_staging")
    K = np.array([[FX, 0, W / 2], [0, FX, H / 2], [0, 0, 1.0]])
    poses = synthetic.orbit_trajectory(N_FRAMES, radius=0.4, yaw_range=0.5)
    synthetic.write_tum_sequence(out, K, poses, width=W, height=H, seed=5,
                                 depth_factor=5000.0)
    return {"root": out, "poses": poses}


def make_system():
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
    )


def test_follow_growing_directory(rendered_seq, tmp_path):
    src = rendered_seq["root"]
    live = tmp_path / "live"
    (live / "rgb").mkdir(parents=True)
    (live / "depth").mkdir()
    rgb_files = sorted((src / "rgb").iterdir())
    depth_files = sorted((src / "depth").iterdir())

    def writer():
        for r, d in zip(rgb_files, depth_files):
            # depth FIRST: FollowSource only counts an rgb frame whose
            # depth twin exists, so the pair appears atomically
            shutil.copy(d, live / "depth" / r.name)
            shutil.copy(r, live / "rgb" / r.name)
            time.sleep(0.05)

    sys_ = make_system()
    # warm the jitted programs first (XLA compile would otherwise starve
    # the live source: every frame but the last would be "stale" backlog),
    # then reset — the compiled step closures survive a reset
    ds = dataset.TUMDataset(src, depth_factor=5000.0)
    for i in range(3):
        t, g, d = ds[i]
        sys_.track_rgbd(g, d, t)
    sys_.reset()
    follow = dataset.FollowSource(live, depth_factor=5000.0,
                                  idle_timeout=4.0, poll_interval=0.01)
    th = threading.Thread(target=writer)
    th.start()
    tracked = []
    for t, gray, depth in follow.frames():
        assert depth is not None
        pose = sys_.track_rgbd(gray, depth, t)
        tracked.append((t, pose))
    th.join()

    # frames arrived while tracking ran; backlog may have been dropped but
    # everything seen was tracked, and the trajectory is sane
    assert follow.n_seen >= 5, (follow.n_seen, follow.n_dropped)
    assert follow.n_seen + follow.n_dropped == N_FRAMES
    assert sys_.tracking_state == 2  # OK
    sys_.flush_gba()
    traj = [(t, p) for t, p in tracked if p is not None]
    assert len(traj) >= 4
    # ATE of the tracked subset against ground truth
    gt_ts, gt = trajectory.load_tum_trajectory(src / "groundtruth.txt")
    ts = np.asarray([t for t, _ in traj])
    est = np.linalg.inv(np.stack([p for _, p in traj]))
    ate = trajectory.ate_rmse(gt_ts, gt, ts, est)
    assert ate < 0.05, ate


def test_follow_drops_backlog(rendered_seq, tmp_path):
    """All frames pre-written at once: drop-stale policy keeps only the
    newest (live-camera grab semantics)."""
    src = rendered_seq["root"]
    live = tmp_path / "burst"
    (live / "rgb").mkdir(parents=True)
    (live / "depth").mkdir()
    for r in sorted((src / "rgb").iterdir()):
        shutil.copy(r, live / "rgb" / r.name)
        shutil.copy(src / "depth" / r.name, live / "depth" / r.name)
    follow = dataset.FollowSource(live, depth_factor=5000.0,
                                  idle_timeout=0.3, poll_interval=0.01)
    frames = list(follow.frames())
    assert len(frames) == 1  # only the newest of the burst
    assert follow.n_dropped == N_FRAMES - 1
