"""End-to-end loop closing on a synthetic circular trajectory.

The round-1 gap: nothing proved the detect -> Sim3 -> correct -> fuse ->
pose-graph -> GBA chain works as a system. This test renders a full
revolution inside the BoxRoom with a slowly-varying depth-scale
miscalibration (REAL accumulated drift that only a loop closure can
remove), runs RGB-D SLAM with loop closing enabled on a vocabulary trained
from the sequence itself, and asserts:

- at least one loop event fires (detect + Sim3 + >= 40 matches);
- the corrected keyframe trajectory is closer to ground truth than the
  drifted one captured the moment before correction;
- duplicate landmarks across the loop are fused (cross-loop covisibility
  appears, point count does not grow through correction).

Reference behavior being matched: `src/LoopClosing.cc:403-583` +
`RunGlobalBundleAdjustment` (`:643-786`).
"""

import numpy as np
import pytest

from orbslam_mapsave_tpu import config as config_mod
from orbslam_mapsave_tpu.io import dataset, synthetic, trajectory
from orbslam_mapsave_tpu.pipeline import system as system_mod
from orbslam_mapsave_tpu.vocab import vocabulary

W, H = 320, 240
FX = 200.0
N_FRAMES = 170
T0 = 1000.0
FPS = 30.0


@pytest.fixture(scope="module")
def loop_seq(tmp_path_factory):
    out = tmp_path_factory.mktemp("loop_seq")
    K = np.array([[FX, 0, W / 2], [0, FX, H / 2], [0, 0, 1.0]])
    poses = synthetic.circle_trajectory(N_FRAMES, radius=0.55, revs=1.30)
    # +-4% slowly-varying depth-scale error -> real odometric drift
    synthetic.write_tum_sequence(
        out, K, poses, width=W, height=H, seed=11, depth_factor=5000.0,
        t0=T0, fps=FPS,
        depth_scale_fn=lambda i: 1.0 + 0.04 * np.sin(2 * np.pi * i / N_FRAMES),
    )
    return {"root": out, "K": K, "poses": poses}


def make_system(voc):
    cfg = config_mod.SystemConfig()
    cfg.camera = config_mod.CameraConfig(
        fx=FX, fy=FX, cx=W / 2, cy=H / 2, width=W, height=H,
        bf=FX * 0.08, th_depth=50.0, depth_map_factor=5000.0, fps=30,
    )
    cfg.orb = config_mod.ORBConfig(n_features=500, n_levels=4,
                                   scale_factor=1.5)
    cfg.max_keypoints = 640
    cfg.max_keyframes = 48
    cfg.max_points = 16384
    return system_mod.SLAMSystem(
        cfg, system_mod.Sensor.RGBD, vocabulary=voc,
        enable_loop_closing=True, enable_mapping=True,
    )


@pytest.fixture(scope="module")
def trained_voc(loop_seq):
    """Train a toy vocabulary from a handful of the sequence's own frames
    (the environment has no ORBvoc blob, SURVEY.md §4)."""
    sys_ = make_system(None)
    ds = dataset.TUMDataset(loop_seq["root"], depth_factor=5000.0)
    descs = []
    for i, (t, gray, depth) in enumerate(ds):
        if i % 10 != 0:
            continue
        fr = sys_.builder.build(gray, t, depth)
        d = np.asarray(fr.desc)[np.asarray(fr.valid)]
        descs.append(d)
    return vocabulary.train(np.concatenate(descs), k=10, L=4, seed=1)


def kf_ate(state, gt_poses, ts_epoch=T0):
    # device stamps are f32 offsets from the run's epoch (Tracker.ts_epoch)
    valid = np.asarray(state.kf_valid)
    ts = np.asarray(state.kf_timestamp, np.float64)[valid] + ts_epoch
    poses = np.asarray(state.kf_pose)[valid]
    est = np.linalg.inv(poses)
    gt_ts = T0 + np.arange(len(gt_poses)) / FPS
    return trajectory.ate_rmse(gt_ts, gt_poses, ts, est)


@pytest.mark.slow
def test_loop_closure_end_to_end(loop_seq, trained_voc):
    sys_ = make_system(trained_voc)
    lc = sys_.loop_closer
    assert lc is not None

    captured = {}
    orig_correct = lc._correct_loop

    def wrapped(state, kf, match_kf, S, matched_pt, loop_pts):
        if "pre" not in captured:
            captured["pre"] = state
            captured["pre_points"] = int(np.asarray(state.pt_valid).sum())
        out = orig_correct(state, kf, match_kf, S, matched_pt, loop_pts)
        captured["post"] = out
        captured["post_points"] = int(np.asarray(out.pt_valid).sum())
        captured["pair"] = (kf, match_kf)
        return out

    lc._correct_loop = wrapped

    ds = dataset.TUMDataset(loop_seq["root"], depth_factor=5000.0)
    n_ok = 0
    for t, gray, depth in ds:
        pose = sys_.track_rgbd(gray, depth, t)
        n_ok += pose is not None
    sys_.flush_gba()

    assert n_ok >= 0.9 * N_FRAMES, f"tracking lost: {n_ok}/{N_FRAMES}"
    assert len(lc.events) >= 1, "no loop event fired"

    gt = loop_seq["poses"]
    ate_pre = kf_ate(captured["pre"], gt)
    ate_post = kf_ate(sys_.map, gt)
    # the injected depth-scale drift must be visibly reduced by the loop
    assert ate_post < ate_pre, (ate_pre, ate_post)
    assert ate_post < 0.06, f"post-loop ATE {ate_post:.4f} m"

    # duplicate landmarks fused: correction must not grow the point count,
    # and the loop pair must now be covisibility-connected
    assert captured["post_points"] <= captured["pre_points"]
    kf, match_kf = captured["pair"]
    covis = np.asarray(sys_.map.covis)
    ev = lc.events[0]
    assert covis[ev.query_kf, ev.match_kf] > 0 or \
        covis[kf, match_kf] > 0, "no cross-loop covisibility after fusion"
