"""Multi-loop closure quality (VERDICT r3 item 7): >= 2 loop events on a
2.6-revolution trajectory with persistent depth-scale miscalibration, with
pre/post-correction keyframe ATE quantified PER EVENT.

Asserts, matching `src/LoopClosing.cc:403-583` + `RunGlobalBundleAdjustment`
(`:643-786`) behavior:

- at least two loop events fire (the 10-KF refractory period
  `LoopClosing.cc:115` permits one per revisit pass);
- the FIRST correction reduces the drifted keyframe ATE by a fixed factor
  (the injected drift is real odometric error only a loop can remove);
- no correction makes the trajectory materially worse (each event's
  post-ATE <= max(pre-ATE, floor));
- the accepted Sim3 of each event is consistent with the ground-truth
  relative pose of the matched keyframe pair (rotation within a few
  degrees, translation within the drift magnitude, scale ~1 for RGB-D
  fix_scale=True) — the device-side one-program Sim3 chain
  (`pipeline/loop_closing.py:_build_sim3_device`) must produce a
  geometrically meaningful transform, not merely pass its inlier gates.
"""

import numpy as np
import pytest

from orbslam_mapsave_tpu import config as config_mod
from orbslam_mapsave_tpu.io import dataset, synthetic, trajectory
from orbslam_mapsave_tpu.pipeline import system as system_mod
from orbslam_mapsave_tpu.vocab import vocabulary

W, H = 320, 240
FX = 200.0
N_FRAMES = 340
T0 = 1000.0
FPS = 30.0


@pytest.fixture(scope="module")
def multi_loop_seq(tmp_path_factory):
    out = tmp_path_factory.mktemp("multi_loop_seq")
    K = np.array([[FX, 0, W / 2], [0, FX, H / 2], [0, 0, 1.0]])
    poses = synthetic.circle_trajectory(N_FRAMES, radius=0.55, revs=2.6)
    # persistent +-4% depth-scale error, period = one revolution, so drift
    # keeps re-accumulating after each correction
    per_rev = N_FRAMES / 2.6
    synthetic.write_tum_sequence(
        out, K, poses, width=W, height=H, seed=11, depth_factor=5000.0,
        t0=T0, fps=FPS,
        depth_scale_fn=lambda i: 1.0 + 0.04 * np.sin(2 * np.pi * i / per_rev),
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
    cfg.max_keyframes = 80
    cfg.max_points = 24576
    return system_mod.SLAMSystem(
        cfg, system_mod.Sensor.RGBD, vocabulary=voc,
        enable_loop_closing=True, enable_mapping=True,
    )


@pytest.fixture(scope="module")
def trained_voc(multi_loop_seq):
    sys_ = make_system(None)
    ds = dataset.TUMDataset(multi_loop_seq["root"], depth_factor=5000.0)
    descs = []
    for i, (t, gray, depth) in enumerate(ds):
        if i % 14 != 0:
            continue
        fr = sys_.builder.build(gray, t, depth)
        descs.append(np.asarray(fr.desc)[np.asarray(fr.valid)])
    return vocabulary.train(np.concatenate(descs), k=10, L=4, seed=1)


def kf_ate(state, gt_poses, ts_epoch=T0):
    valid = np.asarray(state.kf_valid)
    ts = np.asarray(state.kf_timestamp, np.float64)[valid] + ts_epoch
    poses = np.asarray(state.kf_pose)[valid]
    est = np.linalg.inv(poses)
    gt_ts = T0 + np.arange(len(gt_poses)) / FPS
    return trajectory.ate_rmse(gt_ts, gt_poses, ts, est)


@pytest.mark.slow
def test_multi_loop_quality(multi_loop_seq, trained_voc):
    sys_ = make_system(trained_voc)
    lc = sys_.loop_closer
    events = []  # per-event dicts: pre/post state + Sim3 + kf pair

    orig_correct = lc._correct_loop

    def wrapped(state, kf, match_kf, S, matched_pt, loop_pts):
        rec = {"pre": state, "kf": kf, "match_kf": match_kf,
               "S": np.asarray(S)}
        out = orig_correct(state, kf, match_kf, S, matched_pt, loop_pts)
        # fold the async GBA into the recorded post state so the per-event
        # ATE measures the full correction chain (force: the incremental
        # job issues its remaining LM iterations now)
        rec["post"] = lc.poll_gba(out, force=True)
        events.append(rec)
        return rec["post"]

    lc._correct_loop = wrapped

    ds = dataset.TUMDataset(multi_loop_seq["root"], depth_factor=5000.0)
    n_ok = 0
    for t, gray, depth in ds:
        pose = sys_.track_rgbd(gray, depth, t)
        n_ok += pose is not None
    sys_.flush_gba()

    assert n_ok >= 0.9 * N_FRAMES, f"tracking lost: {n_ok}/{N_FRAMES}"
    assert len(lc.events) >= 2, (
        f"only {len(lc.events)} loop events over 2.6 revolutions")

    gt = multi_loop_seq["poses"]
    gt_ts = T0 + np.arange(N_FRAMES) / FPS

    # --- per-event correction quality -------------------------------------
    ates = []
    for i, rec in enumerate(events):
        pre = kf_ate(rec["pre"], gt)
        post = kf_ate(rec["post"], gt)
        ates.append((pre, post))
        # no event may materially worsen the trajectory (floor: already-
        # corrected maps have little drift left to remove)
        assert post <= max(1.10 * pre, 0.03), (
            f"event {i}: correction worsened ATE {pre:.4f} -> {post:.4f}")

    # the first event faces the full accumulated rev-1 drift: require a
    # real reduction (the r2 host-path fixture showed ~6x; demand >= 1.5x)
    pre0, post0 = ates[0]
    assert post0 < 0.67 * pre0, (
        f"first loop correction too weak: {pre0:.4f} -> {post0:.4f}")

    # final map quality after all events + GBA
    final = kf_ate(sys_.map, gt)
    assert final < 0.06, f"final keyframe ATE {final:.4f} m"

    # --- Sim3 geometric consistency per event -----------------------------
    # S (= S_cur_loop, gScm after OptimizeSim3) maps match-KF camera coords
    # into query-KF camera coords. Ground truth: Tcw_q @ Twc_m from the
    # rendered poses at the two keyframes' timestamps.
    for i, rec in enumerate(events):
        st = rec["pre"]
        ts = np.asarray(st.kf_timestamp, np.float64) + T0
        for name, slot in (("q", rec["kf"]), ("m", rec["match_kf"])):
            fi = int(round((ts[slot] - T0) * FPS))
            assert 0 <= fi < N_FRAMES
            rec[f"T_{name}"] = np.linalg.inv(gt[fi])  # Tcw ground truth
        S = rec["S"]
        s = float(np.cbrt(np.linalg.det(S[:3, :3])))
        R = S[:3, :3] / s
        gt_rel = rec["T_q"] @ np.linalg.inv(rec["T_m"])
        # rotation error (deg)
        dR = R @ gt_rel[:3, :3].T
        ang = np.degrees(np.arccos(np.clip((np.trace(dR) - 1) / 2, -1, 1)))
        assert ang < 5.0, f"event {i}: Sim3 rotation off by {ang:.2f} deg"
        # translation error bounded by the drift magnitude scale
        terr = np.linalg.norm(S[:3, 3] - gt_rel[:3, 3])
        assert terr < 0.15, f"event {i}: Sim3 translation off by {terr:.3f} m"
        # RGB-D: fix_scale=True means s == 1 exactly
        assert abs(s - 1.0) < 1e-3, f"event {i}: scale {s} != 1 (fix_scale)"
