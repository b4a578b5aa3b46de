"""Tests for Schur-complement bundle adjustment: synthetic multi-view
problems with known ground truth."""

import jax.numpy as jnp
import numpy as np

from orbslam_mapsave_tpu.geometry import projection, se3
from orbslam_mapsave_tpu.optim import local_ba


def make_ba_problem(rng, n_cams=6, n_pts=120, obs_per_pt=4, noise=0.3,
                    pose_noise=0.02, pt_noise=0.05, stereo=False):
    cam = projection.Camera.create(525.0, 525.0, 319.5, 239.5, bf=40.0)
    pts_true = np.stack(
        [rng.uniform(-3, 3, n_pts), rng.uniform(-2, 2, n_pts), rng.uniform(4, 9, n_pts)],
        axis=-1,
    )
    poses_true = np.zeros((n_cams, 4, 4))
    for c in range(n_cams):
        xi = np.concatenate([
            [0.3 * c, 0.02 * c, 0.01 * c], rng.normal(size=3) * 0.01
        ])
        poses_true[c] = np.asarray(se3.se3_exp(jnp.asarray(xi)))

    O = obs_per_pt
    obs_cam = np.full((n_pts, O), -1, np.int32)
    obs_uv = np.zeros((n_pts, O, 2), np.float32)
    obs_ur = np.full((n_pts, O), -1.0, np.float32)
    for p in range(n_pts):
        cams = rng.choice(n_cams, size=O, replace=False)
        for lane, c in enumerate(cams):
            pc = poses_true[c, :3, :3] @ pts_true[p] + poses_true[c, :3, 3]
            u = 525.0 * pc[0] / pc[2] + 319.5 + rng.normal() * noise
            v = 525.0 * pc[1] / pc[2] + 239.5 + rng.normal() * noise
            obs_cam[p, lane] = c
            obs_uv[p, lane] = (u, v)
            if stereo:
                obs_ur[p, lane] = u - 40.0 / pc[2] + rng.normal() * noise

    # perturbed initial values; first TWO cameras fixed at truth — one pins
    # the 6-dof gauge, the second pins monocular scale (mono BA has a 7-dof
    # gauge; the production window always has >= 2 fixed observer cams)
    poses0 = poses_true.copy()
    for c in range(2, n_cams):
        xi = rng.normal(size=6) * pose_noise
        poses0[c] = np.asarray(se3.se3_exp(jnp.asarray(xi))) @ poses_true[c]
    pts0 = pts_true + rng.normal(size=pts_true.shape) * pt_noise

    prob = local_ba.BAProblem(
        cam_pose=jnp.asarray(poses0, jnp.float32),
        cam_fixed=jnp.asarray(np.arange(n_cams) <= 1),
        cam_valid=jnp.ones(n_cams, bool),
        pt_pos=jnp.asarray(pts0, jnp.float32),
        pt_valid=jnp.ones(n_pts, bool),
        obs_cam=jnp.asarray(obs_cam),
        obs_uv=jnp.asarray(obs_uv),
        obs_ur=jnp.asarray(obs_ur),
        obs_inv_sigma2=jnp.ones((n_pts, O), jnp.float32),
        obs_valid=jnp.asarray(obs_cam >= 0),
    )
    return cam, prob, poses_true, pts_true


def mean_pose_err(est, true):
    errs = []
    for a, b in zip(np.asarray(est), true):
        errs.append(np.linalg.norm(np.asarray(se3.se3_log(jnp.asarray(np.linalg.inv(b) @ a)))))
    return float(np.mean(errs))


def test_local_ba_reduces_error(rng):
    cam, prob, poses_true, pts_true = make_ba_problem(rng, noise=0.0)
    err0 = mean_pose_err(prob.cam_pose, poses_true)
    res = local_ba.local_bundle_adjustment(cam, prob)
    err1 = mean_pose_err(res.cam_pose, poses_true)
    assert err1 < err0 * 0.05, (err0, err1)
    pt_err = np.linalg.norm(np.asarray(res.pt_pos) - pts_true, axis=-1).mean()
    assert pt_err < 0.01


def test_local_ba_with_noise_and_outliers(rng):
    cam, prob, poses_true, pts_true = make_ba_problem(rng, noise=0.4)
    # corrupt 10% of observations
    uv = np.asarray(prob.obs_uv).copy()
    n_bad = len(uv) // 10
    uv[:n_bad, 0] += 80.0
    prob = prob._replace(obs_uv=jnp.asarray(uv))
    res = local_ba.local_bundle_adjustment(cam, prob)
    err = mean_pose_err(res.cam_pose, poses_true)
    assert err < 5e-3, err
    inl = np.asarray(res.obs_inlier)
    assert inl[:n_bad, 0].sum() <= n_bad * 0.2  # corrupted lane flagged out
    assert inl[n_bad:].mean() > 0.9


def test_fixed_camera_stays_fixed(rng):
    cam, prob, poses_true, _ = make_ba_problem(rng)
    res = local_ba.local_bundle_adjustment(cam, prob)
    np.testing.assert_allclose(
        np.asarray(res.cam_pose[0]), np.asarray(prob.cam_pose[0]), atol=1e-7
    )


def test_stereo_ba(rng):
    cam, prob, poses_true, pts_true = make_ba_problem(rng, stereo=True, noise=0.2)
    res = local_ba.local_bundle_adjustment(cam, prob)
    err = mean_pose_err(res.cam_pose, poses_true)
    assert err < 5e-3, err


def test_global_ba(rng):
    cam, prob, poses_true, pts_true = make_ba_problem(
        rng, n_cams=8, n_pts=200, noise=0.3, pose_noise=0.05
    )
    res = local_ba.global_bundle_adjustment(cam, prob, n_iters=20)
    err = mean_pose_err(res.cam_pose, poses_true)
    assert err < 5e-3, err
    assert float(res.chi2) < 3.0 * 200 * 4  # ~chi2 per dof sane


def test_abort_skips_phase_b(rng):
    cam, prob, poses_true, _ = make_ba_problem(rng, noise=0.0)
    res_full = local_ba.local_bundle_adjustment(cam, prob, abort=jnp.asarray(False))
    res_abort = local_ba.local_bundle_adjustment(cam, prob, abort=jnp.asarray(True))
    # aborted run stops after phase A: strictly fewer iterations of progress
    assert float(res_abort.chi2) >= float(res_full.chi2) - 1e-6


def test_ba_lane_escalation(rng):
    """A (loop-fused) point with 12 in-window observers keeps its BA
    constraints: the O_BA=8 truncated window escalates to O_BA_ESC=16
    lanes, so nothing is dropped (reference LocalBA consumes ALL
    observations of window points, `src/Optimizer.cc:507-556`)."""
    import jax
    from orbslam_mapsave_tpu.pipeline import local_mapping as lmod
    from orbslam_mapsave_tpu.slammap import mapstate as ms

    cam = projection.Camera.create(320.0, 320.0, 320.0, 240.0, bf=12.8)
    n_kf, n_feat = 14, 32
    st = ms.empty_map(16, 256, n_feat)
    kp = dict(
        kp_xy=jnp.asarray(rng.uniform(100, 500, (n_feat, 2)), jnp.float32),
        kp_ur=jnp.full((n_feat,), -1.0, jnp.float32),
        kp_depth=jnp.asarray(rng.uniform(0.5, 3, (n_feat,)), jnp.float32),
        kp_octave=jnp.zeros((n_feat,), jnp.int32),
        kp_angle=jnp.zeros((n_feat,), jnp.float32),
        kp_valid=jnp.ones((n_feat,), bool),
        desc=jnp.asarray(rng.integers(0, 256, (n_feat, 32)), jnp.uint8),
    )
    for i in range(n_kf):
        st, _ = ms.add_keyframe(st, jnp.eye(4), float(i), i, **kp)
    pos = jnp.asarray(rng.normal(size=(20, 3)) + np.array([0, 0, 5.0]),
                      jnp.float32)
    st, slots = ms.add_points(st, pos, jnp.zeros((20, 32), jnp.uint8),
                              0, 0, jnp.ones(20, bool))
    # point 0: observed by 12 keyframes (lanes 0..11); the rest: 2 each
    for k in range(12):
        st = ms.add_observations(st, k, slots[:1], jnp.asarray([k]),
                                 jnp.ones(1, bool))
    for k in range(2):
        st = ms.add_observations(st, k, slots[1:], 12 + jnp.arange(19),
                                 jnp.ones(19, bool))
    # make KFs 0..11 covisible with the current KF 13
    covis = st.covis
    for k in range(13):
        covis = covis.at[13, k].set(30).at[k, 13].set(30)
    st = st._replace(covis=covis)

    win = lmod.build_ba_window(st, jnp.asarray(13, jnp.int32))
    drop8 = int(lmod.count_truncated_ba_lanes(st, win, lmod.O_BA))
    drop16 = int(lmod.count_truncated_ba_lanes(st, win, lmod.O_BA_ESC))
    assert drop8 == 4  # lanes 8..11 of point 0 beyond the O_BA window
    assert drop16 == 0  # escalated width keeps 100% of the constraints

    # the escalated problem really carries all 12 observations
    inv2 = np.ones(4, np.float32)
    prob16 = lmod.assemble_ba_obs(st, win, inv2, lmod.O_BA_ESC)
    l = int(np.nonzero(np.asarray(win["lidx"]) == int(slots[0]))[0][0])
    assert int(np.asarray(prob16.obs_valid[l]).sum()) == 12

    # end-to-end through the mapper's BA: escalation fires, drops nothing
    mapper = lmod.LocalMapper(cam, inv2, enable_triangulation=False,
                              enable_culling=False)
    st2, dropped, esc = mapper._ba(st, jnp.asarray(13, jnp.int32),
                                   jnp.asarray(False))
    assert bool(esc) and int(dropped) == 0
    assert np.isfinite(np.asarray(st2.kf_pose)).all()
