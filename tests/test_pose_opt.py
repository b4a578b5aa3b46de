"""Tests for motion-only pose optimization: convergence, outlier rejection."""

import jax.numpy as jnp
import numpy as np

from orbslam_mapsave_tpu.geometry import projection, se3
from orbslam_mapsave_tpu.optim import pose_opt


def make_problem(rng, n=200, stereo=False, noise=0.3, outlier_frac=0.0):
    cam = projection.Camera.create(525.0, 525.0, 319.5, 239.5, bf=40.0)
    pts = np.stack(
        [rng.uniform(-2, 2, n), rng.uniform(-1.5, 1.5, n), rng.uniform(2, 6, n)],
        axis=-1,
    ).astype(np.float32)
    true_pose = np.asarray(
        se3.se3_exp(jnp.asarray([0.1, -0.05, 0.08, 0.02, -0.03, 0.01]))
    ).astype(np.float32)
    p_cam = pts @ true_pose[:3, :3].T + true_pose[:3, 3]
    uv = np.stack(
        [
            525.0 * p_cam[:, 0] / p_cam[:, 2] + 319.5,
            525.0 * p_cam[:, 1] / p_cam[:, 2] + 239.5,
        ],
        axis=-1,
    )
    uv += rng.normal(size=uv.shape) * noise
    ur = uv[:, 0] - 40.0 / p_cam[:, 2] if stereo else np.full(n, -1.0)
    n_out = int(n * outlier_frac)
    if n_out:
        uv[:n_out] += rng.uniform(20, 60, (n_out, 2)) * rng.choice([-1, 1], (n_out, 2))
    obs = pose_opt.PoseObs(
        pt_w=jnp.asarray(pts),
        uv=jnp.asarray(uv, jnp.float32),
        ur=jnp.asarray(ur, jnp.float32),
        inv_sigma2=jnp.ones(n, jnp.float32),
        valid=jnp.ones(n, bool),
    )
    return cam, true_pose, obs, n_out


def pose_err(T_est, T_true):
    d = np.asarray(se3.se3_log(jnp.asarray(np.linalg.inv(T_true) @ np.asarray(T_est))))
    return np.linalg.norm(d)


def test_converges_from_identity(rng):
    cam, T_true, obs, _ = make_problem(rng, noise=0.0)
    T, inl, n = pose_opt.pose_optimization(cam, jnp.eye(4), obs)
    assert pose_err(T, T_true) < 1e-4
    assert int(n) == 200


def test_converges_with_noise(rng):
    cam, T_true, obs, _ = make_problem(rng, noise=0.5)
    T, inl, n = pose_opt.pose_optimization(cam, jnp.eye(4), obs)
    assert pose_err(T, T_true) < 5e-3
    assert int(n) > 180


def test_rejects_outliers(rng):
    cam, T_true, obs, n_out = make_problem(rng, noise=0.3, outlier_frac=0.25)
    T, inl, n = pose_opt.pose_optimization(cam, jnp.eye(4), obs)
    inl = np.asarray(inl)
    assert pose_err(T, T_true) < 5e-3
    # outliers (first n_out) must be flagged out
    assert inl[:n_out].sum() <= 2
    assert inl[n_out:].mean() > 0.95


def test_stereo_edges(rng):
    cam, T_true, obs, _ = make_problem(rng, n=150, stereo=True, noise=0.2)
    T, inl, n = pose_opt.pose_optimization(cam, jnp.eye(4), obs)
    assert pose_err(T, T_true) < 2e-3
    assert int(n) > 140


def test_respects_valid_mask(rng):
    cam, T_true, obs, _ = make_problem(rng, noise=0.0)
    # corrupt half the points but mark them invalid
    pts = np.asarray(obs.pt_w).copy()
    pts[100:] += 5.0
    obs = obs._replace(
        pt_w=jnp.asarray(pts),
        valid=jnp.asarray(np.arange(200) < 100),
    )
    T, inl, n = pose_opt.pose_optimization(cam, jnp.eye(4), obs)
    assert pose_err(T, T_true) < 1e-4
    assert int(n) == 100
