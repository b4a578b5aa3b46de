"""Tests for the geometric solvers: Horn Sim3 (+RANSAC) and the two-view
initializer (H/F RANSAC + reconstruction)."""

import jax
import jax.numpy as jnp
import numpy as np

from orbslam_mapsave_tpu.geometry import se3
from orbslam_mapsave_tpu.ops import initializer, sim3solver


def test_horn_sim3_exact(rng):
    p1 = rng.normal(size=(1, 30, 3)).astype(np.float32)
    s_true = 1.7
    R_true = np.asarray(se3.so3_exp(jnp.asarray([0.3, -0.2, 0.5])))
    t_true = np.array([0.5, -1.0, 2.0], np.float32)
    p2 = s_true * p1 @ R_true.T + t_true
    S = sim3solver.horn_sim3(jnp.asarray(p1), jnp.asarray(p2),
                             jnp.ones((1, 30), jnp.float32))
    s, R, t = (np.asarray(x) for x in se3.sim3_split(S))
    assert abs(s[0] - s_true) < 1e-4
    np.testing.assert_allclose(R[0], R_true, atol=1e-5)
    np.testing.assert_allclose(t[0], t_true, atol=1e-4)


def test_horn_sim3_fixed_scale(rng):
    p1 = rng.normal(size=(1, 20, 3)).astype(np.float32)
    R_true = np.asarray(se3.so3_exp(jnp.asarray([0.1, 0.2, -0.3])))
    p2 = p1 @ R_true.T + np.array([1.0, 0.0, -0.5], np.float32)
    S = sim3solver.horn_sim3(jnp.asarray(p1), jnp.asarray(p2),
                             jnp.ones((1, 20), jnp.float32), fix_scale=True)
    s, R, t = (np.asarray(x) for x in se3.sim3_split(S))
    assert abs(s[0] - 1.0) < 1e-6
    np.testing.assert_allclose(R[0], R_true, atol=1e-5)


def test_ransac_sim3(rng):
    n = 60
    fx = fy = 400.0
    cx, cy = 320.0, 240.0
    # points in camera-1 coords
    pc1 = np.stack([rng.uniform(-1, 1, n), rng.uniform(-1, 1, n),
                    rng.uniform(2, 6, n)], -1).astype(np.float32)
    s_true = 1.3
    R_true = np.asarray(se3.so3_exp(jnp.asarray([0.05, 0.4, -0.1])))
    t_true = np.array([0.3, -0.2, 0.5], np.float32)
    # S21: cam1 -> cam2
    pc2 = s_true * pc1 @ R_true.T + t_true
    n_out = 15
    pc2_corrupt = pc2.copy()
    pc2_corrupt[:n_out] += rng.uniform(1, 3, (n_out, 3))
    uv1 = np.stack([fx * pc1[:, 0] / pc1[:, 2] + cx,
                    fy * pc1[:, 1] / pc1[:, 2] + cy], -1).astype(np.float32)
    uv2 = np.stack([fx * pc2_corrupt[:, 0] / pc2_corrupt[:, 2] + cx,
                    fy * pc2_corrupt[:, 1] / pc2_corrupt[:, 2] + cy], -1).astype(np.float32)
    S12, inl, n_inl, ok = sim3solver.ransac_sim3(
        jax.random.PRNGKey(0), jnp.asarray(pc1), jnp.asarray(pc2_corrupt),
        jnp.asarray(uv1), jnp.asarray(uv2), 200, False,
        fx=fx, fy=fy, cx=cx, cy=cy,
    )
    assert bool(ok)
    assert int(n_inl) >= n - n_out - 2
    s, R, t = (np.asarray(x) for x in se3.sim3_split(se3.sim3_inv(S12)))
    assert abs(s - s_true) < 1e-2
    np.testing.assert_allclose(R, R_true, atol=1e-2)


def _make_two_view(rng, n=300, planar=False, noise=0.3):
    fx = fy = 400.0
    cx, cy = 320.0, 240.0
    K = np.array([[fx, 0, cx], [0, fy, cy], [0, 0, 1.0]], np.float32)
    if planar:
        pts = np.stack([rng.uniform(-2, 2, n), rng.uniform(-1.5, 1.5, n),
                        np.full(n, 5.0)], -1)
    else:
        pts = np.stack([rng.uniform(-2, 2, n), rng.uniform(-1.5, 1.5, n),
                        rng.uniform(3, 9, n)], -1)
    R21 = np.asarray(se3.so3_exp(jnp.asarray([0.02, -0.15, 0.01])))
    t21 = np.array([0.4, 0.02, 0.05])
    pc2 = pts @ R21.T + t21
    uv1 = np.stack([fx * pts[:, 0] / pts[:, 2] + cx,
                    fy * pts[:, 1] / pts[:, 2] + cy], -1)
    uv2 = np.stack([fx * pc2[:, 0] / pc2[:, 2] + cx,
                    fy * pc2[:, 1] / pc2[:, 2] + cy], -1)
    uv1 += rng.normal(size=uv1.shape) * noise
    uv2 += rng.normal(size=uv2.shape) * noise
    valid = (
        (uv1[:, 0] > 0) & (uv1[:, 0] < 640) & (uv1[:, 1] > 0) & (uv1[:, 1] < 480)
        & (uv2[:, 0] > 0) & (uv2[:, 0] < 640) & (uv2[:, 1] > 0) & (uv2[:, 1] < 480)
        & (pc2[:, 2] > 0)
    )
    return (jnp.asarray(uv1, jnp.float32), jnp.asarray(uv2, jnp.float32),
            jnp.asarray(valid), jnp.asarray(K), R21, t21)


def test_initializer_general_scene(rng):
    uv1, uv2, valid, K, R21, t21 = _make_two_view(rng, planar=False)
    out = initializer.initialize_two_view(
        jax.random.PRNGKey(2), uv1, uv2, valid, 200, K
    )
    assert bool(out["success"]), (int(out["n_good"]), float(out["sh"]), float(out["sf"]))
    assert not bool(out["used_h"])  # non-planar -> fundamental
    R_est = np.asarray(out["R21"])
    np.testing.assert_allclose(R_est, R21, atol=2e-2)
    # translation up to scale
    t_est = np.asarray(out["t21"])
    t_dir = t21 / np.linalg.norm(t21)
    assert abs(abs(t_est @ t_dir) - 1.0) < 1e-2


def test_initializer_planar_scene(rng):
    uv1, uv2, valid, K, R21, t21 = _make_two_view(rng, planar=True)
    out = initializer.initialize_two_view(
        jax.random.PRNGKey(3), uv1, uv2, valid, 200, K
    )
    assert bool(out["used_h"])  # planar -> homography wins
    if bool(out["success"]):
        np.testing.assert_allclose(np.asarray(out["R21"]), R21, atol=3e-2)


def test_initializer_rejects_pure_rotation(rng):
    # no translation: parallax gate must reject
    fx = fy = 400.0
    cx, cy = 320.0, 240.0
    K = np.array([[fx, 0, cx], [0, fy, cy], [0, 0, 1.0]], np.float32)
    n = 300
    pts = np.stack([rng.uniform(-2, 2, n), rng.uniform(-1.5, 1.5, n),
                    rng.uniform(3, 9, n)], -1)
    R21 = np.asarray(se3.so3_exp(jnp.asarray([0.0, -0.1, 0.0])))
    pc2 = pts @ R21.T
    uv1 = np.stack([fx * pts[:, 0] / pts[:, 2] + cx,
                    fy * pts[:, 1] / pts[:, 2] + cy], -1)
    uv2 = np.stack([fx * pc2[:, 0] / pc2[:, 2] + cx,
                    fy * pc2[:, 1] / pc2[:, 2] + cy], -1)
    valid = np.all((uv2 > 0) & (uv2 < [640, 480]), -1)
    out = initializer.initialize_two_view(
        jax.random.PRNGKey(4), jnp.asarray(uv1, jnp.float32),
        jnp.asarray(uv2, jnp.float32), jnp.asarray(valid), 200, jnp.asarray(K)
    )
    assert not bool(out["success"])
