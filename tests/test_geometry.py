"""Golden tests for the SO3/SE3/Sim3 substrate (vs scipy + round-trips)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from scipy.spatial.transform import Rotation

from orbslam_mapsave_tpu.geometry import projection, se3


@pytest.fixture(scope="module", autouse=True)
def _x64_mode():
    """f64 golden comparisons need x64 — but the flag is process-global and
    leaks into later test modules (f32 pipelines then fail lax.cond/switch
    branch typing), so enable it only for this module."""
    jax.config.update("jax_enable_x64", True)
    yield
    jax.config.update("jax_enable_x64", False)


def random_rotvecs(rng, n, scale=2.5):
    return rng.normal(size=(n, 3)) * scale / 3


def test_so3_exp_matches_scipy(rng):
    w = random_rotvecs(rng, 64)
    R_ours = np.asarray(se3.so3_exp(jnp.asarray(w)))
    R_scipy = Rotation.from_rotvec(w).as_matrix()
    np.testing.assert_allclose(R_ours, R_scipy, atol=1e-9)


def test_so3_log_roundtrip(rng):
    w = random_rotvecs(rng, 64)
    # keep |w| < pi for uniqueness
    norm = np.linalg.norm(w, axis=-1, keepdims=True)
    w = np.where(norm > 3.0, w * (3.0 / norm), w)
    R = se3.so3_exp(jnp.asarray(w))
    w_back = np.asarray(se3.so3_log(R))
    np.testing.assert_allclose(w_back, w, atol=1e-7)


def test_so3_log_small_and_pi():
    # identity
    np.testing.assert_allclose(np.asarray(se3.so3_log(jnp.eye(3))), 0.0, atol=1e-12)
    # near pi
    w = np.array([np.pi - 1e-4, 0.0, 0.0])
    R = Rotation.from_rotvec(w).as_matrix()
    w_back = np.asarray(se3.so3_log(jnp.asarray(R)))
    np.testing.assert_allclose(w_back, w, atol=1e-5)


def test_se3_exp_log_roundtrip(rng):
    xi = rng.normal(size=(64, 6))
    xi[:, 3:] *= 0.8
    T = se3.se3_exp(jnp.asarray(xi))
    xi_back = np.asarray(se3.se3_log(T))
    np.testing.assert_allclose(xi_back, xi, atol=1e-8)
    # group property: exp(xi) exp(-xi) = I
    Tinv = se3.se3_exp(jnp.asarray(-xi))
    prod = np.asarray(T @ Tinv)
    np.testing.assert_allclose(prod, np.broadcast_to(np.eye(4), prod.shape), atol=1e-9)


def test_se3_inv(rng):
    xi = rng.normal(size=(8, 6))
    T = se3.se3_exp(jnp.asarray(xi))
    np.testing.assert_allclose(
        np.asarray(se3.se3_inv(T) @ T), np.broadcast_to(np.eye(4), (8, 4, 4)), atol=1e-10
    )


def test_quat_roundtrip(rng):
    w = random_rotvecs(rng, 32)
    R = Rotation.from_rotvec(w).as_matrix()
    q = np.asarray(se3.rot_to_quat(jnp.asarray(R)))
    # scipy uses (x,y,z,w) too
    q_scipy = Rotation.from_rotvec(w).as_quat()
    q_scipy = np.where(q_scipy[..., 3:4] < 0, -q_scipy, q_scipy)
    np.testing.assert_allclose(q, q_scipy, atol=1e-9)
    R_back = np.asarray(se3.quat_to_rot(jnp.asarray(q)))
    np.testing.assert_allclose(R_back, R, atol=1e-9)


def test_sim3_exp_log_roundtrip(rng):
    xi = rng.normal(size=(64, 7))
    xi[:, 3:6] *= 0.7
    xi[:, 6] *= 0.3  # log-scale
    S = se3.sim3_exp(jnp.asarray(xi))
    s, R, t = se3.sim3_split(S)
    np.testing.assert_allclose(np.asarray(s), np.exp(xi[:, 6]), atol=1e-9)
    xi_back = np.asarray(se3.sim3_log(S))
    np.testing.assert_allclose(xi_back, xi, atol=1e-7)


def test_sim3_small_angle_consistency():
    # sigma=0 must reduce to SE3 exp
    xi6 = np.array([[0.1, -0.2, 0.3, 0.01, 0.02, -0.01]])
    xi7 = np.concatenate([xi6, np.zeros((1, 1))], axis=-1)
    T = np.asarray(se3.se3_exp(jnp.asarray(xi6)))
    S = np.asarray(se3.sim3_exp(jnp.asarray(xi7)))
    np.testing.assert_allclose(S, T, atol=1e-9)


def test_sim3_inv(rng):
    xi = rng.normal(size=(8, 7)) * 0.5
    S = se3.sim3_exp(jnp.asarray(xi))
    prod = np.asarray(se3.sim3_inv(S) @ S)
    np.testing.assert_allclose(prod, np.broadcast_to(np.eye(4), prod.shape), atol=1e-9)


@pytest.fixture
def cam():
    return projection.Camera.create(
        fx=525.0, fy=525.0, cx=319.5, cy=239.5,
        k1=0.05, k2=-0.1, p1=0.001, p2=-0.002, k3=0.0,
        bf=40.0, width=640, height=480, dtype=jnp.float64,
    )


def test_undistort_matches_opencv(cam, rng):
    import cv2

    uv = rng.uniform([50, 50], [590, 430], size=(200, 2))
    K = np.asarray(cam.K)
    dist = np.array([0.05, -0.1, 0.001, -0.002, 0.0])
    expected = cv2.undistortPoints(
        uv[:, None].astype(np.float64), K, dist, P=K
    )[:, 0]
    ours = np.asarray(projection.undistort_points(cam, jnp.asarray(uv), iters=20))
    np.testing.assert_allclose(ours, expected, atol=1e-4)


def test_project_backproject_roundtrip(cam, rng):
    depth = rng.uniform(0.5, 5.0, size=(100,))
    uv = rng.uniform([0, 0], [640, 480], size=(100, 2))
    pts = projection.backproject(cam, jnp.asarray(uv), jnp.asarray(depth))
    uv2, z = projection.project(cam, pts)
    np.testing.assert_allclose(np.asarray(uv2), uv, atol=1e-9)
    np.testing.assert_allclose(np.asarray(z), depth, atol=1e-12)


def test_distort_roundtrip(cam, rng):
    xn = rng.uniform(-0.4, 0.4, size=(100, 2))
    xd = projection.distort_normalized(cam, jnp.asarray(xn))
    # undistort_points expects pixels
    uv = np.stack(
        [np.asarray(xd)[:, 0] * 525.0 + 319.5, np.asarray(xd)[:, 1] * 525.0 + 239.5], axis=-1
    )
    und = np.asarray(projection.undistort_points(cam, jnp.asarray(uv), iters=25))
    xn_back = np.stack([(und[:, 0] - 319.5) / 525.0, (und[:, 1] - 239.5) / 525.0], axis=-1)
    np.testing.assert_allclose(xn_back, xn, atol=1e-6)


def test_orthonormalize_recovers_so3(rng):
    # perturb a rotation off SO(3) at the magnitude where tracking
    # collapsed (||RR^T - I|| ~ 1e-2) and check full recovery
    w = rng.uniform(-1, 1, size=(16, 3))
    R = np.asarray(se3.so3_exp(jnp.asarray(w)))
    E = rng.uniform(-1e-2, 1e-2, size=(16, 3, 3))
    T = np.tile(np.eye(4), (16, 1, 1))
    T[:, :3, :3] = R + E
    T[:, :3, 3] = rng.uniform(-1, 1, size=(16, 3))
    out = np.asarray(se3.orthonormalize(jnp.asarray(T)))
    RRt = out[:, :3, :3] @ np.swapaxes(out[:, :3, :3], -1, -2)
    np.testing.assert_allclose(RRt, np.tile(np.eye(3), (16, 1, 1)), atol=1e-6)
    # closest rotation stays near the original
    d = np.einsum("bij,bkj->bik", out[:, :3, :3], R)
    ang = np.arccos(np.clip((np.trace(d, axis1=1, axis2=2) - 1) / 2, -1, 1))
    assert ang.max() < 2e-2
    np.testing.assert_allclose(out[:, :3, 3], T[:, :3, 3], atol=0)


def test_sim3_orthonormalize_preserves_scale(rng):
    w = rng.uniform(-1, 1, size=(8, 3))
    R = np.asarray(se3.so3_exp(jnp.asarray(w)))
    s = rng.uniform(0.5, 2.0, size=(8, 1, 1))
    E = rng.uniform(-1e-3, 1e-3, size=(8, 3, 3))
    S = np.tile(np.eye(4), (8, 1, 1))
    S[:, :3, :3] = s * R + E
    S[:, :3, 3] = rng.uniform(-1, 1, size=(8, 3))
    out = np.asarray(se3.sim3_orthonormalize(jnp.asarray(S)))
    M = out[:, :3, :3]
    s_out = np.cbrt(np.linalg.det(M))
    np.testing.assert_allclose(s_out, s[:, 0, 0], rtol=2e-3)
    Rn = M / s_out[:, None, None]
    RRt = Rn @ np.swapaxes(Rn, -1, -2)
    np.testing.assert_allclose(RRt, np.tile(np.eye(3), (8, 1, 1)), atol=1e-5)
