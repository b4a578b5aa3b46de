"""Tests for batched EPnP + RANSAC (PnPsolver parity harness)."""

import jax
import jax.numpy as jnp
import numpy as np

from orbslam_mapsave_tpu.geometry import se3
from orbslam_mapsave_tpu.ops import epnp


def make_pnp(rng, n=50, noise=0.0, outlier_frac=0.0):
    pts = np.stack(
        [rng.uniform(-2, 2, n), rng.uniform(-1.5, 1.5, n), rng.uniform(3, 8, n)],
        -1,
    ).astype(np.float32)
    T = np.asarray(
        se3.se3_exp(jnp.asarray([0.2, -0.1, 0.15, 0.1, -0.05, 0.08]))
    ).astype(np.float32)
    pc = pts @ T[:3, :3].T + T[:3, 3]
    fx = fy = 500.0
    cx, cy = 320.0, 240.0
    uv = np.stack([fx * pc[:, 0] / pc[:, 2] + cx, fy * pc[:, 1] / pc[:, 2] + cy], -1)
    uv += rng.normal(size=uv.shape) * noise
    n_out = int(n * outlier_frac)
    if n_out:
        uv[:n_out] += rng.uniform(30, 80, (n_out, 2))
    return pts, uv.astype(np.float32), T, (fx, fy, cx, cy), n_out


def test_epnp_exact(rng):
    pts, uv, T, (fx, fy, cx, cy), _ = make_pnp(rng, n=12)
    uv_norm = np.stack([(uv[:, 0] - cx) / fx, (uv[:, 1] - cy) / fy], -1)
    pose = epnp.epnp(
        jnp.asarray(pts)[None], jnp.asarray(uv_norm)[None],
        jnp.ones((1, 12), jnp.float32),
    )[0]
    err = np.asarray(se3.se3_log(jnp.asarray(np.linalg.inv(T) @ np.asarray(pose))))
    assert np.linalg.norm(err) < 1e-3, err


def test_epnp_minimal_4pt(rng):
    pts, uv, T, (fx, fy, cx, cy), _ = make_pnp(rng, n=4)
    uv_norm = np.stack([(uv[:, 0] - cx) / fx, (uv[:, 1] - cy) / fy], -1)
    pose = epnp.epnp(
        jnp.asarray(pts)[None], jnp.asarray(uv_norm)[None],
        jnp.ones((1, 4), jnp.float32),
    )[0]
    # 4-point EPnP is less stable; accept cm-level
    err = np.asarray(se3.se3_log(jnp.asarray(np.linalg.inv(T) @ np.asarray(pose))))
    assert np.linalg.norm(err) < 5e-2, err


def test_ransac_pnp_with_outliers(rng):
    pts, uv, T, (fx, fy, cx, cy), n_out = make_pnp(
        rng, n=80, noise=0.5, outlier_frac=0.3
    )
    # reference gate: maxError = sigma^2 * 5.991 per octave; use octave 0
    max_err2 = np.full(80, 5.991, np.float32)
    pose, inl, n, ok = epnp.ransac_pnp(
        jax.random.PRNGKey(0), jnp.asarray(pts), jnp.asarray(uv),
        jnp.asarray(max_err2), jnp.ones(80, bool), 300,
        fx=fx, fy=fy, cx=cx, cy=cy,
    )
    assert bool(ok)
    assert int(n) > 40
    inl = np.asarray(inl)
    assert inl[:n_out].sum() <= 2
    err = np.asarray(se3.se3_log(jnp.asarray(np.linalg.inv(T) @ np.asarray(pose))))
    assert np.linalg.norm(err) < 2e-2, err


def test_ransac_pnp_respects_valid(rng):
    pts, uv, T, (fx, fy, cx, cy), _ = make_pnp(rng, n=60, noise=0.2)
    valid = np.ones(60, bool)
    valid[:20] = False
    pts2 = pts.copy()
    pts2[:20] = 1e3  # garbage, must be ignored
    pose, inl, n, ok = epnp.ransac_pnp(
        jax.random.PRNGKey(1), jnp.asarray(pts2), jnp.asarray(uv),
        jnp.full(60, 5.991, jnp.float32), jnp.asarray(valid), 200,
        fx=fx, fy=fy, cx=cx, cy=cy,
    )
    assert bool(ok)
    assert not np.asarray(inl)[:20].any()
    err = np.asarray(se3.se3_log(jnp.asarray(np.linalg.inv(T) @ np.asarray(pose))))
    assert np.linalg.norm(err) < 2e-2
