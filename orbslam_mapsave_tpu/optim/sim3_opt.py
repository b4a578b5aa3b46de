"""Relative Sim3 refinement between two loop keyframes.

`Optimizer::OptimizeSim3` parity (`src/Optimizer.cc:1064-1259`,
SURVEY.md §2.1): one Sim3 variable S12; bidirectional reprojection edges
(`EdgeSim3ProjectXYZ` + inverse, `types_seven_dof_expmap.h:106-152`):
e1 = obs1 - proj(S12 · X2), e2 = obs2 - proj(S12^-1 · X1) with per-octave
information; Huber delta sqrt(10) (`:1128`); two-stage schedule: 5
iterations, drop chi2>10 outliers, then 10 more (5 if nothing dropped)
(`:1194-1213`); returns the inlier count used by the >= 20 gate at
`LoopClosing.cc:327-331`.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..geometry import projection, se3
from . import lm as lm_mod

CHI2_SIM3_EDGE = 10.0
HUBER2 = 10.0


class Sim3Obs(NamedTuple):
    pc1: jax.Array  # (M,3) matched points in camera-1 frame
    pc2: jax.Array  # (M,3) matched points in camera-2 frame
    uv1: jax.Array  # (M,2) observation in image 1
    uv2: jax.Array  # (M,2) observation in image 2
    inv_sigma2_1: jax.Array  # (M,)
    inv_sigma2_2: jax.Array  # (M,)
    valid: jax.Array  # (M,)


def _residuals(cam: projection.Camera, S12: jax.Array, obs: Sim3Obs):
    S21 = se3.sim3_inv(S12)
    p2in1 = se3.sim3_transform_points(S12, obs.pc2)
    p1in2 = se3.sim3_transform_points(S21, obs.pc1)
    uv1_hat, z1 = projection.project(cam, p2in1)
    uv2_hat, z2 = projection.project(cam, p1in2)
    e1 = obs.uv1 - uv1_hat
    e2 = obs.uv2 - uv2_hat
    chi1 = jnp.sum(e1 * e1, -1) * obs.inv_sigma2_1
    chi2 = jnp.sum(e2 * e2, -1) * obs.inv_sigma2_2
    return e1, e2, chi1, chi2, (z1 > 0) & (z2 > 0)


def _total_chi2(cam, S12, obs, active, robust):
    _, _, c1, c2, ok = _residuals(cam, S12, obs)
    c = c1 + c2

    def rho(x):
        d = jnp.sqrt(HUBER2)
        return jnp.where(x <= HUBER2, x, 2 * d * jnp.sqrt(jnp.maximum(x, 0)) - HUBER2)

    val = jnp.where(robust, rho(c1) + rho(c2), c)
    return jnp.sum(jnp.where(active & ok, val, 0.0))


@partial(jax.jit, static_argnums=(3, 4, 5))
def optimize_sim3(cam: projection.Camera, S12_init: jax.Array, obs: Sim3Obs,
                  fix_scale: bool = False, n_a: int = 5, n_b: int = 10):
    """Two-stage LM on the 7-dim (6 if fix_scale) tangent.

    Returns (S12, inlier_mask, n_inliers).
    """
    def lm_phase(S12, active, robust, n_iters):
        def res_vec(xi, S):
            S12x = se3.sim3_exp(xi) @ S
            e1, e2, _, _, _ = _residuals(cam, S12x, obs)
            return e1, e2

        def body(carry, _):
            S12, lam = carry
            z = jnp.zeros(7, S12.dtype)
            e1, e2, c1, c2, okz = _residuals(cam, S12, obs)
            w_rob1 = jnp.where(robust, lm_mod.huber_weight(c1, HUBER2), 1.0)
            w_rob2 = jnp.where(robust, lm_mod.huber_weight(c2, HUBER2), 1.0)
            act = (active & okz).astype(S12.dtype)
            w1 = obs.inv_sigma2_1 * w_rob1 * act
            w2 = obs.inv_sigma2_2 * w_rob2 * act
            J1 = jax.jacfwd(lambda x: res_vec(x, S12)[0])(z)  # (M,2,7)
            J2 = jax.jacfwd(lambda x: res_vec(x, S12)[1])(z)
            if fix_scale:
                J1 = J1.at[..., 6].set(0.0)
                J2 = J2.at[..., 6].set(0.0)
            H = jnp.einsum("mia,m,mib->ab", J1, w1, J1, precision=lm_mod.HI) + \
                jnp.einsum("mia,m,mib->ab", J2, w2, J2, precision=lm_mod.HI)
            g = -(jnp.einsum("mia,m,mi->a", J1, w1, e1, precision=lm_mod.HI)
                  + jnp.einsum("mia,m,mi->a", J2, w2, e2, precision=lm_mod.HI))
            dx = lm_mod.solve_spd(H, g, lam)
            if fix_scale:
                dx = dx.at[6].set(0.0)
            S_new = se3.sim3_exp(dx) @ S12
            cur = _total_chi2(cam, S12, obs, active, robust)
            new = _total_chi2(cam, S_new, obs, active, robust)
            accept = new < cur
            S12 = jnp.where(accept, S_new, S12)
            lam = jnp.clip(jnp.where(accept, lam * 0.5, lam * 5.0), 1e-9, 1e8)
            return (S12, lam), None

        (S12, _), _ = jax.lax.scan(
            body, (S12, jnp.asarray(1e-5, S12.dtype)), None, length=n_iters
        )
        return S12

    active = obs.valid
    S12 = lm_phase(S12_init, active, jnp.asarray(True), n_a)
    # drop outliers chi2 > 10 either direction (Optimizer.cc:1194-1209)
    _, _, c1, c2, okz = _residuals(cam, S12, obs)
    active = active & okz & (c1 <= CHI2_SIM3_EDGE) & (c2 <= CHI2_SIM3_EDGE)
    S12 = lm_phase(S12, active, jnp.asarray(False), n_b)
    # project back onto scale x SO(3) (chained f32 sim3_exp products)
    S12 = se3.sim3_orthonormalize(S12)
    _, _, c1, c2, okz = _residuals(cam, S12, obs)
    inlier = obs.valid & okz & (c1 <= CHI2_SIM3_EDGE) & (c2 <= CHI2_SIM3_EDGE)
    return S12, inlier, jnp.sum(inlier.astype(jnp.int32))
