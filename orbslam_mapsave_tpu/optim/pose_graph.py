"""Sim3 pose-graph (essential graph) optimization for loop correction.

`Optimizer::OptimizeEssentialGraph` parity (`src/Optimizer.cc:781-1062`,
SURVEY.md §2.1): vertices are per-keyframe Sim3 world->camera transforms
(scale 1 except loop-corrected KFs); edges are (a) the new loop links,
(b) spanning-tree edges, (c) previous loop edges, (d) covisibility edges
with weight >= 100 (`:806`); the loop KF is held fixed; 20 LM iterations
(`:1003`); afterwards poses are recovered as SE3 with translation/scale
(`:1012-1027`) and map points corrected through their reference KF
(`:1031-1060`).

TPU design: edges carry a measured relative Sim3; residual r =
sim3_log(S_meas * exp(xi_i) S_i * (exp(xi_j) S_j)^-1) linearized by forward-
mode autodiff at xi=0 (batched over all edges), normal equations assembled
densely over (K,7) variables and solved with Cholesky — the essential graph
of a few hundred KFs fits comfortably as a dense MXU problem.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..geometry import se3
from . import lm as lm_mod


class PoseGraphProblem(NamedTuple):
    S_init: jax.Array  # (K,4,4) initial Sim3 (sR|t) world->camera
    fixed: jax.Array  # (K,) bool
    valid: jax.Array  # (K,) bool
    edge_i: jax.Array  # (E,) i32
    edge_j: jax.Array  # (E,) i32
    edge_meas: jax.Array  # (E,4,4) measured S_ij = S_i S_j^-1
    edge_valid: jax.Array  # (E,)
    edge_weight: jax.Array  # (E,) information scale (1.0 default)


def _edge_residual(S_i, S_j, S_meas, xi_i, xi_j):
    Si = se3.sim3_exp(xi_i) @ S_i
    Sj = se3.sim3_exp(xi_j) @ S_j
    rel = Si @ se3.sim3_inv(Sj)
    return se3.sim3_log(S_meas @ se3.sim3_inv(rel))


def _edge_onehots(prob: PoseGraphProblem, K: int):
    """(E,K) one-hot incidence of each edge's endpoints (f32). Endpoint
    selection and Hessian assembly run as contractions against these —
    row gathers and (K,K,7,7) scatter-adds both lower pathologically on
    the TPU runtime (see optim/global_ba._onehot_po)."""
    ids = jnp.arange(K, dtype=jnp.int32)
    oh_i = (prob.edge_i[:, None] == ids).astype(jnp.float32)
    oh_j = (prob.edge_j[:, None] == ids).astype(jnp.float32)
    return oh_i, oh_j


def _select_poses(S, oh):
    K = S.shape[0]
    return jnp.einsum("ek,kf->ef", oh, S.reshape(K, 16),
                      precision=lm_mod.HI).reshape(-1, 4, 4)


def _linearize(S, prob: PoseGraphProblem, oh_i, oh_j):
    """Residuals (E,7) and Jacobians (E,7,7)x2 at xi=0 for all edges."""
    Si = _select_poses(S, oh_i)
    Sj = _select_poses(S, oh_j)
    z7 = jnp.zeros(7, S.dtype)

    def res_fn(xi_i, xi_j, a, b, m):
        return _edge_residual(a, b, m, xi_i, xi_j)

    r = jax.vmap(lambda a, b, m: res_fn(z7, z7, a, b, m))(Si, Sj, prob.edge_meas)
    Ji = jax.vmap(
        lambda a, b, m: jax.jacfwd(lambda x: res_fn(x, z7, a, b, m))(z7)
    )(Si, Sj, prob.edge_meas)
    Jj = jax.vmap(
        lambda a, b, m: jax.jacfwd(lambda x: res_fn(z7, x, a, b, m))(z7)
    )(Si, Sj, prob.edge_meas)
    return r, Ji, Jj


def _residuals_only(S, prob: PoseGraphProblem, oh_i, oh_j):
    Si = _select_poses(S, oh_i)
    Sj = _select_poses(S, oh_j)
    z7 = jnp.zeros(7, S.dtype)
    return jax.vmap(lambda a, b, m: _edge_residual(a, b, m, z7, z7))(
        Si, Sj, prob.edge_meas)


def optimize_pose_graph(prob: PoseGraphProblem, n_iters: int = 20):
    """Run damped Gauss-Newton over the pose graph. Returns (S_opt (K,4,4),
    final chi2).

    The (7K,7K) normal system is solved by Cholesky — XLA's TPU
    `linalg.solve` lowers to partial-pivot LU, which at a few hundred
    variables runs ~100x slower than the blocked Cholesky (measured: the
    LU path made the essential graph a multi-second stall per loop event)."""
    K = prob.S_init.shape[0]
    free = prob.valid & ~prob.fixed
    oh_i, oh_j = _edge_onehots(prob, K)

    def chi2_of(S):
        r = _residuals_only(S, prob, oh_i, oh_j)
        return jnp.sum(
            jnp.where(prob.edge_valid, prob.edge_weight * jnp.sum(r * r, -1), 0.0)
        )

    def step(S, lam):
        r, Ji, Jj = _linearize(S, prob, oh_i, oh_j)
        w = jnp.where(prob.edge_valid, prob.edge_weight, 0.0)
        cur = jnp.sum(w * jnp.sum(r * r, -1))
        # assemble dense H (K*7, K*7) and g (K*7) by incidence contraction
        # (the (K,K,7,7) scatter-add form serialized ~50k updates/iter)
        Hii = jnp.einsum("eri,e,erj->eij", Ji, w, Ji, precision=lm_mod.HI)
        Hjj = jnp.einsum("eri,e,erj->eij", Jj, w, Jj, precision=lm_mod.HI)
        Hij = jnp.einsum("eri,e,erj->eij", Ji, w, Jj, precision=lm_mod.HI)
        gi = -jnp.einsum("eri,e,er->ei", Ji, w, r, precision=lm_mod.HI)
        gj = -jnp.einsum("eri,e,er->ei", Jj, w, r, precision=lm_mod.HI)
        H = (jnp.einsum("ea,eb,eij->abij", oh_i, oh_i, Hii,
                        precision=lm_mod.HI)
             + jnp.einsum("ea,eb,eij->abij", oh_j, oh_j, Hjj,
                          precision=lm_mod.HI)
             + jnp.einsum("ea,eb,eij->abij", oh_i, oh_j, Hij,
                          precision=lm_mod.HI)
             + jnp.einsum("ea,eb,eji->abij", oh_i, oh_j, Hij,
                          precision=lm_mod.HI).transpose(1, 0, 2, 3))
        g = (jnp.einsum("ek,ei->ki", oh_i, gi, precision=lm_mod.HI)
             + jnp.einsum("ek,ei->ki", oh_j, gj, precision=lm_mod.HI))
        Hf = H.transpose(0, 2, 1, 3).reshape(K * 7, K * 7)
        mask = jnp.repeat(free, 7)
        Hf = jnp.where(mask[:, None] & mask[None, :], Hf, 0.0)
        Hf = Hf + jnp.diag(jnp.where(mask, lam, 1.0))
        gf = jnp.where(mask, g.reshape(-1), 0.0)
        # SPD solve (damped GN Hessian + identity rows on fixed vars)
        L = jnp.linalg.cholesky(Hf)
        y = jax.scipy.linalg.solve_triangular(L, gf, lower=True)
        dx = jax.scipy.linalg.solve_triangular(
            L, y, lower=True, trans=1).reshape(K, 7)
        dx = jnp.where(jnp.isfinite(dx), dx, 0.0)
        dx = jnp.where(free[:, None], dx, 0.0)
        return se3.sim3_exp(dx) @ S, cur

    def body(carry, _):
        S, lam = carry
        S_new, cur = step(S, lam)
        new = chi2_of(S_new)
        accept = new < cur
        S = jnp.where(accept, S_new, S)
        lam = jnp.clip(jnp.where(accept, lam * 0.5, lam * 5.0), 1e-8, 1e8)
        return (S, lam), new

    (S, _), hist = jax.lax.scan(
        body, (prob.S_init, jnp.asarray(1e-6, prob.S_init.dtype)), None,
        length=n_iters,
    )
    # chained f32 sim3_exp products drift off scale x SO(3); project back
    # before the corrected poses are written into the map
    S = se3.sim3_orthonormalize(S)
    return S, chi2_of(S)


def sim3_to_se3(S: jax.Array) -> jax.Array:
    """Recover SE3 poses: Tiw = [R | t/s] (`src/Optimizer.cc:1012-1027`)."""
    s, R, t = se3.sim3_split(S)
    return se3.rt_to_mat(R, t / s[..., None])


def correct_points(pt_pos: jax.Array, S_old_ref: jax.Array,
                   S_new_ref: jax.Array) -> jax.Array:
    """Move points with their reference KF's Sim3 correction
    (`src/Optimizer.cc:1031-1060`): X' = S_new^-1 ( S_old X ).

    One pose PER point: pt_pos (P,3), S_old_ref/S_new_ref (P,4,4).
    (sim3_transform_points expects a point SET per pose — using it here
    batch-matmuls (P,3) against (P,3,3) into (P,P,3).)"""
    p_cam = jnp.einsum("pij,pj->pi", S_old_ref[..., :3, :3], pt_pos) \
        + S_old_ref[..., :3, 3]
    Sinv = se3.sim3_inv(S_new_ref)
    return jnp.einsum("pij,pj->pi", Sinv[..., :3, :3], p_cam) \
        + Sinv[..., :3, 3]
