"""Batched Levenberg-Marquardt bundle adjustment with explicit Schur complement.

TPU-native rebuild of g2o's sparse BA stack (`BlockSolver_6_3` +
`OptimizationAlgorithmLevenberg`, `Thirdparty/g2o/g2o/core/block_solver.hpp`)
as used by `Optimizer::LocalBundleAdjustment` (`src/Optimizer.cc:453-779`) and
`Optimizer::BundleAdjustment` (`src/Optimizer.cc:49-237`):

- the point-major (L points x O lanes) observation table is compacted ONCE
  per solve into an edge-major list of E real edges (g2o's edge set) — the
  padded lanes would otherwise multiply every iteration's gather/scatter
  traffic by ~8x;
- landmark blocks Hpp are 3x3 -> inverted in closed form (adjugate), batched
  over all points at once;
- index reductions avoid large XLA scatters (measured ~60ns/row on TPU):
  camera-side sums are one-hot matmuls on the MXU; point-side sums are small
  E-row scatters;
- the reduced camera system S = Hcc - W Hpp^-1 W^T is assembled DENSELY as
  one (C,L,6,3)x(C,L,6,3) einsum — covisible windows are small
  (<= ~100 cams, SURVEY.md §7.3) so the dense system is exactly what the MXU
  wants;
- Huber IRLS with the reference's deltas sqrt(5.991)/sqrt(7.815)
  (`src/Optimizer.cc:522-523,555,584`);
- fixed cameras (the observers outside the window, `src/Optimizer.cc:489-504`)
  enter residuals but get identity rows in the solve;
- the 5-then-10 iteration schedule with inter-phase outlier pruning and an
  abort flag checked between phases mirrors `src/Optimizer.cc:660-717` and
  g2o's `forceStopFlag` semantics.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..geometry import projection, se3
from . import lm


class BAProblem(NamedTuple):
    cam_pose: jax.Array  # (C,4,4) initial Tcw
    cam_fixed: jax.Array  # (C,) bool — pose held constant
    cam_valid: jax.Array  # (C,) bool
    pt_pos: jax.Array  # (L,3) initial world positions
    pt_valid: jax.Array  # (L,) bool
    obs_cam: jax.Array  # (L,O) i32 camera index or -1
    obs_uv: jax.Array  # (L,O,2) undistorted pixels
    obs_ur: jax.Array  # (L,O) right-u, <0 mono
    obs_inv_sigma2: jax.Array  # (L,O)
    obs_valid: jax.Array  # (L,O) bool


class BAResult(NamedTuple):
    cam_pose: jax.Array  # (C,4,4)
    pt_pos: jax.Array  # (L,3)
    obs_inlier: jax.Array  # (L,O) bool — final classification
    chi2: jax.Array  # () total robust chi2


class _Edges(NamedTuple):
    """Edge-major compaction of a BAProblem's valid observations."""

    pt: jax.Array  # (E,) i32 point row
    cam: jax.Array  # (E,) i32 camera index
    lane: jax.Array  # (E,) i32 original O-lane (for writeback)
    uv: jax.Array  # (E,2)
    ur: jax.Array  # (E,)
    inv_sigma2: jax.Array  # (E,)
    ok: jax.Array  # (E,) bool — structurally real edge


def _compact_edges(prob: BAProblem, e_cap: int) -> _Edges:
    L, O = prob.obs_cam.shape
    ok = prob.obs_valid & (prob.obs_cam >= 0) & prob.pt_valid[:, None]
    flat_ok = ok.reshape(-1)
    (eidx,) = jnp.nonzero(flat_ok, size=e_cap, fill_value=L * O)
    real = eidx < L * O
    safe = jnp.where(real, eidx, 0)
    pt = (safe // O).astype(jnp.int32)
    lane = (safe % O).astype(jnp.int32)
    return _Edges(
        pt=jnp.where(real, pt, 0),
        cam=jnp.where(real, prob.obs_cam[pt, lane], 0),
        lane=lane,
        uv=prob.obs_uv[pt, lane],
        ur=prob.obs_ur[pt, lane],
        inv_sigma2=prob.obs_inv_sigma2[pt, lane],
        ok=real,
    )


def _inv3x3(A: jax.Array) -> jax.Array:
    """Closed-form batched 3x3 inverse (adjugate / det) — avoids the
    LU-factorization path of jnp.linalg.inv, which is latency-bound for
    thousands of tiny matrices."""
    a, b, c = A[..., 0, 0], A[..., 0, 1], A[..., 0, 2]
    d, e, f = A[..., 1, 0], A[..., 1, 1], A[..., 1, 2]
    g, h, i = A[..., 2, 0], A[..., 2, 1], A[..., 2, 2]
    A11 = e * i - f * h
    A12 = c * h - b * i
    A13 = b * f - c * e
    A21 = f * g - d * i
    A22 = a * i - c * g
    A23 = c * d - a * f
    A31 = d * h - e * g
    A32 = b * g - a * h
    A33 = a * e - b * d
    det = a * A11 + b * A21 + c * A31
    inv_det = 1.0 / jnp.where(jnp.abs(det) < 1e-20, 1e-20, det)
    adj = jnp.stack([
        jnp.stack([A11, A12, A13], -1),
        jnp.stack([A21, A22, A23], -1),
        jnp.stack([A31, A32, A33], -1),
    ], -2)
    return adj * inv_det[..., None, None]


def _edge_terms_e(cam: projection.Camera, poses: jax.Array, pts: jax.Array,
                  e: _Edges, active: jax.Array):
    """Residuals/Jacobians per compacted edge.

    Returns r (E,3), Jc (E,3,6), Jp (E,3,3), chi2 (E,), ok_z (E,), is_st (E,).
    Third residual row is the stereo uR term (zeroed for mono edges) —
    g2o's `EdgeStereoSE3ProjectXYZ` (`types_six_dof_expmap.h:130-174`).
    """
    T = poses[e.cam]  # (E,4,4)
    R = T[..., :3, :3]
    p = pts[e.pt]  # (E,3)
    p_cam = jnp.einsum("eij,ej->ei", R, p) + T[..., :3, 3]
    z = p_cam[..., 2]
    ok_z = z > 1e-6
    zs = jnp.where(jnp.abs(z) < 1e-9, 1e-9, z)
    u = cam.fx * p_cam[..., 0] / zs + cam.cx
    v = cam.fy * p_cam[..., 1] / zs + cam.cy
    ur = u - cam.bf / zs
    is_st = e.ur >= 0
    r = jnp.stack(
        [
            e.uv[..., 0] - u,
            e.uv[..., 1] - v,
            jnp.where(is_st, e.ur - ur, 0.0),
        ],
        axis=-1,
    )  # (E,3)
    J_proj = lm.proj_jacobian(p_cam, cam.fx, cam.fy)  # (E,2,3)
    zi2 = 1.0 / (zs * zs)
    dur_dp = J_proj[..., 0, :] + jnp.stack(
        [jnp.zeros_like(z), jnp.zeros_like(z), cam.bf * zi2], axis=-1
    )
    dur_dp = jnp.where(is_st[..., None], dur_dp, 0.0)
    A = jnp.concatenate([J_proj, dur_dp[..., None, :]], axis=-2)  # (E,3,3)
    Jc_pt = lm.point_pose_jacobian(p_cam)  # (E,3,6)
    Jc = -jnp.einsum("eij,ejk->eik", A, Jc_pt)
    Jp = -jnp.einsum("eij,ejk->eik", A, R)
    chi2 = jnp.sum(r * r, -1) * e.inv_sigma2
    return r, Jc, Jp, chi2, ok_z, is_st


# Cost charged to an edge the candidate step pushed behind the camera
# (z <= 0). g2o keeps such edges in the chi2 sum with their (huge) flipped
# -projection residuals; masking them out instead would make a divergent
# step look like an improvement (fewer summed edges), so LM would accept
# NaN/garbage poses. A large constant preserves the reject-bad-steps
# property with static shapes.
_BEHIND_PENALTY = 1e7


# ---------------------------------------------------------------------------
# Point-major residual helpers kept for the distributed BA path
# (`parallel/dist_ba.py`), where the (L,O) lane layout shards over the point
# axis without compaction.
# ---------------------------------------------------------------------------


def _edge_terms(cam: projection.Camera, poses: jax.Array, pts: jax.Array,
                prob: BAProblem):
    """Per-lane residuals/Jacobians over the padded (L,O) table.

    Returns r (L,O,3), Jc (L,O,3,6), Jp (L,O,3,3), chi2 (L,O), active, is_st.
    """
    ok = prob.obs_valid & (prob.obs_cam >= 0) & prob.pt_valid[:, None]
    safe_cam = jnp.clip(prob.obs_cam, 0)
    T = poses[safe_cam]  # (L,O,4,4)
    R = T[..., :3, :3]
    p_cam = jnp.einsum("loij,lj->loi", R, pts) + T[..., :3, 3]
    z = p_cam[..., 2]
    ok = ok & (z > 1e-6)
    zs = jnp.where(jnp.abs(z) < 1e-9, 1e-9, z)
    u = cam.fx * p_cam[..., 0] / zs + cam.cx
    v = cam.fy * p_cam[..., 1] / zs + cam.cy
    ur = u - cam.bf / zs
    is_st = prob.obs_ur >= 0
    r = jnp.stack(
        [
            prob.obs_uv[..., 0] - u,
            prob.obs_uv[..., 1] - v,
            jnp.where(is_st, prob.obs_ur - ur, 0.0),
        ],
        axis=-1,
    )
    J_proj = lm.proj_jacobian(p_cam, cam.fx, cam.fy)
    zi2 = 1.0 / (zs * zs)
    dur_dp = J_proj[..., 0, :] + jnp.stack(
        [jnp.zeros_like(z), jnp.zeros_like(z), cam.bf * zi2], axis=-1
    )
    dur_dp = jnp.where(is_st[..., None], dur_dp, 0.0)
    A = jnp.concatenate([J_proj, dur_dp[..., None, :]], axis=-2)
    Jc_pt = lm.point_pose_jacobian(p_cam)
    Jc = -jnp.einsum("loij,lojk->loik", A, Jc_pt)
    Jp = -jnp.einsum("loij,lojk->loik", A, R)
    chi2 = jnp.sum(r * r, -1) * prob.obs_inv_sigma2
    return r, Jc, Jp, chi2, ok, is_st


def _robust_chi2(chi2, is_st, ok, robust):
    delta2 = jnp.where(is_st, lm.CHI2_STEREO, lm.CHI2_MONO)
    d = jnp.sqrt(delta2)
    rho = jnp.where(chi2 <= delta2, chi2,
                    2.0 * d * jnp.sqrt(jnp.maximum(chi2, 0)) - delta2)
    val = jnp.where(robust, rho, chi2)
    return jnp.sum(jnp.where(ok, val, 0.0))


def _accept_cost_e(chi2, is_st, ok_z, active, robust):
    """LM acceptance objective: Huber chi2 over active edges, with invalid
    projections (behind camera) paying a fixed penalty."""
    delta2 = jnp.where(is_st, lm.CHI2_STEREO, lm.CHI2_MONO)
    d = jnp.sqrt(delta2)
    rho = jnp.where(chi2 <= delta2, chi2,
                    2.0 * d * jnp.sqrt(jnp.maximum(chi2, 0)) - delta2)
    val = jnp.where(robust, rho, chi2)
    val = jnp.where(ok_z, val, _BEHIND_PENALTY)
    val = jnp.where(jnp.isfinite(val), val, _BEHIND_PENALTY)
    return jnp.sum(jnp.where(active, val, 0.0))


def _cost_at(cam, poses, pts, e, active, robust):
    _, _, _, chi2, ok_z, is_st = _edge_terms_e(cam, poses, pts, e, active)
    return _accept_cost_e(chi2, is_st, ok_z, active, robust)


def _build_and_solve(cam, poses, pts, prob, e: _Edges, active, robust, lam):
    """One damped LM step: returns (dx_cam (C,6), dx_pt (L,3))."""
    C = prob.cam_pose.shape[0]
    L = prob.pt_pos.shape[0]
    E = e.pt.shape[0]
    r, Jc, Jp, chi2, ok_z, is_st = _edge_terms_e(cam, poses, pts, e, active)
    ok = active & ok_z
    delta2 = jnp.where(is_st, lm.CHI2_STEREO, lm.CHI2_MONO)
    w_rob = jnp.where(robust, lm.huber_weight(chi2, delta2), 1.0)
    w = jnp.where(ok, e.inv_sigma2 * w_rob, 0.0)  # (E,)

    free = prob.cam_valid & ~prob.cam_fixed  # (C,)
    # zero Jc for fixed cameras so they contribute no derivatives
    Jc = jnp.where(free[e.cam][..., None, None], Jc, 0.0)

    # --- per-edge blocks (weighted) ---
    wJp = Jp * w[:, None, None]
    wJc = Jc * w[:, None, None]
    Hpp_e = jnp.einsum("eia,eib->eab", wJp, Jp)  # (E,3,3)
    gp_e = -jnp.einsum("eia,ei->ea", wJp, r)  # (E,3)
    Hcc_e = jnp.einsum("eia,eib->eab", wJc, Jc)  # (E,6,6)
    gc_e = -jnp.einsum("eia,ei->ea", wJc, r)  # (E,6)
    W_e = jnp.einsum("eia,eib->eab", wJc, Jp)  # (E,6,3)

    # --- point-side reductions: small E-row scatters ---
    Hpp = jnp.zeros((L, 3, 3), pts.dtype).at[e.pt].add(Hpp_e)
    gp = jnp.zeros((L, 3), pts.dtype).at[e.pt].add(gp_e)
    pt_w = jnp.zeros((L,), pts.dtype).at[e.pt].add(w)
    pt_has_obs = pt_w > 0

    # damp landmark blocks, invert in closed form (batched 3x3).
    # Marquardt scaling (lam * diag(H)) keeps lam dimensionless: absolute
    # lam*I damping is negligible against fx^2-scale Hessian entries and
    # lets steps run away along the mono scale-gauge nullspace.
    eye3 = jnp.eye(3, dtype=pts.dtype)
    Hpp_diag = jnp.diagonal(Hpp, axis1=-2, axis2=-1)
    Hpp_d = Hpp + eye3 * (lam * Hpp_diag + 1e-8)[..., None]
    Hpp_inv = _inv3x3(jnp.where(pt_has_obs[:, None, None], Hpp_d, eye3[None]))

    # --- camera-side reductions: one-hot matmul on the MXU ---
    onehot = (e.cam[:, None] == jnp.arange(C)[None, :]) & ok[:, None]
    onehot = onehot.astype(pts.dtype)  # (E,C)
    cam_flat = jnp.concatenate(
        [Hcc_e.reshape(E, 36), gc_e], axis=-1
    )  # (E,42)
    red = jnp.einsum("ec,ez->cz", onehot, cam_flat, precision=lm.HI)
    Hcc = red[:, :36].reshape(C, 6, 6)
    gc = red[:, 36:42]

    WHinv_e = jnp.einsum("eab,ebc->eac", W_e, Hpp_inv[e.pt])  # (E,6,3)
    rhs_corr_e = jnp.einsum("eab,eb->ea", WHinv_e, gp[e.pt])  # (E,6)
    rhs_corr = jnp.einsum("ec,ea->ca", onehot, rhs_corr_e, precision=lm.HI)

    # --- Schur off-diagonal: S -= sum_l U_l V_l^T over camera pairs ---
    # U[c,l] = sum_{edges of l at cam c} WHinv_e ; V likewise from W_e.
    mask_e = ok[:, None, None]
    U = jnp.zeros((C, L, 6, 3), pts.dtype).at[e.cam, e.pt].add(
        jnp.where(mask_e, WHinv_e, 0.0)
    )
    V = jnp.zeros((C, L, 6, 3), pts.dtype).at[e.cam, e.pt].add(
        jnp.where(mask_e, W_e, 0.0)
    )
    S = -jnp.einsum("clak,dlbk->cadb", U, V, precision=lm.HI)  # (C,6,C,6)

    idx = jnp.arange(C)
    Hcc_diag = jnp.diagonal(Hcc, axis1=-2, axis2=-1)
    S = S.at[idx, :, idx, :].add(
        Hcc + jnp.eye(6, dtype=pts.dtype) * (lam * Hcc_diag + 1e-8)[..., None]
    )
    rhs = gc - rhs_corr

    # flatten to (6C,6C); fixed/invalid cams -> identity rows
    Sf = S.reshape(C * 6, C * 6)
    mask = jnp.repeat(free, 6)
    Sf = jnp.where(mask[:, None] & mask[None, :], Sf, 0.0)
    Sf = Sf + jnp.diag(jnp.where(mask, 0.0, 1.0))
    rhs_f = jnp.where(mask, rhs.reshape(-1), 0.0)
    dx_cam = jnp.linalg.solve(Sf, rhs_f).reshape(C, 6)
    dx_cam = jnp.where(jnp.isfinite(dx_cam), dx_cam, 0.0)

    # back-substitute landmarks: dx_p = Hpp^-1 (gp - W^T dx_cam)
    Wt_dx_e = jnp.einsum("eab,ea->eb", W_e, dx_cam[e.cam] * ok[..., None])
    Wt_dx = jnp.zeros((L, 3), pts.dtype).at[e.pt].add(Wt_dx_e)
    dx_pt = jnp.einsum("lab,lb->la", Hpp_inv, gp - Wt_dx)
    dx_pt = jnp.where((pt_has_obs & prob.pt_valid)[:, None], dx_pt, 0.0)
    dx_pt = jnp.where(jnp.isfinite(dx_pt), dx_pt, 0.0)
    return dx_cam, dx_pt


def _run_phase(cam, poses, pts, prob, e, active, robust, n_iters, lam0):
    free = (prob.cam_valid & ~prob.cam_fixed)[:, None]
    cur0 = _cost_at(cam, poses, pts, e, active, robust)

    def body(carry, _):
        poses, pts, lam, cur = carry
        dxc, dxp = _build_and_solve(cam, poses, pts, prob, e, active, robust,
                                    lam)
        new_poses = se3.se3_exp(jnp.where(free, dxc, 0.0)) @ poses
        new_pts = pts + dxp
        new = _cost_at(cam, new_poses, new_pts, e, active, robust)
        accept = new < cur
        poses = jnp.where(accept, new_poses, poses)
        pts = jnp.where(accept, new_pts, pts)
        cur = jnp.where(accept, new, cur)
        lam = jnp.clip(jnp.where(accept, lam * 0.5, lam * 5.0), 1e-9, 1e8)
        return (poses, pts, lam, cur), new

    (poses, pts, lam, _), hist = jax.lax.scan(
        body, (poses, pts, lam0, cur0), None, length=n_iters
    )
    return poses, pts, hist


def local_bundle_adjustment(cam: projection.Camera, prob: BAProblem,
                            n_iters_a: int = 5, n_iters_b: int = 10,
                            abort: jax.Array | None = None,
                            e_cap: int | None = None) -> BAResult:
    """The reference schedule: 5 iterations, outlier pruning, 10 more
    (`src/Optimizer.cc:660-717`). `abort` (scalar bool) skips phase B like
    `mbAbortBA` (`src/LocalMapping.cc:118`, checked between LM rounds)."""
    L, O = prob.obs_cam.shape
    if e_cap is None:
        e_cap = min(L * O, max(4096, (L * O) // 8))
    e = _compact_edges(prob, e_cap)
    poses = prob.cam_pose
    pts = prob.pt_pos
    active = e.ok
    lam0 = jnp.asarray(1e-4, pts.dtype)
    poses, pts, _ = _run_phase(cam, poses, pts, prob, e, active,
                               jnp.asarray(True), n_iters_a, lam0)
    # prune: chi2 > gate or behind camera (Optimizer.cc:676-690)
    _, _, _, chi2, ok_z, is_st = _edge_terms_e(cam, poses, pts, e, active)
    gate = jnp.where(is_st, lm.CHI2_STEREO, lm.CHI2_MONO)
    active = active & (chi2 <= gate) & ok_z
    if abort is None:
        abort = jnp.asarray(False)

    def phase_b(args):
        poses, pts = args
        poses, pts, _ = _run_phase(cam, poses, pts, prob, e, active,
                                   jnp.asarray(False), n_iters_b, lam0)
        return poses, pts

    poses, pts = jax.lax.cond(abort, lambda a: a, phase_b, (poses, pts))

    _, _, _, chi2, ok_z, is_st = _edge_terms_e(cam, poses, pts, e, e.ok)
    inlier_e = e.ok & ok_z & (
        chi2 <= jnp.where(is_st, lm.CHI2_STEREO, lm.CHI2_MONO)
    )
    # scatter edge-level inlier classification back to the (L,O) table;
    # padded lanes (never real edges) report NOT-inlier=False but also were
    # never obs_valid, so callers' writeback masks are unaffected.
    inlier = jnp.zeros((L, O), bool).at[e.pt, e.lane].max(inlier_e)
    d = jnp.sqrt(jnp.where(is_st, lm.CHI2_STEREO, lm.CHI2_MONO))
    rho = jnp.where(chi2 <= d * d, chi2,
                    2.0 * d * jnp.sqrt(jnp.maximum(chi2, 0)) - d * d)
    total = jnp.sum(jnp.where(inlier_e, chi2, 0.0))
    del rho
    return BAResult(cam_pose=poses, pt_pos=pts, obs_inlier=inlier, chi2=total)


def global_bundle_adjustment(cam: projection.Camera, prob: BAProblem,
                             n_iters: int = 20,
                             e_cap: int | None = None) -> BAResult:
    """`Optimizer::GlobalBundleAdjustemnt` [sic] parity
    (`src/Optimizer.cc:41-47`): plain 20-iteration robust BA, first camera
    fixed by the caller via cam_fixed."""
    L, O = prob.obs_cam.shape
    if e_cap is None:
        e_cap = min(L * O, max(4096, (L * O) // 8))
    e = _compact_edges(prob, e_cap)
    poses, pts, _ = _run_phase(
        cam, prob.cam_pose, prob.pt_pos, prob, e, e.ok,
        jnp.asarray(True), n_iters, jnp.asarray(1e-4, prob.pt_pos.dtype)
    )
    _, _, _, chi2, ok_z, is_st = _edge_terms_e(cam, poses, pts, e, e.ok)
    inlier_e = e.ok & ok_z & (
        chi2 <= jnp.where(is_st, lm.CHI2_STEREO, lm.CHI2_MONO)
    )
    inlier = jnp.zeros((L, O), bool).at[e.pt, e.lane].max(inlier_e)
    total = jnp.sum(jnp.where(inlier_e, chi2, 0.0))
    return BAResult(cam_pose=poses, pt_pos=pts, obs_inlier=inlier, chi2=total)
