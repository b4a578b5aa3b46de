"""Batched Levenberg-Marquardt bundle adjustment with explicit Schur complement.

TPU-native rebuild of g2o's sparse BA stack (`BlockSolver_6_3` +
`OptimizationAlgorithmLevenberg`, `Thirdparty/g2o/g2o/core/block_solver.hpp`)
as used by `Optimizer::LocalBundleAdjustment` (`src/Optimizer.cc:453-779`) and
`Optimizer::BundleAdjustment` (`src/Optimizer.cc:49-237`):

- landmark blocks Hpp are 3x3 -> inverted in closed form, batched over all
  points at once;
- the reduced camera system S = Hcc - W Hpp^-1 W^T is assembled DENSELY over
  (C,C) 6x6 blocks by one einsum over the point-major observation table
  (each point contributes its O x O camera-pair outer products) — covisible
  windows are small (<= ~100 cams, SURVEY.md §7.3) so the dense system is
  exactly what the MXU wants;
- Huber IRLS with the reference's deltas sqrt(5.991)/sqrt(7.815)
  (`src/Optimizer.cc:522-523,555,584`);
- fixed cameras (the observers outside the window, `src/Optimizer.cc:489-504`)
  enter residuals but get identity rows in the solve;
- the 5-then-10 iteration schedule with inter-phase outlier pruning and an
  abort flag checked between phases mirrors `src/Optimizer.cc:660-717` and
  g2o's `forceStopFlag` semantics.

Problem layout is point-major: (L points) x (O observation lanes), padded
with obs_cam = -1. This matches MapState.pt_obs_* directly.
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


def _edge_terms(cam: projection.Camera, poses: jax.Array, pts: jax.Array,
                prob: BAProblem):
    """Per-observation residuals/Jacobians.

    Returns r (L,O,3), Jc (L,O,3,6), Jp (L,O,3,3), chi2 (L,O), active mask.
    Third residual row is the stereo uR term (zeroed for mono edges).
    """
    L, O = prob.obs_cam.shape
    ok = prob.obs_valid & (prob.obs_cam >= 0) & prob.pt_valid[:, None]
    safe_cam = jnp.clip(prob.obs_cam, 0)
    T = poses[safe_cam]  # (L,O,4,4)
    R = T[..., :3, :3]
    p_cam = jnp.einsum("loij,lj->loi", R, pts, precision=lm.HI) + T[..., :3, 3]
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
    )  # (L,O,3)
    J_proj = lm.proj_jacobian(p_cam, cam.fx, cam.fy)  # (L,O,2,3)
    zi2 = 1.0 / (zs * zs)
    dur_dp = J_proj[..., 0, :] + jnp.stack(
        [jnp.zeros_like(z), jnp.zeros_like(z), cam.bf * zi2], axis=-1
    )
    dur_dp = jnp.where(is_st[..., None], dur_dp, 0.0)
    A = jnp.concatenate([J_proj, dur_dp[..., None, :]], axis=-2)  # (L,O,3,3) d(h)/dPcam
    Jc_pt = lm.point_pose_jacobian(p_cam)  # (L,O,3,6)
    Jc = -jnp.einsum("loij,lojk->loik", A, Jc_pt, precision=lm.HI)  # (L,O,3,6)
    Jp = -jnp.einsum("loij,lojk->loik", A, R, precision=lm.HI)  # (L,O,3,3)
    chi2 = jnp.sum(r * r, -1) * prob.obs_inv_sigma2
    return r, Jc, Jp, chi2, ok, is_st


def _robust_chi2(chi2, is_st, ok, robust):
    delta2 = jnp.where(is_st, lm.CHI2_STEREO, lm.CHI2_MONO)
    # Huber rho(s) = s if s<=d2 else 2*d*sqrt(s)-d2
    d = jnp.sqrt(delta2)
    rho = jnp.where(chi2 <= delta2, chi2, 2.0 * d * jnp.sqrt(jnp.maximum(chi2, 0)) - delta2)
    val = jnp.where(robust, rho, chi2)
    return jnp.sum(jnp.where(ok, val, 0.0))


# Cost charged to an edge the candidate step pushed behind the camera
# (z <= 0). g2o keeps such edges in the chi2 sum with their (huge) flipped
# -projection residuals; masking them out instead would make a divergent
# step look like an improvement (fewer summed edges), so LM would accept
# NaN/garbage poses. A large constant preserves the reject-bad-steps
# property with static shapes.
_BEHIND_PENALTY = 1e7


def _accept_cost(chi2, is_st, ok_struct, ok_z, active, robust):
    """LM acceptance objective: Huber chi2 over structurally-active edges,
    with invalid projections (behind camera) paying a fixed penalty."""
    delta2 = jnp.where(is_st, lm.CHI2_STEREO, lm.CHI2_MONO)
    d = jnp.sqrt(delta2)
    rho = jnp.where(chi2 <= delta2, chi2,
                    2.0 * d * jnp.sqrt(jnp.maximum(chi2, 0)) - delta2)
    val = jnp.where(robust, rho, chi2)
    val = jnp.where(ok_z, val, _BEHIND_PENALTY)
    val = jnp.where(jnp.isfinite(val), val, _BEHIND_PENALTY)
    return jnp.sum(jnp.where(active & ok_struct, val, 0.0))


def _schur_offdiag(WHinv, W, safe_cam, C, dtype, chunk: int = 1024):
    """Off-diagonal Schur sum  S_pair[(c,a),(d,b)] = sum_l U_l V_l^T  where
    U_l[(c,a),k] = sum_o [cam(l,o)=c] WHinv[l,o,a,k]  (and V from W).

    Scatters per-point rows into dense (C,6,chunk,3) operands and contracts
    them on the MXU, chunked over points. This avoids materializing the
    (L,O,O,6,6) camera-pair tensor + L*O*O scatter of the naive formulation,
    which OOMs 16GB HBM at L=4096, O=32.
    """
    L, O = safe_cam.shape
    chunk = min(L, chunk)
    pad = (-L) % chunk
    if pad:
        WHinv = jnp.pad(WHinv, ((0, pad), (0, 0), (0, 0), (0, 0)))
        W = jnp.pad(W, ((0, pad), (0, 0), (0, 0), (0, 0)))
        safe_cam = jnp.pad(safe_cam, ((0, pad), (0, 0)))
    n = (L + pad) // chunk
    WHinv = WHinv.reshape(n, chunk, O, 6, 3)
    W = W.reshape(n, chunk, O, 6, 3)
    safe_cam = safe_cam.reshape(n, chunk, O)
    li = jnp.broadcast_to(jnp.arange(chunk)[:, None], (chunk, O)).reshape(-1)

    def body(S, inp):
        whinv, w_, sc = inp
        ci = sc.reshape(-1)
        U = jnp.zeros((C, chunk, 6, 3), whinv.dtype).at[ci, li].add(
            whinv.reshape(-1, 6, 3))
        V = jnp.zeros((C, chunk, 6, 3), w_.dtype).at[ci, li].add(
            w_.reshape(-1, 6, 3))
        S = S + jnp.einsum("clak,dlbk->cadb", U, V, precision=lm.HI)
        return S, None

    S0 = jnp.zeros((C, 6, C, 6), dtype)
    S, _ = jax.lax.scan(body, S0, (WHinv, W, safe_cam))
    return S  # (C,6,C,6)


def _build_and_solve(cam, poses, pts, prob, active, robust, lam):
    """One damped LM step: returns (dx_cam (C,6), dx_pt (L,3))."""
    C = prob.cam_pose.shape[0]
    L, O = prob.obs_cam.shape
    r, Jc, Jp, chi2, ok, is_st = _edge_terms(cam, poses, pts, prob)
    ok = ok & active
    delta2 = jnp.where(is_st, lm.CHI2_STEREO, lm.CHI2_MONO)
    w_rob = jnp.where(robust, lm.huber_weight(chi2, delta2), 1.0)
    w = jnp.where(ok, prob.obs_inv_sigma2 * w_rob, 0.0)  # (L,O)

    free = prob.cam_valid & ~prob.cam_fixed  # (C,)
    # zero Jc for fixed cameras so they contribute no derivatives
    Jc = jnp.where(free[jnp.clip(prob.obs_cam, 0)][..., None, None], Jc, 0.0)

    # --- blocks ---
    Hpp = jnp.einsum("loia,lo,loib->lab", Jp, w, Jp, precision=lm.HI)  # (L,3,3)
    gp = -jnp.einsum("loia,lo,loi->la", Jp, w, r, precision=lm.HI)  # (L,3)
    Hcc_diag_e = jnp.einsum("loia,lo,loib->loab", Jc, w, Jc, precision=lm.HI)
    gc_e = -jnp.einsum("loia,lo,loi->loa", Jc, w, r, precision=lm.HI)
    W = jnp.einsum("loia,lo,loib->loab", Jc, w, Jp, precision=lm.HI)  # (L,O,6,3)

    # damp landmark blocks, invert in closed form (batched 3x3).
    # Marquardt scaling (lam * diag(H)) keeps lam dimensionless: absolute
    # lam*I damping is negligible against fx^2-scale Hessian entries and
    # lets steps run away along the mono scale-gauge nullspace.
    eye3 = jnp.eye(3, dtype=pts.dtype)
    Hpp_diag = jnp.diagonal(Hpp, axis1=-2, axis2=-1)  # (L,3)
    Hpp_d = Hpp + eye3 * (lam * Hpp_diag + 1e-8)[..., None]
    pt_has_obs = jnp.sum(w, -1) > 0
    Hpp_inv = jnp.linalg.inv(
        jnp.where(pt_has_obs[:, None, None], Hpp_d, eye3[None])
    )

    # reduced camera system: S (C,C,6,6), rhs (C,6)
    safe_cam = jnp.clip(prob.obs_cam, 0)
    Hcc = jnp.zeros((C, 6, 6), pts.dtype).at[safe_cam.reshape(-1)].add(
        Hcc_diag_e.reshape(L * O, 6, 6)
    )
    gc = jnp.zeros((C, 6), pts.dtype).at[safe_cam.reshape(-1)].add(
        gc_e.reshape(L * O, 6)
    )
    WHinv = jnp.einsum("loab,lbc->loac", W, Hpp_inv, precision=lm.HI)  # (L,O,6,3)
    rhs_corr = jnp.einsum("loab,lb->loa", WHinv, gp, precision=lm.HI)  # (L,O,6)

    S = -_schur_offdiag(WHinv, W, safe_cam, C, pts.dtype)  # (C,6,C,6)
    idx = jnp.arange(C)
    Hcc_diag = jnp.diagonal(Hcc, axis1=-2, axis2=-1)  # (C,6)
    S = S.at[idx, :, idx, :].add(
        Hcc + jnp.eye(6, dtype=pts.dtype) * (lam * Hcc_diag + 1e-8)[..., None]
    )
    rhs = gc - jnp.zeros((C, 6), pts.dtype).at[safe_cam.reshape(-1)].add(
        rhs_corr.reshape(L * O, 6)
    )

    # flatten to (6C,6C); fixed/invalid cams -> identity rows
    Sf = S.reshape(C * 6, C * 6)
    mask = jnp.repeat(free, 6)
    Sf = jnp.where(mask[:, None] & mask[None, :], Sf, 0.0)
    Sf = Sf + jnp.diag(jnp.where(mask, 0.0, 1.0))
    rhs_f = jnp.where(mask, rhs.reshape(-1), 0.0)
    dx_cam = jnp.linalg.solve(Sf, rhs_f).reshape(C, 6)
    dx_cam = jnp.where(jnp.isfinite(dx_cam), dx_cam, 0.0)

    # back-substitute landmarks: dx_p = Hpp^-1 (gp - W^T dx_cam)
    Wt_dx = jnp.einsum(
        "loab,loa->lb", W, dx_cam[safe_cam] * ok[..., None], precision=lm.HI
    )
    dx_pt = jnp.einsum("lab,lb->la", Hpp_inv, gp - Wt_dx, precision=lm.HI)
    dx_pt = jnp.where((pt_has_obs & prob.pt_valid)[:, None], dx_pt, 0.0)
    dx_pt = jnp.where(jnp.isfinite(dx_pt), dx_pt, 0.0)
    return dx_cam, dx_pt


def _run_phase(cam, poses, pts, prob, active, robust, n_iters, lam0):
    ok_struct = prob.obs_valid & (prob.obs_cam >= 0) & prob.pt_valid[:, None]

    def body(carry, _):
        poses, pts, lam = carry
        _, _, _, chi2_e, ok, is_st = _edge_terms(cam, poses, pts, prob)
        cur = _accept_cost(chi2_e, is_st, ok_struct, ok, active, robust)
        dxc, dxp = _build_and_solve(cam, poses, pts, prob, active, robust, lam)
        free = (prob.cam_valid & ~prob.cam_fixed)[:, None]
        new_poses = se3.se3_exp(jnp.where(free, dxc, 0.0)) @ poses
        new_pts = pts + dxp
        _, _, _, chi2_n, ok_n, is_st_n = _edge_terms(cam, new_poses, new_pts, prob)
        new = _accept_cost(chi2_n, is_st_n, ok_struct, ok_n, active, robust)
        accept = new < cur
        poses = jnp.where(accept, new_poses, poses)
        pts = jnp.where(accept, new_pts, pts)
        lam = jnp.clip(jnp.where(accept, lam * 0.5, lam * 5.0), 1e-9, 1e8)
        return (poses, pts, lam), new

    (poses, pts, lam), hist = jax.lax.scan(
        body, (poses, pts, lam0), None, length=n_iters
    )
    return poses, pts, hist


def local_bundle_adjustment(cam: projection.Camera, prob: BAProblem,
                            n_iters_a: int = 5, n_iters_b: int = 10,
                            abort: jax.Array | None = None) -> BAResult:
    """The reference schedule: 5 iterations, outlier pruning, 10 more
    (`src/Optimizer.cc:660-717`). `abort` (scalar bool) skips phase B like
    `mbAbortBA` (`src/LocalMapping.cc:118`, checked between LM rounds)."""
    poses = prob.cam_pose
    pts = prob.pt_pos
    active = prob.obs_valid
    lam0 = jnp.asarray(1e-4, pts.dtype)
    poses, pts, _ = _run_phase(cam, poses, pts, prob, active,
                               jnp.asarray(True), n_iters_a, lam0)
    # prune: chi2 > gate or behind camera (Optimizer.cc:676-690)
    _, _, _, chi2, ok, is_st = _edge_terms(cam, poses, pts, prob)
    gate = jnp.where(is_st, lm.CHI2_STEREO, lm.CHI2_MONO)
    active = active & (chi2 <= gate) & ok
    if abort is None:
        abort = jnp.asarray(False)

    poses_b, pts_b, _ = _run_phase(cam, poses, pts, prob, active,
                                   jnp.asarray(False), n_iters_b, lam0)
    poses = jnp.where(abort, poses, poses_b)
    pts = jnp.where(abort, pts, pts_b)

    _, _, _, chi2, ok, is_st = _edge_terms(cam, poses, pts, prob)
    inlier = prob.obs_valid & ok & (chi2 <= jnp.where(is_st, lm.CHI2_STEREO, lm.CHI2_MONO))
    total = _robust_chi2(chi2, is_st, inlier, jnp.asarray(False))
    return BAResult(cam_pose=poses, pt_pos=pts, obs_inlier=inlier, chi2=total)


def global_bundle_adjustment(cam: projection.Camera, prob: BAProblem,
                             n_iters: int = 20) -> BAResult:
    """`Optimizer::GlobalBundleAdjustemnt` [sic] parity
    (`src/Optimizer.cc:41-47`): plain 20-iteration robust BA, first camera
    fixed by the caller via cam_fixed."""
    poses, pts, _ = _run_phase(
        cam, prob.cam_pose, prob.pt_pos, prob, prob.obs_valid,
        jnp.asarray(True), n_iters, jnp.asarray(1e-4, prob.pt_pos.dtype)
    )
    _, _, _, chi2, ok, is_st = _edge_terms(cam, poses, pts, prob)
    inlier = prob.obs_valid & ok & (
        chi2 <= jnp.where(is_st, lm.CHI2_STEREO, lm.CHI2_MONO)
    )
    total = _robust_chi2(chi2, is_st, inlier, jnp.asarray(False))
    return BAResult(cam_pose=poses, pt_pos=pts, obs_inlier=inlier, chi2=total)
