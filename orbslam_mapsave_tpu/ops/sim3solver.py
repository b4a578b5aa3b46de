"""Closed-form Sim3 between point sets (Horn 1987) + batched RANSAC.

`Sim3Solver` parity (`src/Sim3Solver.cc`, SURVEY.md §2.1): 3-point minimal
sets; rotation from the max-eigenvalue eigenvector of Horn's 4x4 N matrix
(`ComputeSim3`, `Sim3Solver.cc:226-337`: M = Pr2 Pr1^T, N from M), scale =
sum(Pr2 . R Pr1)/sum(|R Pr1|^2) (`:292-309`), optional fixed scale (stereo/
RGB-D loop closing, `LoopClosing.cc:276` passes mbFixScale), RANSAC with
BOTH-direction pixel reprojection gates chi2 9.210 * sigma^2 per octave
(`CheckInliers`, `Sim3Solver.cc:340-365`). All hypotheses solved as one
batch (SURVEY.md §7.3) with the reference's acceptance gates.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from ..geometry import se3
from ..optim import lm as lm_mod

CHI2_SIM3 = 9.210  # Sim3Solver ctor per-scale threshold


def horn_sim3(p1: jax.Array, p2: jax.Array, w: jax.Array,
              fix_scale: bool = False):
    """Batched Horn alignment: find s,R,t with p2 ~ s R p1 + t.

    p1,p2: (B,n,3); w: (B,n) weights/mask. Returns S12? No — returns the
    transform taking frame-1 coords to frame-2 coords as a Sim3 matrix
    (B,4,4) with sR in the rotation block (g2o::Sim3 layout).
    """
    wn = w / jnp.maximum(jnp.sum(w, -1, keepdims=True), 1e-9)
    o1 = jnp.einsum("bn,bni->bi", wn, p1, precision=lm_mod.HI)
    o2 = jnp.einsum("bn,bni->bi", wn, p2, precision=lm_mod.HI)
    pr1 = (p1 - o1[:, None]) * w[..., None]
    pr2 = (p2 - o2[:, None]) * w[..., None]
    M = jnp.einsum("bni,bnj->bij", pr2, pr1, precision=lm_mod.HI)  # (B,3,3)
    # Horn's N matrix (Sim3Solver.cc:247-265)
    Sxx, Sxy, Sxz = M[..., 0, 0], M[..., 0, 1], M[..., 0, 2]
    Syx, Syy, Syz = M[..., 1, 0], M[..., 1, 1], M[..., 1, 2]
    Szx, Szy, Szz = M[..., 2, 0], M[..., 2, 1], M[..., 2, 2]
    N11 = Sxx + Syy + Szz
    N12 = Syz - Szy
    N13 = Szx - Sxz
    N14 = Sxy - Syx
    N22 = Sxx - Syy - Szz
    N23 = Sxy + Syx
    N24 = Szx + Sxz
    N33 = -Sxx + Syy - Szz
    N34 = Syz + Szy
    N44 = -Sxx - Syy + Szz
    N = jnp.stack([
        jnp.stack([N11, N12, N13, N14], -1),
        jnp.stack([N12, N22, N23, N24], -1),
        jnp.stack([N13, N23, N33, N34], -1),
        jnp.stack([N14, N24, N34, N44], -1),
    ], -2)
    evals, evecs = jnp.linalg.eigh(N)  # ascending
    q = evecs[..., -1]  # max eigenvalue -> quaternion (w,x,y,z)
    # Horn's N with M = pr2 pr1^T yields the quaternion whose CONJUGATE
    # rotates frame-1 residuals onto frame-2 under our (x,y,z,w)
    # quat_to_rot convention — conjugate = negate the vector part.
    R = se3.quat_to_rot(jnp.concatenate([-q[..., 1:4], q[..., 0:1]], -1))
    p3 = jnp.einsum("bij,bnj->bni", R, pr1, precision=lm_mod.HI)
    if fix_scale:
        s = jnp.ones(p1.shape[0], p1.dtype)
    else:
        num = jnp.sum(pr2 * p3, axis=(-1, -2))
        den = jnp.sum(p3 * p3, axis=(-1, -2))
        s = num / jnp.maximum(den, 1e-12)
    t = o2 - s[:, None] * jnp.einsum("bij,bj->bi", R, o1, precision=lm_mod.HI)
    return se3.sim3_make(s, R, t)


def _project_pix(pts_cam, fx, fy, cx, cy):
    z = jnp.where(jnp.abs(pts_cam[..., 2]) < 1e-9, 1e-9, pts_cam[..., 2])
    return jnp.stack(
        [fx * pts_cam[..., 0] / z + cx, fy * pts_cam[..., 1] / z + cy], -1
    ), pts_cam[..., 2]


@partial(jax.jit, static_argnums=(5, 6))
def ransac_sim3(key: jax.Array, pc1: jax.Array, pc2: jax.Array,
                uv1: jax.Array, uv2: jax.Array, n_hyp: int = 300,
                fix_scale: bool = False, max_err1: jax.Array | None = None,
                max_err2: jax.Array | None = None, valid: jax.Array | None = None,
                fx: float = 1.0, fy: float = 1.0, cx: float = 0.0, cy: float = 0.0,
                min_inliers: int = 20):
    """Batched RANSAC over 3-point Horn hypotheses.

    pc1/pc2: (M,3) matched points in CAMERA coords of KF1/KF2 (the reference
    transforms map points into each camera frame first, `Sim3Solver.cc:88-92`).
    uv1/uv2: (M,2) observed pixels in each image. Gates: squared pixel error
    per match (9.210 * sigma^2; pass via max_err1/2). Returns
    (S12 (4,4) Sim3, inliers (M,), n_inliers, ok).
    """
    M = pc1.shape[0]
    if valid is None:
        valid = jnp.ones(M, bool)
    if max_err1 is None:
        max_err1 = jnp.full(M, CHI2_SIM3, pc1.dtype)
    if max_err2 is None:
        max_err2 = jnp.full(M, CHI2_SIM3, pc1.dtype)
    p = valid.astype(jnp.float32)
    p = p / jnp.maximum(p.sum(), 1)
    keys = jax.random.split(key, n_hyp)
    idx = jax.vmap(lambda k: jax.random.choice(k, M, (3,), replace=False, p=p))(keys)
    S12 = horn_sim3(pc2[idx], pc1[idx], jnp.ones((n_hyp, 3), pc1.dtype),
                    fix_scale=fix_scale)  # maps cam2 -> cam1 coords
    S21 = se3.sim3_inv(S12)
    # check both directions in pixels (CheckInliers, Sim3Solver.cc:340-365)
    p2in1 = jnp.einsum("bij,nj->bni", S12[:, :3, :3], pc2,
                       precision=lm_mod.HI) + S12[:, None, :3, 3]
    p1in2 = jnp.einsum("bij,nj->bni", S21[:, :3, :3], pc1,
                       precision=lm_mod.HI) + S21[:, None, :3, 3]
    pr1, z1 = _project_pix(p2in1, fx, fy, cx, cy)
    pr2, z2 = _project_pix(p1in2, fx, fy, cx, cy)
    e1 = jnp.sum((pr1 - uv1[None]) ** 2, -1)
    e2 = jnp.sum((pr2 - uv2[None]) ** 2, -1)
    inl = valid[None] & (e1 < max_err1[None]) & (e2 < max_err2[None])
    counts = jnp.sum(inl.astype(jnp.int32), -1)
    best = jnp.argmax(counts)
    # refine best on inliers with a full Horn solve
    w_ref = jnp.where(inl[best], 1.0, 0.0)[None]
    S12r = horn_sim3(pc2[None], pc1[None], w_ref, fix_scale=fix_scale)[0]
    S21r = se3.sim3_inv(S12r)
    p2in1r = se3.sim3_transform_points(S12r, pc2)
    p1in2r = se3.sim3_transform_points(S21r, pc1)
    pr1r, _ = _project_pix(p2in1r, fx, fy, cx, cy)
    pr2r, _ = _project_pix(p1in2r, fx, fy, cx, cy)
    e1r = jnp.sum((pr1r - uv1) ** 2, -1)
    e2r = jnp.sum((pr2r - uv2) ** 2, -1)
    inl_r = valid & (e1r < max_err1) & (e2r < max_err2)
    n_r = jnp.sum(inl_r.astype(jnp.int32))
    use_r = n_r >= counts[best]
    S_out = jnp.where(use_r, S12r, S12[best])
    inl_out = jnp.where(use_r, inl_r, inl[best])
    n_out = jnp.maximum(n_r, counts[best])
    return S_out, inl_out, n_out, n_out >= min_inliers
