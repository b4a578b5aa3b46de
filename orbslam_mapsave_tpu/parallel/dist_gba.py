"""Distributed full-map bundle adjustment: keyframe-block sharded maps.

The reference is a single-process shared-memory program (SURVEY.md §2.4);
this is the scaling layer BASELINE.json demands: the keyframe TRAJECTORY is
partitioned into per-device blocks (the "sequence-parallel" analog of
SURVEY.md §5.7) and map points are co-sharded with the block that anchors
them. One mesh axis, two co-sharded families:

- camera-major (K, N) edge tables sharded over "blk": every camera-side
  reduction (Hcc, gc, W·z) is LOCAL to the device owning that keyframe
  block — zero communication;
- point-major (P, O) edge tables sharded over "blk": every point-side
  reduction (Hpp, gp, Wᵀx) is local to the device owning that landmark
  block — zero communication;
- the only cross-block traffic per PCG matvec is ONE all-gather of the
  z = Hpp⁻¹Wᵀx vectors (P,3 — hundreds of KB) plus all-gathers of the tiny
  (K,6) camera vectors, riding ICI. The reduced camera system is never
  materialized (same implicit-Schur PCG as optim/global_ba.py).

Multi-host entry: `initialize_distributed()` wires `jax.distributed` from
the standard env (COORDINATOR_ADDRESS/NUM_PROCESSES/PROCESS_ID) so the same
mesh spans pods; block migration between hosts is a resharding device_put
(DCN), queries stay per-host.
"""

from __future__ import annotations

import os
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..geometry import projection, se3
from ..optim import global_ba as gba
from ..optim import lm
from ..slammap import mapstate as ms


def initialize_distributed() -> bool:
    """`jax.distributed.initialize` from the conventional env triplet.

    Returns True when a multi-process runtime was initialized. Single-host
    (env absent) is a no-op — the mesh then spans local devices only.
    """
    addr = os.environ.get("COORDINATOR_ADDRESS")
    if not addr:
        return False
    jax.distributed.initialize(
        coordinator_address=addr,
        num_processes=int(os.environ["NUM_PROCESSES"]),
        process_id=int(os.environ["PROCESS_ID"]),
    )
    return True


def make_mesh(n_devices: int | None = None, axis: str = "blk") -> Mesh:
    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    return Mesh(np.array(devs), (axis,))


def shard_map_state(state: ms.MapState, mesh: Mesh, axis: str = "blk"
                    ) -> ms.MapState:
    """Keyframe-block + landmark-block placement of the SoA map.

    Keyframe-major arrays shard their leading K axis (trajectory blocks);
    point-major arrays shard their leading P axis; scalars replicate. The
    capacities must divide the mesh size (pad capacities to powers of two
    as `empty_map` callers already do).
    """
    kf_sh = NamedSharding(mesh, P(axis))
    rep = NamedSharding(mesh, P())
    K = state.kf_capacity
    P_ = state.pt_capacity

    def place(x):
        if hasattr(x, "shape") and x.ndim >= 1 and x.shape[0] in (K, P_):
            return jax.device_put(x, kf_sh)
        return jax.device_put(x, rep)

    # covis is (K,K): shard rows only
    out = jax.tree.map(place, state)
    return out


def make_distributed_gba(cam: projection.Camera, mesh: Mesh,
                         axis: str = "blk", n_iters: int = 10,
                         robust: bool = False, cg_iters: int = 100,
                         cg_tol: float = 1e-3):
    """Build the pjit/shard_map distributed full-map BA.

    Returns run(tables, kf_pose, pt_pos) -> (kf_pose, pt_pos, cost), where
    `tables` is `optim.global_ba.build_tables(state, ...)` placed via
    `shard_tables`. Poses stay replicated (they are small and every block
    reads all of them); all edge tables are block-sharded.
    """
    from jax import shard_map

    blk = P(axis)
    rep = P()
    nblk = mesh.shape[axis]

    def device_fn(po_cam, po_uv, po_ur, po_is2, po_valid,
                  cm_pt, cm_uv, cm_ur, cm_is2, cm_valid,
                  cam_free, cam_valid, pt_valid_l, poses, pts_l):
        """Per-device body. *_l / cm_* / po_* are the LOCAL blocks; poses
        and cam masks are replicated."""
        robust_flag = jnp.asarray(robust)

        def gather_pts(pts_l):
            return jax.lax.all_gather(pts_l, axis, axis=0, tiled=True)

        def gather_cam(x_l):  # (Kl,6...) -> (K,6...)
            return jax.lax.all_gather(x_l, axis, axis=0, tiled=True)

        def accept_cost(poses, pts_l):
            pose_lane = poses[jnp.clip(po_cam, 0)]
            r, Jc, Jp, chi2, ok_z, is_st = gba._edge_terms(
                cam, pose_lane, pts_l[:, None, :], po_uv, po_ur, po_is2)
            delta2 = jnp.where(is_st, lm.CHI2_STEREO, lm.CHI2_MONO)
            d = jnp.sqrt(delta2)
            rho = jnp.where(chi2 <= delta2, chi2,
                            2.0 * d * jnp.sqrt(jnp.maximum(chi2, 0)) - delta2)
            val = jnp.where(robust_flag, rho, chi2)
            val = jnp.where(ok_z, val, gba._BEHIND_PENALTY)
            val = jnp.where(jnp.isfinite(val), val, gba._BEHIND_PENALTY)
            local = jnp.sum(jnp.where(po_valid, val, 0.0))
            return jax.lax.psum(local, axis)

        def solve_pcg(poses, pts_l, lam):
            pts_full = gather_pts(pts_l)
            # ---- point-major blocks (local landmark block) ----
            pose_lane = poses[jnp.clip(po_cam, 0)]
            r_po, Jc_po, Jp_po, chi2_po, okz_po, st_po = gba._edge_terms(
                cam, pose_lane, pts_l[:, None, :], po_uv, po_ur, po_is2)
            free_lane = cam_free[jnp.clip(po_cam, 0)] & po_valid
            Jc_po = jnp.where(free_lane[..., None, None], Jc_po, 0.0)
            w_po = gba._weights(chi2_po, okz_po, po_valid, po_is2, st_po,
                                robust_flag)
            wJp = Jp_po * w_po[..., None, None]
            wJc = Jc_po * w_po[..., None, None]
            Hpp = jnp.sum(wJp[..., :, :, None] * Jp_po[..., :, None, :],
                          axis=(1, 2))
            gp = -jnp.sum(wJp * r_po[..., None], axis=(1, 2))
            W_po = jnp.sum(wJc[..., :, :, None] * Jp_po[..., :, None, :],
                           axis=-3)
            pt_has = (jnp.sum(w_po, -1) > 0) & pt_valid_l
            eye3 = jnp.eye(3, dtype=pts_l.dtype)
            Hpp_diag = jnp.diagonal(Hpp, axis1=-2, axis2=-1)
            Hpp_d = Hpp + eye3 * (lam * Hpp_diag + 1e-8)[..., None]
            Hpp_inv = lm.inv3x3(
                jnp.where(pt_has[:, None, None], Hpp_d, eye3[None]))
            Hpp_inv = jnp.where(pt_has[:, None, None], Hpp_inv, 0.0)

            # ---- camera-major blocks (local keyframe block) ----
            Kl = cm_pt.shape[0]
            blk_id = jax.lax.axis_index(axis)
            k_off = blk_id * Kl  # global slot of local row 0
            cam_free_l = jax.lax.dynamic_slice_in_dim(cam_free, k_off, Kl)
            poses_l = jax.lax.dynamic_slice_in_dim(poses, k_off, Kl)
            pt_lane_cm = pts_full[jnp.clip(cm_pt, 0)]
            r_cm, Jc_cm, Jp_cm, chi2_cm, okz_cm, st_cm = gba._edge_terms(
                cam, poses_l[:, None], pt_lane_cm, cm_uv, cm_ur, cm_is2)
            free_row = cam_free_l[:, None] & cm_valid
            Jc_cm = jnp.where(free_row[..., None, None], Jc_cm, 0.0)
            w_cm = gba._weights(chi2_cm, okz_cm, cm_valid, cm_is2, st_cm,
                                robust_flag)
            wJc_cm = Jc_cm * w_cm[..., None, None]
            Hcc = jnp.sum(wJc_cm[..., :, :, None] * Jc_cm[..., :, None, :],
                          axis=-3).sum(1)  # (Kl,6,6)
            gc = -jnp.sum(wJc_cm * r_cm[..., None], axis=(1, 2))
            W_cm = jnp.sum(wJc_cm[..., :, :, None] * Jp_cm[..., :, None, :],
                           axis=-3)  # (Kl,N,6,3)

            eye6 = jnp.eye(6, dtype=pts_l.dtype)
            Hcc_diag = jnp.diagonal(Hcc, axis1=-2, axis2=-1)
            Hcc_d = Hcc + eye6 * (lam * Hcc_diag + 1e-8)[..., None]
            Hcc_d = jnp.where(cam_free_l[:, None, None], Hcc_d, eye6[None])

            # Hpp_inv rows needed by the local camera block live on OTHER
            # shards: gather the small (P,3,3) family once per LM step
            Hpp_inv_full = jax.lax.all_gather(Hpp_inv, axis, axis=0,
                                              tiled=True)
            Hinv_cm = Hpp_inv_full[jnp.clip(cm_pt, 0)]

            def matvec(x):  # x (K,6) replicated -> (K,6) replicated
                x_l = jax.lax.dynamic_slice_in_dim(x, k_off, Kl)
                a_l = jnp.sum(Hcc_d * x_l[:, None, :], axis=-1)
                x_lane = x[jnp.clip(po_cam, 0)]
                t = jnp.sum(W_po * x_lane[..., :, None], axis=(1, 2))
                z_l = jnp.sum(Hpp_inv * t[:, None, :], axis=-1)  # (Pl,3)
                z_full = gather_pts(z_l)
                z_lane = z_full[jnp.clip(cm_pt, 0)]
                b_l = jnp.sum(
                    jnp.sum(W_cm * z_lane[..., None, :], axis=-1), axis=1)
                return gather_cam(a_l - b_l)

            gp_z = jnp.sum(Hpp_inv * gp[:, None, :], axis=-1)
            gp_full = gather_pts(gp_z)
            gp_lane = gp_full[jnp.clip(cm_pt, 0)]
            rhs_l = gc - jnp.sum(
                jnp.sum(W_cm * gp_lane[..., None, :], axis=-1), axis=1)
            rhs_l = jnp.where(cam_free_l[:, None], rhs_l, 0.0)
            rhs = gather_cam(rhs_l)

            WHW = jnp.einsum("knab,knbc,kndc->knad", W_cm, Hinv_cm, W_cm,
                             precision=lm.HI)
            S_diag = Hcc_d - jnp.sum(WHW, axis=1)
            S_diag = jnp.where(cam_free_l[:, None, None], S_diag, eye6[None])
            Minv_l = jnp.linalg.inv(S_diag)
            Minv_l = jnp.where(jnp.isfinite(Minv_l), Minv_l, eye6[None])

            def apply_minv(r):
                r_l = jax.lax.dynamic_slice_in_dim(r, k_off, Kl)
                return gather_cam(jnp.sum(Minv_l * r_l[:, None, :], axis=-1))

            K = poses.shape[0]
            rhs_norm = jnp.sqrt(jnp.sum(rhs * rhs))
            tol = cg_tol * jnp.maximum(rhs_norm, 1e-20)
            x0 = jnp.zeros((K, 6), pts_l.dtype)
            r0 = rhs
            z0 = apply_minv(r0)
            rz0 = jnp.sum(r0 * z0)

            def cond(carry):
                i, x, r, p, rz = carry
                return (i < cg_iters) & (jnp.sqrt(jnp.sum(r * r)) > tol)

            def body(carry):
                i, x, r, p, rz = carry
                Ap = matvec(p)
                pAp = jnp.sum(p * Ap)
                alpha = rz / jnp.where(jnp.abs(pAp) < 1e-30, 1e-30, pAp)
                x = x + alpha * p
                r = r - alpha * Ap
                z = apply_minv(r)
                rz_new = jnp.sum(r * z)
                beta = rz_new / jnp.where(jnp.abs(rz) < 1e-30, 1e-30, rz)
                p = z + beta * p
                return i + 1, x, r, p, rz_new

            _, dx_cam, _, _, _ = jax.lax.while_loop(
                cond, body, (0, x0, r0, z0, rz0))
            dx_cam = jnp.where(
                jnp.isfinite(dx_cam) & cam_free[:, None], dx_cam, 0.0)

            dx_lane = dx_cam[jnp.clip(po_cam, 0)]
            Wt_dx = jnp.sum(W_po * dx_lane[..., :, None], axis=(1, 2))
            dx_pt = jnp.sum(Hpp_inv * (gp - Wt_dx)[:, None, :], axis=-1)
            dx_pt = jnp.where((pt_has & pt_valid_l)[:, None], dx_pt, 0.0)
            dx_pt = jnp.where(jnp.isfinite(dx_pt), dx_pt, 0.0)
            return dx_cam, dx_pt

        free = cam_free[:, None]
        cur0 = accept_cost(poses, pts_l)

        def body(carry, _):
            poses, pts_l, lam, cur = carry
            dxc, dxp = solve_pcg(poses, pts_l, lam)
            new_poses = se3.se3_exp(jnp.where(free, dxc, 0.0)) @ poses
            new_pts = pts_l + dxp
            new = accept_cost(new_poses, new_pts)
            accept = new < cur
            poses = jnp.where(accept, new_poses, poses)
            pts_l = jnp.where(accept, new_pts, pts_l)
            cur = jnp.where(accept, new, cur)
            lam = jnp.clip(jnp.where(accept, lam * 0.5, lam * 5.0), 1e-9, 1e8)
            return (poses, pts_l, lam, cur), cur

        (poses, pts_l, _, cost), _ = jax.lax.scan(
            body, (poses, pts_l, jnp.asarray(1e-4, pts_l.dtype), cur0),
            None, length=n_iters)
        poses = se3.orthonormalize(poses)
        return poses, pts_l, cost

    sharded = shard_map(
        device_fn, mesh=mesh,
        in_specs=(blk, blk, blk, blk, blk,  # po_*
                  blk, blk, blk, blk, blk,  # cm_*
                  rep, rep, blk, rep, blk),
        out_specs=(rep, blk, rep),
        check_vma=False,
    )

    @jax.jit
    def run(tb: gba.FullBATables, kf_pose: jax.Array, pt_pos: jax.Array):
        return sharded(
            tb.po_cam, tb.po_uv, tb.po_ur, tb.po_is2, tb.po_valid,
            tb.cm_pt, tb.cm_uv, tb.cm_ur, tb.cm_is2, tb.cm_valid,
            tb.cam_free, tb.cam_valid, tb.pt_valid, kf_pose, pt_pos,
        )

    del nblk
    return run


def shard_tables(tb: gba.FullBATables, mesh: Mesh, axis: str = "blk"
                 ) -> gba.FullBATables:
    """Place the dual-layout edge tables: po_*/cm_*/pt_valid block-sharded,
    camera masks replicated."""
    blk = NamedSharding(mesh, P(axis))
    rep = NamedSharding(mesh, P())
    return gba.FullBATables(
        po_cam=jax.device_put(tb.po_cam, blk),
        po_uv=jax.device_put(tb.po_uv, blk),
        po_ur=jax.device_put(tb.po_ur, blk),
        po_is2=jax.device_put(tb.po_is2, blk),
        po_valid=jax.device_put(tb.po_valid, blk),
        cm_pt=jax.device_put(tb.cm_pt, blk),
        cm_uv=jax.device_put(tb.cm_uv, blk),
        cm_ur=jax.device_put(tb.cm_ur, blk),
        cm_is2=jax.device_put(tb.cm_is2, blk),
        cm_valid=jax.device_put(tb.cm_valid, blk),
        cam_free=jax.device_put(tb.cam_free, rep),
        cam_valid=jax.device_put(tb.cam_valid, rep),
        pt_valid=jax.device_put(tb.pt_valid, blk),
    )


def distributed_full_ba(cam: projection.Camera, state: ms.MapState,
                        inv_level_sigma2, mesh: Mesh, axis: str = "blk",
                        n_iters: int = 10, robust: bool = False,
                        cg_iters: int = 100):
    """End-to-end: build dual-layout tables from the map, shard over the
    mesh, run the distributed GBA. Returns (kf_pose, pt_pos, cost)."""
    tb = gba.build_tables(state, jnp.asarray(inv_level_sigma2))
    tb = shard_tables(tb, mesh, axis)
    run = make_distributed_gba(cam, mesh, axis, n_iters=n_iters,
                               robust=robust, cg_iters=cg_iters)
    return run(tb, state.kf_pose, state.pt_pos)
