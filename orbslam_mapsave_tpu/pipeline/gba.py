"""Global-BA job: snapshot, optimize, propagate corrections forward.

`LoopClosing::RunGlobalBundleAdjustment` parity (`src/LoopClosing.cc:643-786`):
the reference spawns GBA in a 4th thread over a snapshot of the map while
tracking/mapping keep extending it, then — when GBA finishes — walks the
spanning tree to push corrected poses onto keyframes created DURING the run
(`mTcwGBA = Tchildc * parent->mTcwGBA`, `:674-715`) and moves map points
created during the run through their reference keyframe's before/after poses
(`:718-776`).

TPU-native shape: the "thread" is JAX's async dispatch — `launch` enqueues
the jitted full-map BA (optim/global_ba.py) on the device and returns
immediately; the host keeps tracking. `apply` blocks on the result (the
transfer is the synchronization point) and merges it into the CURRENT map
state, propagating to everything allocated after the snapshot. Slot
allocation is monotone (`mapstate.add_keyframe/add_points`), so "created
during GBA" is exactly `slot >= snapshot count` — no id bookkeeping needed.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..geometry import projection, se3
from ..optim import global_ba
from ..slammap import mapstate as ms


class GBAJob:
    """One in-flight global bundle adjustment over a map snapshot."""

    def __init__(self, state: ms.MapState, cam: projection.Camera,
                 inv_level_sigma2, n_iters: int = 10, robust: bool = False,
                 cg_iters: int = 30):
        self.snap_n_kf = int(state.n_kf)
        self.snap_n_pt = int(state.n_pt)
        self.snap_kf_pose = state.kf_pose  # pre-GBA poses (mTcwBefGBA)
        # async dispatch: this returns device futures, not results.
        # cg_iters=25: the block-Jacobi PCG reaches the 1e-3 relative
        # tolerance well under 25 iterations on covisibility-conditioned
        # maps; the 100-iter ceiling only burned time on the serial chip
        self.kf_pose_gba, self.pt_pos_gba, self.cost = (
            global_ba.full_bundle_adjustment(
                cam, state, jnp.asarray(inv_level_sigma2),
                n_iters=n_iters, robust=robust, cg_iters=cg_iters,
            )
        )
        self.aborted = False

    def abort(self):
        """`mbStopGBA` analogue: drop the result (the device work itself is
        already enqueued; we simply never apply it)."""
        self.aborted = True

    def apply(self, state: ms.MapState) -> ms.MapState:
        """Merge the finished GBA into the current (possibly grown) map.

        - keyframes with slot < snapshot: corrected pose directly
          (`pKF->mTcwGBA`, `src/LoopClosing.cc:771` region);
        - keyframes created during the run: spanning-tree propagation
          T_new = (T_old @ T_parent_old^-1) @ T_parent_new (`:697-707`);
        - points with slot < snapshot: corrected position (`:754-758`);
        - points created during the run: moved through their reference
          keyframe's before/after poses (`:760-776`).
        """
        if self.aborted:
            return state
        K = state.kf_capacity
        old_poses = np.asarray(self.snap_kf_pose)
        gba_poses = np.asarray(self.kf_pose_gba)
        cur_poses = np.asarray(state.kf_pose)
        kf_valid = np.asarray(state.kf_valid)
        n_kf_now = int(state.n_kf)

        new_poses = cur_poses.copy()
        covered = np.zeros(K, bool)
        for k in range(min(self.snap_n_kf, K)):
            if kf_valid[k]:
                new_poses[k] = gba_poses[k]
                covered[k] = True
        # propagate to keyframes created during the run, in slot order
        # (a parent is always allocated before its child)
        parent = np.asarray(state.kf_parent)
        for k in range(self.snap_n_kf, n_kf_now):
            if not kf_valid[k]:
                continue
            p = int(parent[k])
            if p < 0 or not covered[p]:
                covered[k] = True  # orphan: keep current pose
                continue
            # T_child_parent from the apply-time chain (the reference reads
            # GetPose() under the map lock at propagation time,
            # LoopClosing.cc:697-707), re-anchored on the corrected parent
            T_cp = cur_poses[k] @ np.linalg.inv(cur_poses[p])
            new_poses[k] = T_cp @ new_poses[p]
            covered[k] = True

        # points: snapshot points take GBA positions; younger points move
        # through their reference KF's before/after pair
        pt_pos = np.asarray(state.pt_pos).copy()
        pt_valid = np.asarray(state.pt_valid)
        gba_pts = np.asarray(self.pt_pos_gba)
        n_pt_now = int(state.n_pt)
        old_cut = min(self.snap_n_pt, pt_pos.shape[0])
        m_old = pt_valid[:old_cut]
        pt_pos[:old_cut][m_old] = gba_pts[:old_cut][m_old]
        if n_pt_now > self.snap_n_pt:
            sl = slice(self.snap_n_pt, n_pt_now)
            refs = np.asarray(state.pt_ref_kf)[sl]
            ok = pt_valid[sl] & (refs >= 0)
            safe = np.clip(refs, 0, K - 1)
            # pre-correction ref pose: the pose the point was built against
            T_ref_old = cur_poses[safe]
            T_ref_new = new_poses[safe]
            p_cam = np.einsum("nij,nj->ni", T_ref_old[:, :3, :3],
                              pt_pos[sl]) + T_ref_old[:, :3, 3]
            Twc = np.linalg.inv(T_ref_new)
            p_new = np.einsum("nij,nj->ni", Twc[:, :3, :3], p_cam) \
                + Twc[:, :3, 3]
            pt_pos[sl] = np.where(ok[:, None], p_new, pt_pos[sl])
        return state._replace(
            kf_pose=jnp.asarray(new_poses.astype(cur_poses.dtype)),
            pt_pos=jnp.asarray(pt_pos.astype(np.asarray(state.pt_pos).dtype)),
        )
