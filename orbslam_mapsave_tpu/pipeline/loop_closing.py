"""Loop detection and correction.

`LoopClosing` thread parity (`src/LoopClosing.cc`, SURVEY.md §3.4), as host
orchestration over jitted kernels:

- `DetectLoop` (`:104-230`): 10-KF refractory period (`:115`), minScore =
  min BoW score over the query's covisibles (`:125-139`), database
  candidates (vocab/database.py), covisibility-consistency chaining with
  threshold 3 (`:153-226`, `mnCovisibilityConsistencyTh` `:43`);
- `ComputeSim3` (`:232-401`): >= 20 descriptor matches (`:268`), RANSAC
  Sim3 (ops/sim3solver.py, 300 hyp, fix_scale for stereo/RGB-D),
  `OptimizeSim3` >= 20 inliers (`:327-331`), neighbourhood projection
  search accepting >= 40 total (`:386`);
- `CorrectLoop` (`:403-583`): Sim3 propagation to the covisible window
  (`:436-467`), point re-mapping (`:469-499`), fuse, essential-graph
  optimization (optim/pose_graph.py), then global BA (the reference spawns
  a thread `:571-575`; here it runs bounded in-line).
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from ..geometry import projection, se3
from ..ops import hamming, matching, sim3solver
from ..optim import local_ba, pose_graph, sim3_opt
from ..slammap import mapstate as ms
from ..vocab import database, vocabulary

CONSISTENCY_TH = 3  # LoopClosing.cc:43
REFRACTORY_KFS = 10  # LoopClosing.cc:115


@dataclasses.dataclass
class LoopEvent:
    query_kf: int
    match_kf: int
    n_inliers: int


class LoopCloser:
    """Host driver for loop closing; `process(state, kf)` is the Run-loop
    body (`src/LoopClosing.cc:58-89`)."""

    def __init__(self, cam: projection.Camera, inv_level_sigma2,
                 voc: vocabulary.Vocabulary | None,
                 fix_scale: bool = True, enable_gba: bool = True,
                 gba_iters: int = 10):
        self.cam = cam
        self.voc = voc
        self.fix_scale = fix_scale
        self.enable_gba = enable_gba
        self.gba_iters = gba_iters
        self.inv_level_sigma2 = jnp.asarray(inv_level_sigma2)
        self.level_sigma2 = 1.0 / self.inv_level_sigma2
        self.bow_store = None
        self.transform = None
        if voc is not None:
            self.transform = vocabulary.make_transform(voc)
        self.last_loop_kf = -REFRACTORY_KFS - 1
        self.consistent_groups: list[tuple[set, int]] = []
        self.events: list[LoopEvent] = []

    # -- BoW bookkeeping ---------------------------------------------------
    def _ensure_store(self, state: ms.MapState):
        if self.bow_store is None and self.voc is not None:
            self.bow_store = database.empty_bow_store(
                state.kf_capacity, self.voc.n_words
            )

    def compute_bow(self, state: ms.MapState, kf: int):
        bits = hamming.unpack_bits(state.kf_desc[kf])
        out = self.transform(bits, state.kf_kp_valid[kf])
        return vocabulary.bow_vector(out["word"], out["weight"],
                                     self.voc.n_words)

    # -- main entry --------------------------------------------------------
    def process(self, state: ms.MapState, kf: int) -> ms.MapState:
        if self.voc is None:
            return state
        self._ensure_store(state)
        bow = self.compute_bow(state, kf)
        self.bow_store = database.add_keyframe_bow(self.bow_store, kf, bow)
        if kf - self.last_loop_kf < REFRACTORY_KFS or int(state.n_kf) < 12:
            return state
        cand = self._detect_loop(state, kf, bow)
        if cand is None:
            return state
        result = self._compute_sim3(state, kf, cand)
        if result is None:
            return state
        S_cur_loop, match_kf, n_inl = result
        self.events.append(LoopEvent(kf, match_kf, n_inl))
        self.last_loop_kf = kf
        self.consistent_groups.clear()
        return self._correct_loop(state, kf, match_kf, S_cur_loop)

    # -- DetectLoop --------------------------------------------------------
    def _detect_loop(self, state: ms.MapState, kf: int, bow) -> int | None:
        covis = np.asarray(ms.covisible_keyframes(state, kf, 30))
        covis = covis[covis >= 0]
        if len(covis) == 0:
            return None
        scores = np.asarray(
            vocabulary.score_l1(bow, self.bow_store[jnp.asarray(covis)])
        )
        min_score = float(scores.min()) if len(scores) else 0.0
        keep, all_scores = database.detect_loop_candidates(
            self.bow_store, state, bow, jnp.asarray(kf),
            jnp.asarray(min_score, jnp.float32),
        )
        cand_slots = np.nonzero(np.asarray(keep))[0]
        if len(cand_slots) == 0:
            self.consistent_groups.clear()
            return None
        # consistency chaining (LoopClosing.cc:153-226)
        covis_np = np.asarray(state.covis)
        new_groups: list[tuple[set, int]] = []
        enough: list[int] = []
        for c in cand_slots:
            group = {int(c)} | {
                int(x) for x in np.nonzero(covis_np[c] > 0)[0]
            }
            consistency = 0
            for prev_group, prev_count in self.consistent_groups:
                if group & prev_group:
                    consistency = max(consistency, prev_count + 1)
            new_groups.append((group, consistency))
            if consistency >= CONSISTENCY_TH:
                enough.append(int(c))
        self.consistent_groups = new_groups
        if not enough:
            return None
        # strongest candidate by raw score
        s = np.asarray(all_scores)
        return int(max(enough, key=lambda c: s[c]))

    # -- ComputeSim3 -------------------------------------------------------
    def _compute_sim3(self, state: ms.MapState, kf: int, cand: int):
        b1 = hamming.unpack_bits(state.kf_desc[kf])
        b2 = hamming.unpack_bits(state.kf_desc[cand])
        pts1 = state.kf_kp_point[kf]
        pts2 = state.kf_kp_point[cand]
        ok1 = state.kf_kp_valid[kf] & (pts1 >= 0)
        ok2 = state.kf_kp_valid[cand] & (pts2 >= 0)
        matches, n = matching.search_by_descriptor(
            b1, ok1, b2, ok2,
            state.kf_kp_angle[kf], state.kf_kp_angle[cand],
            th=hamming.TH_LOW, nn_ratio=0.75,
        )
        if int(n) < 20:  # LoopClosing.cc:268
            return None
        m = np.asarray(matches)
        sel1 = np.nonzero(m >= 0)[0]
        sel2 = m[sel1]
        p1_ids = np.asarray(pts1)[sel1]
        p2_ids = np.asarray(pts2)[sel2]
        T1 = state.kf_pose[kf]
        T2 = state.kf_pose[cand]
        pw1 = state.pt_pos[jnp.asarray(p1_ids)]
        pw2 = state.pt_pos[jnp.asarray(p2_ids)]
        pc1 = se3.transform_points(T1, pw1)
        pc2 = se3.transform_points(T2, pw2)
        uv1 = state.kf_kp_xy[kf][jnp.asarray(sel1)]
        uv2 = state.kf_kp_xy[cand][jnp.asarray(sel2)]
        oct1 = np.asarray(state.kf_kp_octave[kf])[sel1]
        oct2 = np.asarray(state.kf_kp_octave[cand])[sel2]
        ls2 = np.asarray(self.level_sigma2)
        me1 = jnp.asarray(sim3solver.CHI2_SIM3 * ls2[np.clip(oct1, 0, len(ls2) - 1)],
                          jnp.float32)
        me2 = jnp.asarray(sim3solver.CHI2_SIM3 * ls2[np.clip(oct2, 0, len(ls2) - 1)],
                          jnp.float32)
        S12, inl, n_inl, ok = sim3solver.ransac_sim3(
            jax.random.PRNGKey(kf), pc1, pc2, uv1, uv2, 300, self.fix_scale,
            max_err1=me1, max_err2=me2,
            fx=self.cam.fx, fy=self.cam.fy, cx=self.cam.cx, cy=self.cam.cy,
            min_inliers=20,
        )
        if not bool(ok):
            return None
        obs = sim3_opt.Sim3Obs(
            pc1=pc1, pc2=pc2, uv1=uv1, uv2=uv2,
            inv_sigma2_1=jnp.asarray(1.0 / ls2[np.clip(oct1, 0, len(ls2) - 1)],
                                     jnp.float32),
            inv_sigma2_2=jnp.asarray(1.0 / ls2[np.clip(oct2, 0, len(ls2) - 1)],
                                     jnp.float32),
            valid=inl,
        )
        S12_opt, inl2, n2 = sim3_opt.optimize_sim3(
            self.cam, S12, obs, self.fix_scale
        )
        if int(n2) < 20:  # LoopClosing.cc:327-331
            return None
        # widen: project the loop KF's neighbourhood points into the current
        # KF through S12 and count total matches (accept >= 40, :386)
        total = self._count_neighbourhood_matches(state, kf, cand, S12_opt)
        if total < 40:
            return None
        return S12_opt, cand, int(n2)

    def _count_neighbourhood_matches(self, state, kf, cand, S12) -> int:
        """`SearchByProjection(Scw)` approximation (`src/ORBmatcher.cc:293-406`):
        gather the loop neighbourhood's points, map into the current camera
        via S12, projection-match."""
        neigh = np.asarray(ms.covisible_keyframes(state, cand, 10))
        kfs = [cand] + [int(x) for x in neigh[neigh >= 0]]
        pt_ids = set()
        fwd = np.asarray(state.kf_kp_point)
        for k in kfs:
            ids = fwd[k]
            pt_ids.update(int(i) for i in ids[ids >= 0])
        if not pt_ids:
            return 0
        ids = jnp.asarray(sorted(pt_ids), jnp.int32)
        pw = state.pt_pos[ids]
        # current camera ~ S12 ∘ T_cand
        T_cand = state.kf_pose[cand]
        p_cand = se3.transform_points(T_cand, pw)
        p_cur = se3.sim3_transform_points(S12, p_cand)
        uv, z = projection.project(self.cam, p_cur)
        okz = (z > 0) & (uv[:, 0] >= 0) & (uv[:, 0] < self.cam.width) & \
            (uv[:, 1] >= 0) & (uv[:, 1] < self.cam.height)
        # descriptor match against current KF features within radius 10
        pt_bits = hamming.unpack_bits(state.pt_desc[ids])
        cur_bits = hamming.unpack_bits(state.kf_desc[kf])
        d2 = jnp.sum(
            (uv[:, None, :] - state.kf_kp_xy[kf][None, :, :]) ** 2, -1
        )
        mask = okz[:, None] & state.kf_kp_valid[kf][None, :] & (d2 <= 100.0)
        dmat = hamming.hamming_matrix_bits(pt_bits, cur_bits)
        _, best, _ = hamming.masked_best2(dmat, extra_mask=mask)
        return int(jnp.sum((best <= hamming.TH_HIGH).astype(jnp.int32)))

    # -- CorrectLoop -------------------------------------------------------
    def _correct_loop(self, state: ms.MapState, kf: int, match_kf: int,
                      S_cur_loop: jax.Array) -> ms.MapState:
        """Sim3 propagation + pose graph + bounded GBA
        (`src/LoopClosing.cc:403-583`)."""
        K = state.kf_capacity
        kf_valid = np.asarray(state.kf_valid)
        poses = state.kf_pose  # (K,4,4) — Siw with scale 1

        # corrected Sim3 of the current KF: S_corr_cur = S12 ∘ S_cand... the
        # RANSAC gave S12: loop-cam coords -> current-cam coords. The
        # corrected current pose is S12^-1? Following LoopClosing.cc:316:
        # mg2oScw = gScm * gSmw  (Scm from solver, Smw = loop KF pose).
        S_loop_w = poses[match_kf]  # scale-1 Sim3
        S_corr_cur = S_cur_loop @ S_loop_w  # corrected Scw of current KF

        # propagate to the current KF's covisible window (:436-467)
        window = np.asarray(ms.covisible_keyframes(state, kf, ms.MAX_OBS))
        window = [kf] + [int(x) for x in window[window >= 0]]
        S_old_cur = poses[kf]
        corr = {}
        for k in window:
            if not kf_valid[k]:
                continue
            S_ik = poses[k] @ se3.se3_inv(S_old_cur)  # relative (scale 1)
            corr[k] = S_ik @ S_corr_cur
        # correct the window's points through their ref poses (:469-499)
        pt_mask = np.zeros(state.pt_capacity, bool)
        fwd = np.asarray(state.kf_kp_point)
        pt_ref = np.full(state.pt_capacity, -1, np.int64)
        for k in window:
            if k not in corr:
                continue
            ids = fwd[k]
            ids = ids[ids >= 0]
            fresh = ~pt_mask[ids]
            pt_mask[ids] = True
            pt_ref[ids[fresh]] = k
        upd_ids = np.nonzero(pt_mask)[0]
        if len(upd_ids):
            refs = pt_ref[upd_ids]
            S_old = np.stack([np.asarray(poses[int(r)]) for r in refs])
            S_new = np.stack([np.asarray(corr[int(r)]) for r in refs])
            pw = state.pt_pos[jnp.asarray(upd_ids)]
            p_cam = jnp.einsum("nij,nj->ni", jnp.asarray(S_old)[:, :3, :3], pw) \
                + jnp.asarray(S_old)[:, :3, 3]
            S_new_inv = se3.sim3_inv(jnp.asarray(S_new))
            p_new = jnp.einsum("nij,nj->ni", S_new_inv[:, :3, :3], p_cam) \
                + S_new_inv[:, :3, 3]
            state = state._replace(
                pt_pos=state.pt_pos.at[jnp.asarray(upd_ids)].set(p_new)
            )
        # write corrected poses (scale folded back to SE3, :459-467)
        new_poses = np.asarray(poses).copy()
        for k, S in corr.items():
            new_poses[k] = np.asarray(pose_graph.sim3_to_se3(S))
        state = state._replace(kf_pose=jnp.asarray(new_poses))

        # add loop edge (:567-570)
        le = state.kf_loop_edges
        free1 = int(np.argmax(np.asarray(le[kf]) < 0))
        free2 = int(np.argmax(np.asarray(le[match_kf]) < 0))
        state = state._replace(
            kf_loop_edges=le.at[kf, free1].set(match_kf).at[match_kf, free2].set(kf)
        )

        # essential-graph optimization (:565)
        state = self._essential_graph(state, kf, match_kf)

        # bounded global BA (the reference's GBA thread, :571-575)
        if self.enable_gba:
            state = self._global_ba(state)
        return state

    def _essential_graph(self, state: ms.MapState, kf: int, match_kf: int):
        K = state.kf_capacity
        covis = np.asarray(state.covis)
        parent = np.asarray(state.kf_parent)
        loops = np.asarray(state.kf_loop_edges)
        kf_valid = np.asarray(state.kf_valid)
        poses_np = np.asarray(state.kf_pose)
        edges = set()
        for i in range(int(state.n_kf)):
            if not kf_valid[i]:
                continue
            p = parent[i]
            if p >= 0 and kf_valid[p]:
                edges.add((min(i, int(p)), max(i, int(p))))
            for l in loops[i]:
                if l >= 0 and kf_valid[l]:
                    edges.add((min(i, int(l)), max(i, int(l))))
            for j in np.nonzero(covis[i] >= ms.ESSENTIAL_MIN_WEIGHT)[0]:
                if kf_valid[j]:
                    edges.add((min(i, int(j)), max(i, int(j))))
        edges.add((min(kf, match_kf), max(kf, match_kf)))
        if not edges:
            return state
        ei = np.array([e[0] for e in edges], np.int32)
        ej = np.array([e[1] for e in edges], np.int32)
        meas = np.einsum(
            "eij,ejk->eik", poses_np[ei],
            np.asarray(se3.se3_inv(jnp.asarray(poses_np[ej])))
        )
        fixed = np.zeros(K, bool)
        fixed[match_kf] = True  # the loop KF is fixed (Optimizer.cc:820-823)
        prob = pose_graph.PoseGraphProblem(
            S_init=jnp.asarray(poses_np),
            fixed=jnp.asarray(fixed),
            valid=state.kf_valid,
            edge_i=jnp.asarray(ei),
            edge_j=jnp.asarray(ej),
            edge_meas=jnp.asarray(meas, jnp.float32),
            edge_valid=jnp.ones(len(ei), bool),
            edge_weight=jnp.ones(len(ei), jnp.float32),
        )
        S_opt, _ = pose_graph.optimize_pose_graph(prob, n_iters=20)
        # correct points through reference KFs (Optimizer.cc:1031-1060)
        refs = np.asarray(state.pt_ref_kf)
        valid_pt = np.asarray(state.pt_valid)
        safe_ref = np.clip(refs, 0, K - 1)
        S_old_ref = jnp.asarray(poses_np[safe_ref])
        S_new_ref = S_opt[jnp.asarray(safe_ref)]
        p_new = pose_graph.correct_points(state.pt_pos, S_old_ref, S_new_ref)
        upd = jnp.asarray(valid_pt & (refs >= 0))
        state = state._replace(
            pt_pos=jnp.where(upd[:, None], p_new, state.pt_pos),
            kf_pose=jnp.where(state.kf_valid[:, None, None],
                              pose_graph.sim3_to_se3(S_opt), state.kf_pose),
        )
        return state

    def _global_ba(self, state: ms.MapState) -> ms.MapState:
        """Full-map BA (`RunGlobalBundleAdjustment`, `LoopClosing.cc:643`),
        bounded by the local-BA problem caps."""
        from . import local_mapping as lmod

        # one big window: treat the whole map as the window of the newest KF
        # by running windowed BA around the most recent keyframes.
        kf_valid = np.asarray(state.kf_valid)
        recent = np.nonzero(kf_valid)[0]
        if len(recent) < 3:
            return state
        mapper_ba = lmod.build_local_ba_problem(
            state, jnp.asarray(int(recent[-1])), self.cam,
            self.inv_level_sigma2,
        )
        prob, cam_slots, lidx = mapper_ba
        res = local_ba.global_bundle_adjustment(self.cam, prob,
                                                n_iters=self.gba_iters)
        return lmod.apply_ba_result(state, res, cam_slots, lidx, prob)
