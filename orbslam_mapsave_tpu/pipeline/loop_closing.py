"""Loop detection and correction.

`LoopClosing` thread parity (`src/LoopClosing.cc`, SURVEY.md §3.4), as host
orchestration over jitted kernels:

- `DetectLoop` (`:104-230`): 10-KF refractory period (`:115`), minScore =
  min BoW score over the query's covisibles (`:125-139`), database
  candidates (vocab/database.py), covisibility-consistency chaining with
  threshold 3 (`:153-226`, `mnCovisibilityConsistencyTh` `:43`);
- `ComputeSim3` (`:232-401`): >= 20 descriptor matches (`:268`), RANSAC
  Sim3 (ops/sim3solver.py, 300 hyp, fix_scale for stereo/RGB-D),
  `SearchBySim3` guided extension th=7.5 (`:324`), `OptimizeSim3` >= 20
  inliers (`:327-331`), Scw projection search over the loop neighbourhood
  th=10 accepting >= 40 total matched features (`:376-386`);
- `CorrectLoop` (`:403-583`): Sim3 propagation to the covisible window
  (`:436-467`), point re-mapping (`:469-499`), loop-point fusion of the
  matched features (`:516-533`), `SearchAndFuse` over the corrected window
  (`:585-611`), essential-graph optimization (optim/pose_graph.py), then a
  global-BA job (pipeline/gba.py — the reference's 4th thread `:571-575`)
  applied asynchronously with correction propagation.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from ..geometry import projection, se3
from ..ops import hamming, matching, sim3solver
from ..optim import pose_graph, sim3_opt
from ..slammap import mapstate as ms
from ..vocab import database, vocabulary
from . import gba as gba_mod
from . import local_mapping

CONSISTENCY_TH = 3  # LoopClosing.cc:43
REFRACTORY_KFS = 10  # LoopClosing.cc:115
LOOP_PT_CAP = 4096  # loop-neighbourhood point window for fusion
DETECT_TOP = 8  # candidates fetched per detection (one device round trip)


@jax.jit
def _detect_device(store: database.SparseBowStore, state: ms.MapState,
                   q_word: jax.Array, q_weight: jax.Array, kf: jax.Array):
    """The whole DetectLoop device side in ONE program: minScore over the
    query's covisibles (`LoopClosing.cc:125-139`), gated candidates
    (`KeyFrameDatabase::DetectLoopCandidates`), top-N by score, and each
    candidate's covisibility group row. One fetch replaces the 5-6
    synchronized transfers of the naive host translation — on a
    tunnel-attached chip each round trip costs tens of ms per keyframe."""
    covis_r = ms.covisible_keyframes(state, kf, 30)
    sc = database.sparse_score_rows(store, jnp.clip(covis_r, 0),
                                    q_word, q_weight)
    has = covis_r >= 0
    min_score = jnp.min(jnp.where(has, sc, jnp.inf))
    min_score = jnp.where(jnp.isfinite(min_score), min_score, 0.0)
    keep, scores = database.detect_loop_candidates_sparse(
        store, state, q_word, q_weight, kf, min_score)
    cs = jnp.where(keep, scores, -jnp.inf)
    top_s, top_ids = jax.lax.top_k(cs, DETECT_TOP)
    groups = state.covis[top_ids] > 0  # (DETECT_TOP, K)
    return top_ids.astype(jnp.int32), top_s, groups, has.any()


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
                 gba_iters: int = 10, scale_factors=None,
                 n_levels: int = 4, scale_factor: float = 1.5):
        self.cam = cam
        self.voc = voc
        self.fix_scale = fix_scale
        self.enable_gba = enable_gba
        self.gba_iters = gba_iters
        self.inv_level_sigma2 = jnp.asarray(inv_level_sigma2)
        self.level_sigma2 = 1.0 / self.inv_level_sigma2
        self.n_levels = n_levels
        self.scale_factor = scale_factor
        self.scale_factors = jnp.asarray(
            scale_factors if scale_factors is not None
            else [scale_factor**i for i in range(n_levels)], jnp.float32)
        self.bounds = projection.compute_image_bounds(cam)
        self.bow_store = None
        self.transform = None
        if voc is not None:
            # packed-descriptor tree descent + sparse per-KF BoW rows: both
            # sized for the real 1M-word ORBvoc (VERDICT r1 item 9)
            self.transform = vocabulary.make_transform_packed(voc)
        self.last_loop_kf = -REFRACTORY_KFS - 1
        self.consistent_groups: list[tuple[set, int]] = []
        self.events: list[LoopEvent] = []
        self.pending_gba: gba_mod.GBAJob | None = None

    # -- BoW bookkeeping ---------------------------------------------------
    def _ensure_store(self, state: ms.MapState):
        if self.bow_store is None and self.voc is not None:
            m = min(state.n_features, max(self.voc.n_words, 1))
            self.bow_store = database.empty_sparse_store(
                state.kf_capacity, m
            )

    def compute_bow(self, state: ms.MapState, kf: int):
        """Sparse BoW row (words, weights) for one keyframe
        (`KeyFrame::ComputeBoW`, `src/KeyFrame.cc:781-789`)."""
        out = self.transform(state.kf_desc[kf], state.kf_kp_valid[kf])
        m = self.bow_store.word.shape[1]
        return vocabulary.sparse_bow(out["word"], out["weight"], m)

    # -- main entry --------------------------------------------------------
    def process(self, state: ms.MapState, kf: int) -> ms.MapState:
        if self.voc is None:
            return state
        self._ensure_store(state)
        bow = self.compute_bow(state, kf)
        self.bow_store = database.add_keyframe_bow_sparse(
            self.bow_store, kf, *bow)
        # slot allocation is monotone, so the slot id bounds the KF count
        # without a device fetch (LoopClosing.cc:114-120 refractory gates)
        if kf - self.last_loop_kf < REFRACTORY_KFS or kf < 11:
            return state
        cand = self._detect_loop(state, kf, bow)
        if cand is None:
            return state
        result = self._compute_sim3(state, kf, cand)
        if result is None:
            return state
        S_cur_loop, match_kf, n_inl, matched_pt, loop_pts = result
        self.events.append(LoopEvent(kf, match_kf, n_inl))
        self.last_loop_kf = kf
        self.consistent_groups.clear()
        return self._correct_loop(state, kf, match_kf, S_cur_loop,
                                  matched_pt, loop_pts)

    # -- DetectLoop --------------------------------------------------------
    def _detect_loop(self, state: ms.MapState, kf: int, bow) -> int | None:
        q_word, q_weight = bow
        top_ids, top_s, groups, has_covis = jax.device_get(_detect_device(
            self.bow_store, state, q_word, q_weight, jnp.asarray(kf)))
        if not bool(has_covis):
            return None
        live = np.isfinite(top_s)
        cand_slots = top_ids[live]
        if len(cand_slots) == 0:
            self.consistent_groups.clear()
            return None
        # consistency chaining (LoopClosing.cc:153-226)
        new_groups: list[tuple[set, int]] = []
        enough: list[int] = []
        scores = {}
        for c, s, grow in zip(cand_slots, top_s[live], groups[live]):
            group = {int(c)} | {int(x) for x in np.nonzero(grow)[0]}
            scores[int(c)] = float(s)
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
        return int(max(enough, key=lambda c: scores[c]))

    # -- ComputeSim3 -------------------------------------------------------
    def _per_feature_points(self, state: ms.MapState, kf: int):
        """Gather each feature's point data (world pos, distance band,
        distinctive descriptor bits) aligned to the feature axis."""
        pts = state.kf_kp_point[kf]
        ok = state.kf_kp_valid[kf] & (pts >= 0)
        safe = jnp.clip(pts, 0)
        ok = ok & state.pt_valid[safe]
        return dict(
            ids=pts, ok=ok,
            world=state.pt_pos[safe],
            mind=0.8 * state.pt_min_dist[safe],
            maxd=1.2 * state.pt_max_dist[safe],
            bits=hamming.unpack_bits(state.pt_desc[safe]),
        )

    def _compute_sim3(self, state: ms.MapState, kf: int, cand: int):
        b1 = hamming.unpack_bits(state.kf_desc[kf])
        b2 = hamming.unpack_bits(state.kf_desc[cand])
        f1 = self._per_feature_points(state, kf)
        f2 = self._per_feature_points(state, cand)
        matches, n = matching.search_by_descriptor(
            b1, f1["ok"], b2, f2["ok"],
            state.kf_kp_angle[kf], state.kf_kp_angle[cand],
            th=hamming.TH_LOW, nn_ratio=0.75,
        )
        if int(n) < 20:  # LoopClosing.cc:268
            return None
        m = np.asarray(matches)
        sel1 = np.nonzero(m >= 0)[0]
        sel2 = m[sel1]
        T1 = state.kf_pose[kf]
        T2 = state.kf_pose[cand]
        pw1 = f1["world"][jnp.asarray(sel1)]
        pw2 = f2["world"][jnp.asarray(sel2)]
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

        # guided extension (`SearchBySim3`, ORBmatcher.cc:1105-1329):
        # keep the RANSAC inliers as the base match set, extend by
        # bidirectional Sim3 projection with mutual agreement
        inl_np = np.asarray(inl)
        N = b1.shape[0]
        match12 = np.full(N, -1, np.int64)  # feature of kf -> feature of cand
        match12[sel1[inl_np]] = sel2[inl_np]
        already1 = jnp.asarray(match12 >= 0)
        already2_np = np.zeros(N, bool)
        already2_np[match12[match12 >= 0]] = True
        extra12, _ = matching.search_by_sim3(
            self.cam, T1, T2, S12,
            state.kf_kp_xy[kf], state.kf_kp_octave[kf], b1,
            state.kf_kp_valid[kf], f1["world"], f1["ok"], f1["mind"],
            f1["maxd"], f1["bits"],
            state.kf_kp_xy[cand], state.kf_kp_octave[cand], b2,
            state.kf_kp_valid[cand], f2["world"], f2["ok"], f2["mind"],
            f2["maxd"], f2["bits"],
            already1, jnp.asarray(already2_np),
            self.bounds, self.scale_factors, th=7.5,
            n_levels=self.n_levels, scale_factor=self.scale_factor,
        )
        extra_np = np.asarray(extra12)
        fresh = (match12 < 0) & (extra_np >= 0)
        match12[fresh] = extra_np[fresh]

        # Sim3 optimization over the extended set (OptimizeSim3, :327-331)
        s1 = np.nonzero(match12 >= 0)[0]
        s2 = match12[s1]
        pc1e = se3.transform_points(T1, f1["world"][jnp.asarray(s1)])
        pc2e = se3.transform_points(T2, f2["world"][jnp.asarray(s2)])
        o1 = np.asarray(state.kf_kp_octave[kf])[s1]
        o2 = np.asarray(state.kf_kp_octave[cand])[s2]
        obs = sim3_opt.Sim3Obs(
            pc1=pc1e, pc2=pc2e,
            uv1=state.kf_kp_xy[kf][jnp.asarray(s1)],
            uv2=state.kf_kp_xy[cand][jnp.asarray(s2)],
            inv_sigma2_1=jnp.asarray(
                1.0 / ls2[np.clip(o1, 0, len(ls2) - 1)], jnp.float32),
            inv_sigma2_2=jnp.asarray(
                1.0 / ls2[np.clip(o2, 0, len(ls2) - 1)], jnp.float32),
            valid=jnp.ones(len(s1), bool),
        )
        S12_opt, inl2, n2 = sim3_opt.optimize_sim3(
            self.cam, S12, obs, self.fix_scale
        )
        if int(n2) < 20:  # LoopClosing.cc:327-331
            return None
        inl2_np = np.asarray(inl2)

        # matched loop point per current-KF feature (mvpCurrentMatchedPoints)
        matched_pt = np.full(N, -1, np.int64)
        pts2_np = np.asarray(f2["ids"])
        matched_pt[s1[inl2_np]] = pts2_np[s2[inl2_np]]

        # mScw = gScm * gSmw (LoopClosing.cc:333-336)
        Scw = S12_opt @ T2

        # loop-neighbourhood points (mvpLoopMapPoints, :353-374)
        neigh = np.asarray(ms.covisible_keyframes(state, cand, ms.MAX_OBS))
        kfs = [cand] + [int(x) for x in neigh[neigh >= 0]]
        fwd = np.asarray(state.kf_kp_point)
        pt_valid_np = np.asarray(state.pt_valid)
        pt_ids = set()
        for k in kfs:
            ids = fwd[k]
            ids = ids[ids >= 0]
            pt_ids.update(int(i) for i in ids[pt_valid_np[ids]])
        loop_pts = np.fromiter(sorted(pt_ids), np.int64) if pt_ids else \
            np.zeros(0, np.int64)
        if len(loop_pts) == 0:
            return None

        # Scw projection search over the loop points (:376-386)
        lp = jnp.asarray(loop_pts)
        already_pt = jnp.asarray(
            np.isin(loop_pts, matched_pt[matched_pt >= 0]))
        proj, _ = matching.search_by_projection_scw(
            self.cam, Scw,
            state.pt_pos[lp], state.pt_valid[lp] & ~already_pt,
            0.8 * state.pt_min_dist[lp], 1.2 * state.pt_max_dist[lp],
            state.pt_normal[lp], hamming.unpack_bits(state.pt_desc[lp]),
            state.kf_kp_xy[kf], state.kf_kp_octave[kf], b1,
            state.kf_kp_valid[kf], jnp.asarray(matched_pt >= 0),
            self.bounds, self.scale_factors, th=10.0,
            n_levels=self.n_levels, scale_factor=self.scale_factor,
        )
        proj_np = np.asarray(proj)  # per-feature loop-point row or -1
        fresh = (matched_pt < 0) & (proj_np >= 0)
        matched_pt[fresh] = loop_pts[proj_np[fresh]]

        total = int((matched_pt >= 0).sum())
        if total < 40:  # LoopClosing.cc:386
            return None
        return S12_opt, cand, int(n2), matched_pt, loop_pts

    # -- CorrectLoop -------------------------------------------------------
    def _correct_loop(self, state: ms.MapState, kf: int, match_kf: int,
                      S_cur_loop: jax.Array, matched_pt: np.ndarray,
                      loop_pts: np.ndarray) -> ms.MapState:
        """Sim3 propagation + loop fusion + pose graph + GBA job
        (`src/LoopClosing.cc:403-583`)."""
        # ONE pose fetch for the whole correction (per-element device reads
        # cost a tunnel round trip EACH — the naive loop took minutes at a
        # loop event on remote-attached TPU)
        poses_np = np.asarray(state.kf_pose)  # (K,4,4) — Siw with scale 1
        kf_valid = np.asarray(state.kf_valid)
        S_cl = np.asarray(S_cur_loop)

        # corrected Sim3 of the current KF (LoopClosing.cc:316):
        # mg2oScw = gScm * gSmw (Scm from solver, Smw = loop KF pose)
        S_corr_cur = S_cl @ poses_np[match_kf]  # corrected Scw of current KF

        # propagate to the current KF's covisible window (:436-467)
        window = np.asarray(ms.covisible_keyframes(state, kf, ms.MAX_OBS))
        window = [kf] + [int(x) for x in window[window >= 0]]
        S_old_cur_inv = np.linalg.inv(poses_np[kf])
        corr = {}
        for k in window:
            if not kf_valid[k]:
                continue
            S_ik = poses_np[k] @ S_old_cur_inv  # relative (scale 1)
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
            S_old = poses_np[refs]
            S_new = np.stack([corr[int(r)] for r in refs])
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
        new_poses = poses_np.copy()
        for k, S in corr.items():
            s = np.cbrt(np.linalg.det(S[:3, :3]))
            T = np.eye(4, dtype=new_poses.dtype)
            T[:3, :3] = S[:3, :3] / s
            T[:3, 3] = S[:3, 3] / s
            new_poses[k] = T
        state = state._replace(kf_pose=jnp.asarray(new_poses))

        # --- loop fusion of the matched features (:516-533):
        # feature already holds a point -> replaced BY the loop point;
        # empty feature -> new observation of the loop point
        N = state.n_features
        mp = jnp.asarray(matched_pt.astype(np.int32))
        existing = state.kf_kp_point[kf]
        has_match = mp >= 0
        merge = has_match & (existing >= 0) & (existing != mp)
        src = jnp.where(merge, existing, -1)
        dst = jnp.where(merge, mp, -1)
        state = ms.merge_points(state, src, dst, merge)
        feat = jnp.arange(N, dtype=jnp.int32)
        add = has_match & (state.kf_kp_point[kf] < 0)
        state = ms.add_observations(state, kf, mp, feat, add)
        state = ms.compute_distinctive_descriptors_idx(
            state, jnp.clip(mp, 0), add)

        # --- SearchAndFuse over the corrected window (:585-611): project
        # the loop points into every window KF with th=4; the window KF's
        # duplicate points are replaced by the loop points
        lp_pad = np.full(min(LOOP_PT_CAP, state.pt_capacity), -1, np.int64)
        lp_pad[: min(len(loop_pts), len(lp_pad))] = \
            loop_pts[: len(lp_pad)]
        lp_dev = jnp.asarray(lp_pad.astype(np.int32))
        for k in window:
            if not kf_valid[k]:
                continue
            state = local_mapping.fuse_into_keyframe(
                state, k, lp_dev, self.cam, self.bounds, self.scale_factors,
                self.inv_level_sigma2, self.n_levels, self.scale_factor,
                th=4.0, prefer_candidate=True,
            )
        # refresh connections of the window (new cross-loop links,
        # :544-562) — fused points now link both sides of the loop
        for k in window:
            if kf_valid[k]:
                state = ms.update_connections(state, jnp.asarray(k))

        # add loop edge (:567-570)
        le = state.kf_loop_edges
        free1 = int(np.argmax(np.asarray(le[kf]) < 0))
        free2 = int(np.argmax(np.asarray(le[match_kf]) < 0))
        state = state._replace(
            kf_loop_edges=le.at[kf, free1].set(match_kf).at[match_kf, free2].set(kf)
        )

        # essential-graph optimization (:565)
        state = self._essential_graph(state, kf, match_kf)

        # global BA as an async job (the reference's GBA thread, :571-575);
        # a still-pending job from a previous loop is aborted (:409-427)
        if self.enable_gba:
            if self.pending_gba is not None:
                self.pending_gba.abort()
            self.pending_gba = gba_mod.GBAJob(
                state, self.cam, self.inv_level_sigma2,
                n_iters=self.gba_iters, robust=False,
            )
        return state

    def remap_keyframes(self, new_of_old) -> None:
        """Apply a keyframe-slot compaction permutation
        (`mapstate.compact_keyframes`) to the BoW store and the detector's
        host-side bookkeeping."""
        import numpy as _np

        if self.bow_store is not None:
            old_ids = _np.nonzero(new_of_old >= 0)[0]
            new_ids = new_of_old[old_ids]
            word = np.asarray(self.bow_store.word)
            weight = np.asarray(self.bow_store.weight)
            nw = np.full_like(word, np.iinfo(np.int32).max)
            nv = np.zeros_like(weight)
            nw[new_ids] = word[old_ids]
            nv[new_ids] = weight[old_ids]
            self.bow_store = database.SparseBowStore(
                word=jnp.asarray(nw), weight=jnp.asarray(nv))
        remap = {int(o): int(n) for o, n in
                 zip(*[_np.nonzero(new_of_old >= 0)[0],
                       new_of_old[new_of_old >= 0]])}
        self.consistent_groups = [
            ({remap[g] for g in grp if g in remap}, c)
            for grp, c in self.consistent_groups
        ]
        self.consistent_groups = [(g, c) for g, c in self.consistent_groups
                                  if g]
        if self.last_loop_kf >= 0:
            self.last_loop_kf = remap.get(self.last_loop_kf,
                                          -REFRACTORY_KFS - 1)

    def poll_gba(self, state: ms.MapState) -> ms.MapState:
        """Apply a finished GBA job (the reference joins the GBA thread and
        propagates corrections, `LoopClosing.cc:643-786`)."""
        if self.pending_gba is None:
            return state
        job, self.pending_gba = self.pending_gba, None
        return job.apply(state)

    def _essential_graph(self, state: ms.MapState, kf: int, match_kf: int):
        """Essential-graph pose relaxation (`Optimizer::OptimizeEssentialGraph`,
        `src/Optimizer.cc:781-1062`): spanning-tree edges + loop edges +
        covisibility edges with weight >= 100, the matched KF fixed."""
        K = state.kf_capacity
        covis = np.asarray(state.covis)
        parent = np.asarray(state.kf_parent)
        loops = np.asarray(state.kf_loop_edges)
        kf_valid = np.asarray(state.kf_valid)
        poses_np = np.asarray(state.kf_pose)

        # vectorized edge extraction (the O(K) python loop was flagged in
        # round 1): spanning tree, loop edges, strong covisibility
        ids = np.arange(K)
        pe = (parent >= 0) & kf_valid & kf_valid[np.clip(parent, 0, None)]
        e_par = np.stack([ids[pe], parent[pe]], -1)
        le_i, le_j = np.nonzero(loops >= 0)
        lv = loops[le_i, le_j]
        lm_ok = kf_valid[le_i] & kf_valid[lv]
        e_loop = np.stack([le_i[lm_ok], lv[lm_ok]], -1)
        cw = (covis >= ms.ESSENTIAL_MIN_WEIGHT) & kf_valid[:, None] & \
            kf_valid[None, :]
        ci, cj = np.nonzero(np.triu(cw, 1))
        e_cov = np.stack([ci, cj], -1)
        e_cur = np.array([[kf, match_kf]])
        alle = np.concatenate([e_par, e_loop, e_cov, e_cur], 0)
        lo = np.minimum(alle[:, 0], alle[:, 1])
        hi = np.maximum(alle[:, 0], alle[:, 1])
        enc = np.unique(lo.astype(np.int64) * K + hi)
        ei = (enc // K).astype(np.int32)
        ej = (enc % K).astype(np.int32)
        if len(ei) == 0:
            return state
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
