"""Fixed-capacity structure-of-arrays SLAM map state.

TPU-native redesign of the reference's pointer-graph map (SURVEY.md §7.1):
`Map` + `KeyFrame` + `MapPoint` (`src/Map.cc`, `src/KeyFrame.cc`,
`src/MapPoint.cc`) become ONE immutable pytree of padded arrays with validity
masks. Object identity = array slot; "bad" objects (the reference's
soft-delete `mbBad` lifecycle, `include/MapPoint.h:150-152`,
`KeyFrame::SetBadFlag` `src/KeyFrame.cc:1174-1283`) are mask bits. All
mutations are pure functions returning a new state, so tracking / mapping /
loop threads become data dependencies instead of mutexes (the reference's
`Map::mMutexMapUpdate` stop-the-world lock, `include/Map.h:69`).

Graph storage:
- forward observations: `kf_kp_point[k, n]` = map-point slot seen by feature
  n of keyframe k (-1 if none) — the analogue of `KeyFrame::mvpMapPoints`;
- reverse observations: `pt_obs_kf/pt_obs_idx` (P, MAX_OBS) padded lists —
  the analogue of `MapPoint::mObservations`;
- covisibility: dense (K, K) int32 weight matrix (`KeyFrame::mConnectedKeyFrameWeights`,
  recomputed by `update_connections` like `KeyFrame::UpdateConnections`
  `src/KeyFrame.cc:1010-1100`);
- spanning tree: `kf_parent` (K,) + implicit children, loop edges (K, MAX_LOOP).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

MAX_OBS = 32  # per-point observation capacity
MAX_LOOP_EDGES = 8

# Covisibility-graph constants (SURVEY.md appendix A)
COVIS_MIN_WEIGHT = 15  # KeyFrame.cc:1051
ESSENTIAL_MIN_WEIGHT = 100  # Optimizer.cc:806


class MapState(NamedTuple):
    # --- keyframes ---
    kf_pose: jax.Array  # (K,4,4) f32, Tcw (world->camera)
    kf_valid: jax.Array  # (K,) bool — allocated and not bad
    kf_timestamp: jax.Array  # (K,) f32 OFFSET from the run's f64 epoch
    # (Tracker.ts_epoch) — f32 cannot hold absolute TUM stamps (~1.3e9);
    # exports re-add the epoch (pipeline/system.py save_keyframe_trajectory)
    kf_frame_id: jax.Array  # (K,) i32 — source frame id (KeyFrame::mnFrameId)
    # per-keyframe features (immutable snapshot, like KeyFrame's const fields)
    kf_kp_xy: jax.Array  # (K,N,2) f32 undistorted pixel coords (mvKeysUn)
    kf_kp_ur: jax.Array  # (K,N) f32 right-image u; <0 = mono (mvuRight)
    kf_kp_depth: jax.Array  # (K,N) f32 depth; <=0 = none (mvDepth)
    kf_kp_octave: jax.Array  # (K,N) i32
    kf_kp_angle: jax.Array  # (K,N) f32 degrees
    kf_kp_valid: jax.Array  # (K,N) bool
    kf_desc: jax.Array  # (K,N,32) u8
    kf_kp_point: jax.Array  # (K,N) i32 point slot or -1 (mvpMapPoints)
    # --- map points ---
    pt_pos: jax.Array  # (P,3) f32 world position
    pt_valid: jax.Array  # (P,) bool
    pt_desc: jax.Array  # (P,32) u8 distinctive descriptor
    pt_normal: jax.Array  # (P,3) f32 mean viewing direction
    pt_min_dist: jax.Array  # (P,) f32 scale-invariance band (mfMinDistance)
    pt_max_dist: jax.Array  # (P,) f32 (mfMaxDistance)
    pt_ref_kf: jax.Array  # (P,) i32 reference keyframe slot
    pt_first_kf: jax.Array  # (P,) i32 first-observing KF slot (mnFirstKFid)
    pt_visible: jax.Array  # (P,) i32 mnVisible
    pt_found: jax.Array  # (P,) i32 mnFound
    pt_obs_kf: jax.Array  # (P,MAX_OBS) i32 observing KF slots, -1 pad
    pt_obs_idx: jax.Array  # (P,MAX_OBS) i32 feature index in that KF
    pt_obs_oct: jax.Array  # (P,MAX_OBS) i8 octave of that observation (-1 pad)
    # — denormalized copy of kf_kp_octave[obs] so octave-dependent passes
    # (KeyFrameCulling's same-or-finer-scale histogram,
    # `src/LocalMapping.cc:668-686`) never gather from the big (K,N) tables
    # --- graph ---
    covis: jax.Array  # (K,K) i32 shared-observation counts
    kf_parent: jax.Array  # (K,) i32 spanning-tree parent slot (-1 root)
    kf_loop_edges: jax.Array  # (K,MAX_LOOP_EDGES) i32, -1 pad
    # --- counters ---
    n_kf: jax.Array  # () i32 — number of allocated KF slots (monotone)
    n_pt: jax.Array  # () i32 — number of allocated point slots (monotone)
    n_obs_dropped: jax.Array  # () i32 — observations lost to MAX_OBS
    # saturation (telemetry; the reference's std::map grows unboundedly)

    @property
    def kf_capacity(self) -> int:
        return self.kf_pose.shape[0]

    @property
    def pt_capacity(self) -> int:
        return self.pt_pos.shape[0]

    @property
    def n_features(self) -> int:
        return self.kf_kp_xy.shape[1]


def empty_map(max_keyframes: int, max_points: int, n_features: int,
              dtype=jnp.float32) -> MapState:
    # Built host-side with numpy then transferred in one shot: eager jnp
    # fills would each trigger a per-shape XLA compile.
    import numpy as np

    K, P, N = max_keyframes, max_points, n_features
    npdtype = np.dtype(dtype.dtype if hasattr(dtype, "dtype") else dtype)
    host = MapState(
        kf_pose=np.tile(np.eye(4, dtype=npdtype), (K, 1, 1)),
        kf_valid=np.zeros(K, bool),
        kf_timestamp=np.zeros(K, npdtype),
        kf_frame_id=np.zeros(K, np.int32),
        kf_kp_xy=np.zeros((K, N, 2), npdtype),
        kf_kp_ur=np.full((K, N), -1.0, npdtype),
        kf_kp_depth=np.zeros((K, N), npdtype),
        kf_kp_octave=np.zeros((K, N), np.int32),
        kf_kp_angle=np.zeros((K, N), npdtype),
        kf_kp_valid=np.zeros((K, N), bool),
        kf_desc=np.zeros((K, N, 32), np.uint8),
        kf_kp_point=np.full((K, N), -1, np.int32),
        pt_pos=np.zeros((P, 3), npdtype),
        pt_valid=np.zeros(P, bool),
        pt_desc=np.zeros((P, 32), np.uint8),
        pt_normal=np.zeros((P, 3), npdtype),
        pt_min_dist=np.zeros(P, npdtype),
        pt_max_dist=np.zeros(P, npdtype),
        pt_ref_kf=np.full(P, -1, np.int32),
        pt_first_kf=np.full(P, -1, np.int32),
        pt_visible=np.ones(P, np.int32),
        pt_found=np.ones(P, np.int32),
        pt_obs_kf=np.full((P, MAX_OBS), -1, np.int32),
        pt_obs_idx=np.full((P, MAX_OBS), -1, np.int32),
        pt_obs_oct=np.full((P, MAX_OBS), -1, np.int8),
        covis=np.zeros((K, K), np.int32),
        kf_parent=np.full(K, -1, np.int32),
        kf_loop_edges=np.full((K, MAX_LOOP_EDGES), -1, np.int32),
        n_kf=np.int32(0),
        n_pt=np.int32(0),
        n_obs_dropped=np.int32(0),
    )
    return jax.tree.map(jnp.asarray, host)


# ---------------------------------------------------------------------------
# Keyframe / point allocation
# ---------------------------------------------------------------------------


def add_keyframe(state: MapState, pose_cw: jax.Array, timestamp, frame_id,
                 kp_xy, kp_ur, kp_depth, kp_octave, kp_angle, kp_valid, desc,
                 kp_point=None) -> tuple[MapState, jax.Array]:
    """Append a keyframe at slot n_kf; returns (state, slot).

    Analogue of `Tracking::CreateNewKeyFrame` (`src/Tracking.cc:1323`) +
    `Map::AddKeyFrame` (`src/Map.cc:150`). Capacity overflow is the caller's
    responsibility (check state.n_kf < kf_capacity on host).
    """
    k = state.n_kf
    if kp_point is None:
        kp_point = jnp.full((state.n_features,), -1, jnp.int32)
    state = state._replace(
        kf_pose=state.kf_pose.at[k].set(pose_cw),
        kf_valid=state.kf_valid.at[k].set(True),
        kf_timestamp=state.kf_timestamp.at[k].set(timestamp),
        kf_frame_id=state.kf_frame_id.at[k].set(frame_id),
        kf_kp_xy=state.kf_kp_xy.at[k].set(kp_xy),
        kf_kp_ur=state.kf_kp_ur.at[k].set(kp_ur),
        kf_kp_depth=state.kf_kp_depth.at[k].set(kp_depth),
        kf_kp_octave=state.kf_kp_octave.at[k].set(kp_octave),
        kf_kp_angle=state.kf_kp_angle.at[k].set(kp_angle),
        kf_kp_valid=state.kf_kp_valid.at[k].set(kp_valid),
        kf_desc=state.kf_desc.at[k].set(desc),
        kf_kp_point=state.kf_kp_point.at[k].set(kp_point),
        n_kf=state.n_kf + 1,
    )
    return state, k


def add_points(state: MapState, pos: jax.Array, desc: jax.Array,
               ref_kf, first_kf, valid_mask: jax.Array,
               normal=None, min_dist=None, max_dist=None
               ) -> tuple[MapState, jax.Array]:
    """Bulk-append B candidate points; invalid rows are skipped via masking.

    Returns (state, slots (B,) i32 with -1 where masked out). Slots are
    allocated compactly from n_pt using a prefix sum, so one call under jit
    replaces the reference's per-point `new MapPoint` + `Map::AddMapPoint`.
    """
    B = pos.shape[0]
    offs = jnp.cumsum(valid_mask.astype(jnp.int32)) - 1
    slots = jnp.where(valid_mask, state.n_pt + offs, -1)
    cap = state.pt_capacity
    in_cap = slots < cap
    slots = jnp.where(in_cap, slots, -1)
    ok = slots >= 0
    safe = jnp.where(ok, slots, cap - 1)  # dummy writes masked below

    def scat(arr, vals, fill_ok):
        vals = jnp.where(fill_ok.reshape((-1,) + (1,) * (vals.ndim - 1)), vals,
                         arr[safe])
        return arr.at[safe].set(vals)

    ref_kf = jnp.broadcast_to(jnp.asarray(ref_kf, jnp.int32), (B,))
    first_kf = jnp.broadcast_to(jnp.asarray(first_kf, jnp.int32), (B,))
    if normal is None:
        normal = jnp.zeros((B, 3), pos.dtype)
    if min_dist is None:
        min_dist = jnp.zeros(B, pos.dtype)
    if max_dist is None:
        max_dist = jnp.full(B, jnp.inf, pos.dtype)
    state = state._replace(
        pt_pos=scat(state.pt_pos, pos, ok),
        pt_valid=scat(state.pt_valid, jnp.ones(B, bool), ok),
        pt_desc=scat(state.pt_desc, desc, ok),
        pt_normal=scat(state.pt_normal, normal, ok),
        pt_min_dist=scat(state.pt_min_dist, min_dist, ok),
        pt_max_dist=scat(state.pt_max_dist, max_dist, ok),
        pt_ref_kf=scat(state.pt_ref_kf, ref_kf, ok),
        pt_first_kf=scat(state.pt_first_kf, first_kf, ok),
        pt_visible=scat(state.pt_visible, jnp.ones(B, jnp.int32), ok),
        pt_found=scat(state.pt_found, jnp.ones(B, jnp.int32), ok),
        pt_obs_kf=scat(state.pt_obs_kf, jnp.full((B, MAX_OBS), -1, jnp.int32), ok),
        pt_obs_idx=scat(state.pt_obs_idx, jnp.full((B, MAX_OBS), -1, jnp.int32), ok),
        pt_obs_oct=scat(state.pt_obs_oct, jnp.full((B, MAX_OBS), -1, jnp.int8), ok),
        n_pt=jnp.minimum(state.n_pt + jnp.sum(valid_mask.astype(jnp.int32)),
                         jnp.int32(cap)),
    )
    return state, slots


def add_observations(state: MapState, kf_slot, pt_slots: jax.Array,
                     feat_idx: jax.Array, ok: jax.Array) -> MapState:
    """Register observations point<->keyframe for a batch of features.

    Forward: kf_kp_point[kf, feat] = pt. Reverse: first free lane in
    pt_obs_kf[pt]. Analogue of `MapPoint::AddObservation`
    (`src/MapPoint.cc` via `include/MapPoint.h:69`) + `KeyFrame::AddMapPoint`.
    """
    B = pt_slots.shape[0]
    P = state.pt_capacity
    ok = ok & (pt_slots >= 0)
    safe_pt = jnp.where(ok, pt_slots, P - 1)
    safe_ft = jnp.where(ok, feat_idx, state.n_features - 1)
    # forward (feat_idx unique per call; dead rows -> OOB, dropped —
    # duplicate-tolerant scatters serialize on TPU, unique ones parallelize)
    cur_fwd = state.kf_kp_point[kf_slot]
    new_fwd = cur_fwd.at[jnp.where(ok, feat_idx, state.n_features)].set(
        pt_slots, mode="drop", unique_indices=True
    )
    kf_kp_point = state.kf_kp_point.at[kf_slot].set(new_fwd)
    # reverse: find first -1 lane per point. NOTE: pt_slots must be unique
    # within a call (one feature per point per KF, as in the reference).
    obs_rows = state.pt_obs_kf[safe_pt]  # (B,MAX_OBS)
    free_lane = jnp.argmax(obs_rows < 0, axis=-1)
    has_free = (obs_rows < 0).any(axis=-1)
    okf = ok & has_free
    drop_pt = jnp.where(okf, pt_slots, P)
    pt_obs_kf = state.pt_obs_kf.at[drop_pt, free_lane].set(
        jnp.broadcast_to(jnp.asarray(kf_slot, jnp.int32), (B,)),
        mode="drop", unique_indices=True
    )
    pt_obs_idx = state.pt_obs_idx.at[drop_pt, free_lane].set(
        feat_idx, mode="drop", unique_indices=True
    )
    oct_b = state.kf_kp_octave[kf_slot][safe_ft].astype(jnp.int8)
    pt_obs_oct = state.pt_obs_oct.at[drop_pt, free_lane].set(
        oct_b, mode="drop", unique_indices=True
    )
    dropped = jnp.sum((ok & ~has_free).astype(jnp.int32))
    return state._replace(
        kf_kp_point=kf_kp_point, pt_obs_kf=pt_obs_kf, pt_obs_idx=pt_obs_idx,
        pt_obs_oct=pt_obs_oct, n_obs_dropped=state.n_obs_dropped + dropped,
    )


def add_observations_rows(state: MapState, kf_rows: jax.Array,
                          pt_slots: jax.Array, feat_idx: jax.Array,
                          ok: jax.Array) -> MapState:
    """`add_observations` variant with a DIFFERENT keyframe per row — used
    by batched triangulation, where each new point's second observation
    lives in whichever covisible neighbour produced the match.

    pt_slots must be unique within a call (fresh allocations are)."""
    K = state.kf_capacity
    P = state.pt_capacity
    okk = ok & (pt_slots >= 0) & (kf_rows >= 0)
    safe_kf = jnp.where(okk, kf_rows, K - 1)
    safe_ft = jnp.where(okk, feat_idx, state.n_features - 1)
    # (kf,feat) pairs unique per call; dead rows -> OOB row, dropped
    fwd = state.kf_kp_point.at[jnp.where(okk, kf_rows, K), safe_ft].set(
        pt_slots, mode="drop", unique_indices=True
    )
    safe_pt = jnp.where(okk, pt_slots, P - 1)
    obs_rows = state.pt_obs_kf[safe_pt]  # (B,MAX_OBS)
    free_lane = jnp.argmax(obs_rows < 0, axis=-1)
    has_free = (obs_rows < 0).any(axis=-1)
    okf = okk & has_free
    drop_pt = jnp.where(okf, pt_slots, P)
    pt_obs_kf = state.pt_obs_kf.at[drop_pt, free_lane].set(
        kf_rows, mode="drop", unique_indices=True
    )
    pt_obs_idx = state.pt_obs_idx.at[drop_pt, free_lane].set(
        feat_idx, mode="drop", unique_indices=True
    )
    oct_b = state.kf_kp_octave[safe_kf, safe_ft].astype(jnp.int8)
    pt_obs_oct = state.pt_obs_oct.at[drop_pt, free_lane].set(
        oct_b, mode="drop", unique_indices=True
    )
    dropped = jnp.sum((okk & ~has_free).astype(jnp.int32))
    return state._replace(
        kf_kp_point=fwd, pt_obs_kf=pt_obs_kf, pt_obs_idx=pt_obs_idx,
        pt_obs_oct=pt_obs_oct, n_obs_dropped=state.n_obs_dropped + dropped,
    )


def add_observations_rows_dup(state: MapState, kf_rows: jax.Array,
                              pt_slots: jax.Array, feat_idx: jax.Array,
                              ok: jax.Array) -> MapState:
    """`add_observations_rows` variant that permits REPEATED pt_slots in a
    call: duplicate rows of one point receive DISTINCT free lanes (rank
    within the point group via one native sort -> k-th-free-lane pick).
    Needed by the combined reverse-fuse pass, where a point may gain an
    observation in each of several close neighbours in the same mapping
    step (the reference runs Fuse once per neighbour,
    `src/LocalMapping.cc:505-518`, so nothing is dropped there).
    (kf_rows, feat_idx) pairs must still be unique within a call."""
    K = state.kf_capacity
    P = state.pt_capacity
    okk = ok & (pt_slots >= 0) & (kf_rows >= 0)
    # a fresh keyframe can legitimately add THOUSANDS of observations
    # across its reverse-fuse targets (own points not yet in any target) —
    # a tight cap here silently weakens the covisibility graph
    cap = 4096
    if pt_slots.shape[0] > cap:
        sel = compact_indices(okk, cap)
        selok = sel >= 0
        ss = jnp.clip(sel, 0)
        kf_rows = jnp.where(selok, kf_rows[ss], -1)
        pt_slots = jnp.where(selok, pt_slots[ss], -1)
        feat_idx = jnp.where(selok, feat_idx[ss], 0)
        okk = selok & (pt_slots >= 0) & (kf_rows >= 0)
    B = pt_slots.shape[0]
    idx = jnp.arange(B, dtype=jnp.int32)
    # stable sort by point slot; rank = position within the point group
    key = jnp.where(okk, pt_slots, P)
    sorted_key, order = jax.lax.sort((key, idx), num_keys=1)
    new_group = jnp.concatenate(
        [jnp.ones((1,), bool), sorted_key[1:] != sorted_key[:-1]])
    group_start = jax.lax.associative_scan(
        jnp.maximum, jnp.where(new_group, idx, 0))
    rank = jnp.zeros(B, jnp.int32).at[order].set(idx - group_start)
    # forward refs: (kf,feat) pairs unique per call; dead rows -> OOB row
    safe_kf = jnp.where(okk, kf_rows, K - 1)
    safe_ft = jnp.where(okk, feat_idx, state.n_features - 1)
    fwd = state.kf_kp_point.at[jnp.where(okk, kf_rows, K), safe_ft].set(
        pt_slots, mode="drop", unique_indices=True
    )
    # k-th free observation lane per row (k = rank within the point) —
    # (point, lane) pairs are unique by the rank construction
    safe_pt = jnp.where(okk, pt_slots, P - 1)
    obs_rows = state.pt_obs_kf[safe_pt]  # (B,MAX_OBS)
    free = obs_rows < 0
    cumfree = jnp.cumsum(free.astype(jnp.int32), axis=-1)
    hit = free & (cumfree == (rank + 1)[:, None])
    lane = jnp.argmax(hit, axis=-1)
    okf = okk & hit.any(axis=-1)
    drop_pt = jnp.where(okf, pt_slots, P)
    pt_obs_kf = state.pt_obs_kf.at[drop_pt, lane].set(
        kf_rows, mode="drop", unique_indices=True
    )
    pt_obs_idx = state.pt_obs_idx.at[drop_pt, lane].set(
        feat_idx, mode="drop", unique_indices=True
    )
    oct_b = state.kf_kp_octave[safe_kf, safe_ft].astype(jnp.int8)
    pt_obs_oct = state.pt_obs_oct.at[drop_pt, lane].set(
        oct_b, mode="drop", unique_indices=True
    )
    dropped = jnp.sum((okk & ~okf).astype(jnp.int32))
    return state._replace(
        kf_kp_point=fwd, pt_obs_kf=pt_obs_kf, pt_obs_idx=pt_obs_idx,
        pt_obs_oct=pt_obs_oct, n_obs_dropped=state.n_obs_dropped + dropped,
    )


def point_obs_count(state: MapState) -> jax.Array:
    """(P,) number of observations per point (MapPoint::Observations)."""
    return jnp.sum(state.pt_obs_kf >= 0, axis=-1).astype(jnp.int32)


def compact_indices(flag: jax.Array, cap: int) -> jax.Array:
    """Indices of nonzero flags compacted into (cap,) ascending, -1 pad.

    Prefix-sum + bounded scatter — O(n) VPU work. The `lax.top_k(flag, cap)`
    alternative lowers to a full variadic sort of the flag array (measured
    ~3-5 ms at n=32768 on v5e, every frame); the scan form is ~10x cheaper.
    Flags past the first `cap` set bits are dropped."""
    n = flag.shape[0]
    f = flag > 0
    pos = jnp.cumsum(f.astype(jnp.int32)) - f
    ok = f & (pos < cap)
    # ranks are unique for kept rows; dropped rows route OOB (parallel
    # unique scatter instead of a duplicate-tolerant serialized one)
    return jnp.full(cap, -1, jnp.int32).at[jnp.where(ok, pos, cap)].set(
        jnp.arange(n, dtype=jnp.int32), mode="drop", unique_indices=True)


def unique_compact_ids(ids: jax.Array, sentinel: int, cap: int,
                       valid_of: jax.Array | None = None) -> jax.Array:
    """Unique valid ids compacted ASCENDING into (cap,), -1 padded —
    two native sorts, zero scatters (a duplicate-index flag scatter over
    tens of thousands of rows serializes on TPU; sorts don't). `sentinel`
    must exceed every valid id (typically the id-space size); overflow
    beyond cap drops the LARGEST ids."""
    ok = ids >= 0
    if valid_of is not None:
        ok = ok & valid_of[jnp.clip(ids, 0)]
    key = jax.lax.sort(jnp.where(ok, ids, sentinel))
    uniq = jnp.concatenate(
        [jnp.ones((1,), bool), key[1:] != key[:-1]]) & (key < sentinel)
    out = jax.lax.sort(jnp.where(uniq, key, sentinel))[:cap]
    return jnp.where(out < sentinel, out, -1)


def erase_points(state: MapState, pt_mask: jax.Array) -> MapState:
    """Soft-delete points where pt_mask is True (`MapPoint::SetBadFlag`):
    clears validity and all forward references."""
    fwd = state.kf_kp_point
    bad_ref = (fwd >= 0) & pt_mask[jnp.clip(fwd, 0)]
    fwd = jnp.where(bad_ref, -1, fwd)
    return state._replace(
        pt_valid=state.pt_valid & ~pt_mask,
        kf_kp_point=fwd,
        pt_obs_kf=jnp.where(pt_mask[:, None], -1, state.pt_obs_kf),
        pt_obs_idx=jnp.where(pt_mask[:, None], -1, state.pt_obs_idx),
        pt_obs_oct=jnp.where(pt_mask[:, None], jnp.int8(-1), state.pt_obs_oct),
    )


def replace_points(state: MapState, src: jax.Array, dst: jax.Array,
                   ok: jax.Array) -> MapState:
    """Fuse: every forward reference to src[i] is redirected to dst[i]
    (`MapPoint::Replace`, `src/MapPoint.cc`), then src is erased.

    Reverse lists of dst are NOT extended lane-by-lane here; callers should
    run `rebuild_observations` (cheap, fully vectorized) after a fuse batch.
    """
    P = state.pt_capacity
    redirect = jnp.arange(P, dtype=jnp.int32)
    safe_src = jnp.where(ok, src, P - 1)
    redirect = redirect.at[safe_src].set(
        jnp.where(ok, dst, redirect[safe_src])
    )
    fwd = state.kf_kp_point
    new_fwd = jnp.where(fwd >= 0, redirect[jnp.clip(fwd, 0)], fwd)
    # accumulate found/visible like MapPoint::Replace does
    add_vis = jnp.zeros(P, jnp.int32).at[safe_src].add(
        jnp.where(ok, state.pt_visible[safe_src], 0))
    add_fnd = jnp.zeros(P, jnp.int32).at[safe_src].add(
        jnp.where(ok, state.pt_found[safe_src], 0))
    safe_dst = jnp.where(ok, dst, P - 1)
    vis = state.pt_visible.at[safe_dst].add(jnp.where(ok, add_vis[safe_src], 0))
    fnd = state.pt_found.at[safe_dst].add(jnp.where(ok, add_fnd[safe_src], 0))
    bad = jnp.zeros(P, bool).at[safe_src].set(ok, mode="drop")
    state = state._replace(kf_kp_point=new_fwd, pt_visible=vis, pt_found=fnd)
    return erase_points(state, bad)


def merge_points(state: MapState, src: jax.Array, dst: jax.Array,
                 ok: jax.Array, cap: int = 1024) -> MapState:
    """Full `MapPoint::Replace` parity (`src/MapPoint.cc`): every
    observation of src[i] moves to dst[i]; where the observing KF already
    sees dst, the duplicate forward match is ERASED (the reference's
    `EraseMapPointMatch` branch); src is soft-deleted; visible/found
    accumulate. src slots must be unique within a call and disjoint
    from dst.
    """
    P = state.pt_capacity
    ok = ok & (src >= 0) & (dst >= 0) & (src != dst)
    if src.shape[0] > cap:
        # live merge pairs are FEW (dozens per mapping step) among the
        # padded lanes; every pass below scales with B, so compact first.
        # Overflow pairs are simply deferred — duplicate detection is
        # stateless and re-finds them next step.
        sel = compact_indices(ok, cap)
        selok = sel >= 0
        ss = jnp.clip(sel, 0)
        src = jnp.where(selok, src[ss], -1)
        dst = jnp.where(selok, dst[ss], -1)
        ok = selok & (src >= 0)
    B = src.shape[0]
    safe_src = jnp.where(ok, src, P - 1)
    safe_dst = jnp.where(ok, dst, P - 1)
    s_kf = jnp.where(ok[:, None], state.pt_obs_kf[safe_src], -1)  # (B,O)
    s_ix = state.pt_obs_idx[safe_src]
    s_oc = state.pt_obs_oct[safe_src]
    d_kf = state.pt_obs_kf[safe_dst]
    # src observations whose KF already observes dst -> duplicate
    dup = ((s_kf[:, :, None] == d_kf[:, None, :]) & (s_kf >= 0)[..., None]
           ).any(-1)
    s_live = (s_kf >= 0)
    move = s_live & ~dup  # transferred to dst
    # forward pointers: moved -> dst, duplicates -> -1. Dead lanes route to
    # an OUT-OF-BOUNDS row and are dropped; live (kf,feat) pairs are unique
    # (src slots are unique and the forward map is single-valued), so the
    # scatter is declared unique — a duplicate-tolerant scatter serializes
    # on TPU, the unique one runs parallel
    tgt = jnp.where(move, safe_dst[:, None], -1)
    K = state.kf_capacity
    f_kf = jnp.where(s_live, s_kf, K)
    fwd = state.kf_kp_point.at[f_kf, jnp.clip(s_ix, 0)].set(
        tgt, mode="drop", unique_indices=True
    )
    # reverse rows of dst: append moved lanes into free slots — combined
    # row sorted valid-first, truncated to MAX_OBS (overflow drops the
    # tail, like the fixed-capacity observation list everywhere else)
    comb_kf = jnp.concatenate([d_kf, jnp.where(move, s_kf, -1)], axis=1)
    comb_ix = jnp.concatenate([state.pt_obs_idx[safe_dst],
                               jnp.where(move, s_ix, -1)], axis=1)
    comb_oc = jnp.concatenate([state.pt_obs_oct[safe_dst],
                               jnp.where(move, s_oc, jnp.int8(-1))], axis=1)
    order = jnp.argsort(jnp.where(comb_kf >= 0, 0, 1), axis=1, stable=True)
    comb_kf_full = jnp.take_along_axis(comb_kf, order, axis=1)
    n_dropped = jnp.sum((comb_kf_full[:, MAX_OBS:] >= 0).astype(jnp.int32))
    comb_kf = comb_kf_full[:, :MAX_OBS]
    comb_ix = jnp.take_along_axis(comb_ix, order, axis=1)[:, :MAX_OBS]
    comb_oc = jnp.take_along_axis(comb_oc, order, axis=1)[:, :MAX_OBS]
    # dst rows are unique within a call (caller dedups); dead rows -> OOB
    drop_dst = jnp.where(ok, dst, P)
    pt_obs_kf = state.pt_obs_kf.at[drop_dst].set(
        comb_kf, mode="drop", unique_indices=True)
    pt_obs_idx = state.pt_obs_idx.at[drop_dst].set(
        comb_ix, mode="drop", unique_indices=True)
    pt_obs_oct = state.pt_obs_oct.at[drop_dst].set(
        comb_oc, mode="drop", unique_indices=True)
    # visible/found accumulate (MapPoint::Replace)
    vis = state.pt_visible.at[drop_dst].add(
        state.pt_visible[safe_src], mode="drop", unique_indices=True)
    fnd = state.pt_found.at[drop_dst].add(
        state.pt_found[safe_src], mode="drop", unique_indices=True)
    # erase src (src unique within a call)
    src_mask = jnp.zeros(P, bool).at[jnp.where(ok, src, P)].set(
        True, mode="drop", unique_indices=True)
    state = state._replace(
        kf_kp_point=fwd, pt_obs_kf=pt_obs_kf, pt_obs_idx=pt_obs_idx,
        pt_obs_oct=pt_obs_oct, pt_visible=vis, pt_found=fnd,
        n_obs_dropped=state.n_obs_dropped + n_dropped,
    )
    return state._replace(
        pt_valid=state.pt_valid & ~src_mask,
        pt_obs_kf=jnp.where(src_mask[:, None], -1, state.pt_obs_kf),
        pt_obs_idx=jnp.where(src_mask[:, None], -1, state.pt_obs_idx),
        pt_obs_oct=jnp.where(src_mask[:, None], jnp.int8(-1),
                             state.pt_obs_oct),
    )


def rebuild_observations(state: MapState) -> MapState:
    """Recompute pt_obs_kf/pt_obs_idx from the forward map — the functional
    replacement for the reference's incremental pointer surgery. O(K*N)."""
    K, N = state.kf_kp_point.shape
    P = state.pt_capacity
    flat_pt = state.kf_kp_point.reshape(-1)  # (K*N,)
    valid = flat_pt >= 0
    safe_pt = jnp.where(valid, flat_pt, P - 1)
    # lane index = running count of observations per point, via sort trick:
    # order observations by point id (stable), then lane = position - first
    keys = jnp.where(valid, flat_pt, P)
    order = jnp.argsort(keys, stable=True)
    sorted_keys = keys[order]
    sorted_pt = flat_pt[order]
    sorted_valid = valid[order]
    idx_in_run = jnp.arange(K * N) - jnp.searchsorted(
        sorted_keys, sorted_keys, side="left"
    )
    kf_of = order // N
    ft_of = order % N
    lane_ok = sorted_valid & (idx_in_run < MAX_OBS)
    safe_rows = jnp.where(lane_ok, sorted_pt, P - 1)
    safe_lane = jnp.where(lane_ok, idx_in_run, MAX_OBS - 1)
    obs_kf = jnp.full((P, MAX_OBS), -1, jnp.int32)
    obs_idx = jnp.full((P, MAX_OBS), -1, jnp.int32)
    obs_kf = obs_kf.at[safe_rows, safe_lane].set(
        jnp.where(lane_ok, kf_of.astype(jnp.int32), -1), mode="drop"
    )
    obs_idx = obs_idx.at[safe_rows, safe_lane].set(
        jnp.where(lane_ok, ft_of.astype(jnp.int32), -1), mode="drop"
    )
    oct_of = state.kf_kp_octave[kf_of, ft_of].astype(jnp.int8)
    obs_oct = jnp.full((P, MAX_OBS), -1, jnp.int8).at[safe_rows, safe_lane].set(
        jnp.where(lane_ok, oct_of, jnp.int8(-1)), mode="drop"
    )
    # last slot may have been dummy-written; ensure P-1 row only holds real obs
    real_last = jnp.sum(jnp.where(lane_ok & (sorted_pt == P - 1), 1, 0))
    del real_last, safe_pt
    return state._replace(pt_obs_kf=obs_kf, pt_obs_idx=obs_idx,
                          pt_obs_oct=obs_oct)


def update_connections(state: MapState, kf_slot) -> MapState:
    """Recompute covisibility row/col for one KF + spanning-tree attach.

    `KeyFrame::UpdateConnections` parity (`src/KeyFrame.cc:1010-1100`):
    count shared map points with every other KF; keep edges with weight >=
    15, but always keep the single best edge; on first connection, parent =
    top covisible KF (`src/KeyFrame.cc:1092-1097`).
    """
    K = state.kf_capacity
    pts = state.kf_kp_point[kf_slot]  # (N,)
    ok = pts >= 0
    safe = jnp.where(ok, pts, state.pt_capacity - 1)
    obs_kf = state.pt_obs_kf[safe]  # (N,MAX_OBS)
    obs_ok = ok[:, None] & (obs_kf >= 0)
    # shared-point counting as a one-hot reduction (the scatter-add over
    # N*MAX_OBS duplicate-index rows serializes on TPU; the dense compare +
    # column sum is one vector pass)
    flat_kf = jnp.where(obs_ok, obs_kf, -1).reshape(-1)
    ohk = flat_kf[:, None] == jnp.arange(K, dtype=jnp.int32)
    counts = jnp.sum(ohk.astype(jnp.int32), axis=0)
    counts = counts.at[kf_slot].set(0)
    counts = jnp.where(state.kf_valid, counts, 0)
    best = jnp.max(counts)
    best_kf = jnp.argmax(counts)
    # threshold at 15, but keep the best edge even if below (KeyFrame.cc:1051-1060)
    row = jnp.where(counts >= COVIS_MIN_WEIGHT, counts, 0)
    row = row.at[best_kf].set(jnp.where(best > 0, best, 0))
    covis = state.covis.at[kf_slot, :].set(row)
    covis = covis.at[:, kf_slot].set(row)
    # spanning tree: attach to top covisible if not yet attached and not slot 0
    need_parent = (state.kf_parent[kf_slot] < 0) & (kf_slot != 0) & (best > 0)
    parent = jnp.where(need_parent, best_kf.astype(jnp.int32),
                       state.kf_parent[kf_slot])
    return state._replace(covis=covis, kf_parent=state.kf_parent.at[kf_slot].set(parent))


def covisible_keyframes(state: MapState, kf_slot, top_n: int) -> jax.Array:
    """Top-N covisible KF slots by weight (−1 padded), like
    `KeyFrame::GetBestCovisibilityKeyFrames` (`src/KeyFrame.cc:880`)."""
    w = state.covis[kf_slot]
    vals, idx = jax.lax.top_k(w, top_n)
    return jnp.where(vals > 0, idx.astype(jnp.int32), -1)


def _distinctive_descriptors_rows(obs_kf, obs_idx, kf_desc):
    """Min-median-Hamming descriptor for B points given their (B,O)
    observation rows. Returns (desc (B,32), has_obs (B,))."""
    B, O = obs_kf.shape
    ok = obs_kf >= 0
    safe_kf = jnp.clip(obs_kf, 0)
    safe_ix = jnp.clip(obs_idx, 0)
    descs = kf_desc[safe_kf, safe_ix]  # (B,O,32)
    bits = ((descs[..., None] >> jnp.arange(8, dtype=jnp.uint8)) & 1)
    bits = bits.reshape(B, O, 256).astype(jnp.int8)
    pop = jnp.sum(bits.astype(jnp.int32), -1)  # (B,O)
    dot = jax.lax.dot_general(
        bits, bits, (((2,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.int32,
    )  # (B,O,O)
    dist = pop[:, :, None] + pop[:, None, :] - 2 * dot
    big = 1 << 20
    dist = jnp.where(ok[:, None, :] & ok[:, :, None], dist, big)
    # median over valid columns per row: sort and index at (cnt-1)//2
    cnt = jnp.sum(ok, -1)  # (B,)
    sdist = jnp.sort(dist, axis=-1)  # (B,O,O)
    mid = jnp.clip((cnt - 1) // 2, 0)[:, None]
    med = jnp.take_along_axis(
        sdist, jnp.broadcast_to(mid[:, :, None], (B, O, 1)), axis=-1
    )[..., 0]  # (B,O)
    med = jnp.where(ok, med, big)
    best = jnp.argmin(med, axis=-1)  # (B,)
    new_desc = jnp.take_along_axis(
        descs, best[:, None, None].repeat(32, -1), axis=1
    )[:, 0]
    return new_desc, cnt > 0


def compute_distinctive_descriptors(state: MapState, pt_mask: jax.Array) -> MapState:
    """Min-median-Hamming descriptor per point over its observations.

    `MapPoint::ComputeDistinctiveDescriptors` parity (`src/MapPoint.cc` —
    choose the observed descriptor whose median distance to the others is
    least). Vectorized over all points in pt_mask at once.
    """
    obs_kf = jnp.where(pt_mask[:, None], state.pt_obs_kf, -1)
    new_desc, has = _distinctive_descriptors_rows(
        obs_kf, state.pt_obs_idx, state.kf_desc
    )
    upd = pt_mask & has
    return state._replace(
        pt_desc=jnp.where(upd[:, None], new_desc, state.pt_desc)
    )


def compute_distinctive_descriptors_idx(state: MapState, idx: jax.Array,
                                        idx_ok: jax.Array) -> MapState:
    """Compacted variant: update only the B point slots in `idx` (masked by
    idx_ok) — O(B·O²) instead of O(P·O²) for the full-map variant."""
    P = state.pt_capacity
    safe = jnp.where(idx_ok, idx, P - 1)
    obs_kf = jnp.where(idx_ok[:, None], state.pt_obs_kf[safe], -1)
    obs_idx = state.pt_obs_idx[safe]
    new_desc, has = _distinctive_descriptors_rows(obs_kf, obs_idx,
                                                  state.kf_desc)
    upd = idx_ok & has
    # idx rows are unique (one point per keyframe feature); dead -> OOB
    pt_desc = state.pt_desc.at[jnp.where(upd, idx, P)].set(
        new_desc, mode="drop", unique_indices=True
    )
    return state._replace(pt_desc=pt_desc)


def _normal_and_depth_rows(pt_pos, pt_ref_kf, obs_kf, obs_idx,
                           kf_pose, kf_kp_octave,
                           scale_factors, n_levels: int):
    """Normal + distance band for B points given their (B,O) observation
    rows. Returns (normal (B,3), min_d (B,), max_d (B,), has_obs (B,))."""
    scale_factors = jnp.asarray(scale_factors)
    B, O = obs_kf.shape
    ok = obs_kf >= 0
    safe_kf = jnp.clip(obs_kf, 0)
    from ..geometry import se3

    Twc = se3.se3_inv(kf_pose)  # (K,4,4)
    centers = Twc[:, :3, 3]  # (K,3)
    cams = centers[safe_kf]  # (B,O,3)
    diff = pt_pos[:, None, :] - cams
    norm = jnp.linalg.norm(diff, axis=-1, keepdims=True).clip(1e-12)
    units = diff / norm
    cnt = jnp.sum(ok, -1).clip(1)
    normal = jnp.sum(
        jnp.where(ok[:, None], units.transpose(0, 2, 1), 0.0), -1
    ) / cnt[:, None]
    # reference-KF distance + octave
    ref = jnp.clip(pt_ref_kf, 0)
    ref_center = centers[ref]
    dist = jnp.linalg.norm(pt_pos - ref_center, axis=-1)
    # feature index of the ref observation: lane where obs_kf == ref
    is_ref = obs_kf == pt_ref_kf[:, None]
    lane = jnp.argmax(is_ref, axis=-1)
    has_ref = is_ref.any(axis=-1)
    fidx = jnp.where(has_ref, obs_idx[jnp.arange(B), lane], 0)
    octv = kf_kp_octave[ref, jnp.clip(fidx, 0)]
    level_factor = scale_factors[jnp.clip(octv, 0, n_levels - 1)]
    max_d = dist * level_factor
    min_d = max_d / scale_factors[n_levels - 1]
    return normal, min_d, max_d, jnp.sum(ok, -1) > 0


def update_normal_and_depth(state: MapState, pt_mask: jax.Array,
                            scale_factors: jax.Array, n_levels: int) -> MapState:
    """`MapPoint::UpdateNormalAndDepth` parity: normal = mean of unit
    vectors point->camera-center over observations; distance band from the
    reference KF's octave: max = dist * scale^octave, min = max / scale^(L-1)."""
    obs_kf = jnp.where(pt_mask[:, None], state.pt_obs_kf, -1)
    normal, min_d, max_d, has = _normal_and_depth_rows(
        state.pt_pos, state.pt_ref_kf, obs_kf, state.pt_obs_idx,
        state.kf_pose, state.kf_kp_octave, scale_factors, n_levels,
    )
    upd = pt_mask & has
    return state._replace(
        pt_normal=jnp.where(upd[:, None], normal, state.pt_normal),
        pt_max_dist=jnp.where(upd, max_d, state.pt_max_dist),
        pt_min_dist=jnp.where(upd, min_d, state.pt_min_dist),
    )


# ---------------------------------------------------------------------------
# Slot recycling — long sequences must not hard-stop at capacity
# (VERDICT r1 weak #10). Allocation is monotone (add_points/add_keyframe
# append at n_pt/n_kf) while culling leaves holes; compaction renumbers the
# live slots to a dense prefix so the allocator regains the freed space.
# The reference needs none of this (heap pointers), but its KeyFrame ids
# grow unboundedly too — slot order is preserved, so slot-id arithmetic
# (point age, spanning-tree parent-before-child) stays valid.
# ---------------------------------------------------------------------------


@jax.jit
def compact_points(state: MapState) -> tuple[MapState, jax.Array]:
    """Renumber valid points into a dense prefix.

    Returns (state, new_of_old (P,) i32 with -1 for dead slots) — callers
    holding point slots (tracker's last_matched) remap through it."""
    P = state.pt_capacity
    valid = state.pt_valid
    new_of_old = jnp.where(valid, jnp.cumsum(valid.astype(jnp.int32)) - 1, -1)
    order = jnp.argsort(~valid, stable=True)  # valid first, order kept

    def reord(arr):
        return arr[order]

    fwd = state.kf_kp_point
    fwd = jnp.where(fwd >= 0, new_of_old[jnp.clip(fwd, 0)], fwd)
    state = state._replace(
        pt_pos=reord(state.pt_pos),
        pt_valid=reord(state.pt_valid),
        pt_desc=reord(state.pt_desc),
        pt_normal=reord(state.pt_normal),
        pt_min_dist=reord(state.pt_min_dist),
        pt_max_dist=reord(state.pt_max_dist),
        pt_ref_kf=jnp.where(reord(state.pt_valid), reord(state.pt_ref_kf), -1),
        pt_first_kf=reord(state.pt_first_kf),
        pt_visible=reord(state.pt_visible),
        pt_found=reord(state.pt_found),
        pt_obs_kf=reord(state.pt_obs_kf),
        pt_obs_idx=reord(state.pt_obs_idx),
        pt_obs_oct=reord(state.pt_obs_oct),
        kf_kp_point=fwd,
        n_pt=jnp.sum(valid.astype(jnp.int32)),
    )
    del P
    return state, new_of_old


@jax.jit
def compact_keyframes(state: MapState) -> tuple[MapState, jax.Array]:
    """Renumber valid keyframes into a dense prefix (slot order kept, so a
    parent still precedes its children). Returns (state, new_of_old (K,))
    — callers holding KF slots (BoW store rows, tracker ref_kf) remap."""
    K = state.kf_capacity
    valid = state.kf_valid
    new_of_old = jnp.where(valid, jnp.cumsum(valid.astype(jnp.int32)) - 1, -1)
    order = jnp.argsort(~valid, stable=True)

    def reord(arr):
        return arr[order]

    def remap(ids):
        return jnp.where(ids >= 0, new_of_old[jnp.clip(ids, 0)], ids)

    covis = state.covis[order][:, order]
    covis = jnp.where(reord(valid)[:, None] & reord(valid)[None, :], covis, 0)
    state = state._replace(
        kf_pose=reord(state.kf_pose),
        kf_valid=reord(state.kf_valid),
        kf_timestamp=reord(state.kf_timestamp),
        kf_frame_id=reord(state.kf_frame_id),
        kf_kp_xy=reord(state.kf_kp_xy),
        kf_kp_ur=reord(state.kf_kp_ur),
        kf_kp_depth=reord(state.kf_kp_depth),
        kf_kp_octave=reord(state.kf_kp_octave),
        kf_kp_angle=reord(state.kf_kp_angle),
        kf_kp_valid=reord(state.kf_kp_valid),
        kf_desc=reord(state.kf_desc),
        kf_kp_point=reord(state.kf_kp_point),
        covis=covis,
        kf_parent=remap(reord(state.kf_parent)),
        kf_loop_edges=remap(reord(state.kf_loop_edges)),
        pt_obs_kf=remap(state.pt_obs_kf),
        pt_ref_kf=remap(state.pt_ref_kf),
        pt_first_kf=remap(state.pt_first_kf),
        n_kf=jnp.sum(valid.astype(jnp.int32)),
    )
    del K
    return state, new_of_old


def update_normal_and_depth_idx(state: MapState, idx: jax.Array,
                                idx_ok: jax.Array,
                                scale_factors: jax.Array,
                                n_levels: int) -> MapState:
    """Compacted variant of `update_normal_and_depth` over B point slots."""
    P = state.pt_capacity
    safe = jnp.where(idx_ok, idx, P - 1)
    obs_kf = jnp.where(idx_ok[:, None], state.pt_obs_kf[safe], -1)
    normal, min_d, max_d, has = _normal_and_depth_rows(
        state.pt_pos[safe], state.pt_ref_kf[safe], obs_kf,
        state.pt_obs_idx[safe], state.kf_pose, state.kf_kp_octave,
        scale_factors, n_levels,
    )
    upd = idx_ok & has
    drop = jnp.where(upd, idx, P)  # idx unique per call; dead -> OOB
    return state._replace(
        pt_normal=state.pt_normal.at[drop].set(
            normal, mode="drop", unique_indices=True),
        pt_max_dist=state.pt_max_dist.at[drop].set(
            max_d, mode="drop", unique_indices=True),
        pt_min_dist=state.pt_min_dist.at[drop].set(
            min_d, mode="drop", unique_indices=True),
    )
