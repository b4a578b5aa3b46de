"""Boost-binary-archive map converter — reference format parity.

The reference saves maps with `boost::archive::binary_oarchive(no_header)`
(`src/System.cc:556,568`). Its record layout is fully hand-rolled primitives
(SURVEY.md §5.4): `Map::save` (`src/Map.cc:31-74`) writes

    [i32 nPoints][MapPoint...][i32 nKFs][KeyFrame...][i32 nOrigins]
    [KeyFrame...][u64 mnMaxKFid][u32 0xdeadbeef][dead tail: points again]

with `MapPoint::save` (`src/MapPoint.cc:58-140`) and `KeyFrame::save`
(`src/KeyFrame.cc:86-307`) emitting primitives in declaration order, cv::Mat
as {i32 cols, i32 rows, u64 elem_size, u64 elem_type, raw data}
(`include/MapPoint.h:212-231`) and cv::KeyPoint as {f32 angle, i32 class_id,
i32 octave, f32 response, f32 response, f32 x, f32 y} — the reference's
DOUBLE-WRITTEN response and MISSING size quirks preserved verbatim
(`include/MapPoint.h:197-207`).

Encoding assumptions (documented; boost is not installed in this
environment so they are validated by round-trip, not against upstream):
- x86-64 Linux boost binary archive: int=4B LE, long=8B, long unsigned=8B,
  size_t=8B, float=4B, double=8B, bool=1B;
- `no_header` archives carry no magic/version preamble;
- std::vector<T> of class type writes {u64 count, u32 item_version} then
  items; vector<float> writes {u64 count} then raw floats (boost's
  fast-array path); the item_version value written is 0.

The quirk set (`MapPoint::save` early-returns for bad points so the
count over-reports; `Map::save` writes the point block twice with the
second copy never read back) is reproduced on write and tolerated on read
exactly like `Map::load` (`src/Map.cc:76-133`).
"""

from __future__ import annotations

import struct
from pathlib import Path

import numpy as np

from ..slammap import mapstate as ms
from ..slammap.mapstate import MapState

TEST_DATA = 0xDEADBEEF


class _Writer:
    def __init__(self):
        self.buf = bytearray()

    def i32(self, v):
        self.buf += struct.pack("<i", int(v))

    def u32(self, v):
        self.buf += struct.pack("<I", int(v) & 0xFFFFFFFF)

    def u64(self, v):
        self.buf += struct.pack("<Q", int(v))

    def i64(self, v):
        self.buf += struct.pack("<q", int(v))

    def f32(self, v):
        self.buf += struct.pack("<f", float(v))

    def f64(self, v):
        self.buf += struct.pack("<d", float(v))

    def boolean(self, v):
        self.buf += struct.pack("<?", bool(v))

    def raw(self, b):
        self.buf += bytes(b)


class _Reader:
    def __init__(self, data: bytes):
        self.data = data
        self.off = 0

    def _take(self, fmt, n):
        v = struct.unpack_from(fmt, self.data, self.off)[0]
        self.off += n
        return v

    def i32(self):
        return self._take("<i", 4)

    def u32(self):
        return self._take("<I", 4)

    def u64(self):
        return self._take("<Q", 8)

    def i64(self):
        return self._take("<q", 8)

    def f32(self):
        return self._take("<f", 4)

    def f64(self):
        return self._take("<d", 8)

    def boolean(self):
        return self._take("<?", 1)

    def raw(self, n):
        b = self.data[self.off : self.off + n]
        self.off += n
        return b


def _write_mat(w: _Writer, arr: np.ndarray, elem_type: int):
    """cv::Mat serializer parity (`include/MapPoint.h:212-231`)."""
    arr = np.atleast_2d(arr)
    w.i32(arr.shape[1])  # cols
    w.i32(arr.shape[0])  # rows
    w.u64(arr.itemsize)  # elem_size
    w.u64(elem_type)  # cv type id (5=CV_32F, 0=CV_8U)
    w.raw(arr.tobytes())


def _read_mat(r: _Reader) -> np.ndarray:
    cols = r.i32()
    rows = r.i32()
    elem_size = r.u64()
    elem_type = r.u64()
    data = r.raw(cols * rows * elem_size)
    dtype = {0: np.uint8, 5: np.float32, 6: np.float64}.get(elem_type & 7,
                                                            np.uint8)
    if cols * rows == 0:
        return np.zeros((rows, cols), dtype)
    return np.frombuffer(data, dtype).reshape(rows, cols).copy()


def _write_keypoint(w: _Writer, x, y, octave, angle, response):
    """cv::KeyPoint quirk parity: response TWICE, no size
    (`include/MapPoint.h:197-207`)."""
    w.f32(angle)
    w.i32(-1)  # class_id
    w.i32(octave)
    w.f32(response)
    w.f32(response)  # [sic] duplicated in the reference
    w.f32(x)
    w.f32(y)


def _read_keypoint(r: _Reader):
    angle = r.f32()
    r.i32()  # class_id
    octave = r.i32()
    response = r.f32()
    r.f32()  # duplicate response
    x = r.f32()
    y = r.f32()
    return x, y, octave, angle, response


def _write_kp_vector(w: _Writer, kps):
    w.u64(len(kps))
    w.u32(0)  # item_version
    for kp in kps:
        _write_keypoint(w, *kp)


def _read_kp_vector(r: _Reader):
    n = r.u64()
    r.u32()
    return [_read_keypoint(r) for _ in range(n)]


def _write_f32_vector(w: _Writer, vals):
    w.u64(len(vals))
    w.raw(np.asarray(vals, np.float32).tobytes())


def _read_f32_vector(r: _Reader):
    n = r.u64()
    return np.frombuffer(r.raw(4 * n), np.float32).copy()


def save_boost_map(path: str | Path, state: MapState, cam_params=None,
                   scale_factor: float = 1.5, n_levels: int = 4) -> None:
    """Write a MapState in the reference's archive layout
    (`Map::save`, `src/Map.cc:31-74`)."""
    w = _Writer()
    kf_valid = np.asarray(state.kf_valid)
    pt_valid = np.asarray(state.pt_valid)
    kf_ids = np.nonzero(kf_valid)[0]
    pt_ids = np.nonzero(pt_valid)[0]
    cam = cam_params or {}

    def write_points():
        w.i32(len(pt_ids))
        for p in pt_ids:
            _write_mappoint(w, state, int(p))

    write_points()
    w.i32(len(kf_ids))
    for k in kf_ids:
        _write_keyframe(w, state, int(k), cam, scale_factor, n_levels)
    # origins: the first keyframe (Map.cc mvpKeyFrameOrigins)
    n_orig = 1 if len(kf_ids) else 0
    w.i32(n_orig)
    if n_orig:
        _write_keyframe(w, state, int(kf_ids[0]), cam, scale_factor, n_levels)
    w.u64(int(np.max(kf_ids)) if len(kf_ids) else 0)  # mnMaxKFid
    w.u32(TEST_DATA)
    write_points()  # dead tail, never read back (Map.cc:68-73)
    Path(path).write_bytes(bytes(w.buf))


def _write_mappoint(w: _Writer, state: MapState, p: int):
    """`MapPoint::save` field order (`src/MapPoint.cc:58-140`)."""
    w.u64(p)  # mnId
    w.u64(int(state.n_pt))  # nNextId
    w.i64(int(state.pt_first_kf[p]))  # mnFirstKFid
    w.i64(0)  # mnFirstFrame
    w.i32(int(np.sum(np.asarray(state.pt_obs_kf[p]) >= 0)))  # nObs
    w.f32(0.0)  # mTrackProjX
    w.f32(0.0)  # mTrackProjY
    w.f32(0.0)  # mTrackProjXR
    w.boolean(False)  # mbTrackInView
    w.i32(0)  # mnTrackScaleLevel
    w.f32(0.0)  # mTrackViewCos
    for _ in range(7):  # mnTrackReferenceForFrame..mnCorrectedReference
        w.u64(0)
    _write_mat(w, np.zeros((0, 0), np.float32), 5)  # mPosGBA (empty)
    w.u64(0)  # mnBAGlobalForKF
    _write_mat(w, np.asarray(state.pt_pos[p], np.float32).reshape(3, 1), 5)
    # observations as {bool, KFid u64, featIdx u64}
    obs_kf = np.asarray(state.pt_obs_kf[p])
    obs_ix = np.asarray(state.pt_obs_idx[p])
    sel = obs_kf >= 0
    w.u32(int(sel.sum()))  # nItems (unsigned int in MapPoint::save)
    for kf, ix in zip(obs_kf[sel], obs_ix[sel]):
        w.boolean(True)
        w.u64(int(kf))
        w.u64(int(ix))
    _write_mat(w, np.asarray(state.pt_normal[p], np.float32).reshape(3, 1), 5)
    _write_mat(w, np.asarray(state.pt_desc[p], np.uint8).reshape(1, 32), 0)
    ref = int(state.pt_ref_kf[p])
    if ref >= 0:
        w.boolean(True)
        w.u64(ref)
    else:
        w.boolean(False)
    w.i32(int(state.pt_visible[p]))
    w.i32(int(state.pt_found[p]))
    w.boolean(False)  # mbBad
    w.f32(float(state.pt_min_dist[p]))
    w.f32(float(state.pt_max_dist[p]))


def _write_keyframe(w: _Writer, state: MapState, k: int, cam: dict,
                    scale_factor: float, n_levels: int):
    """`KeyFrame::save` field order (`src/KeyFrame.cc:86-307`)."""
    N = state.n_features
    valid = np.asarray(state.kf_kp_valid[k])
    w.u64(int(state.n_kf))  # nNextId
    w.u64(k)  # mnId
    w.u64(int(state.kf_frame_id[k]))  # mnFrameId
    w.f64(float(state.kf_timestamp[k]))
    w.i32(64)  # mnGridCols (Frame.h:37)
    w.i32(48)  # mnGridRows
    w.f32(64.0 / cam.get("width", 640))
    w.f32(48.0 / cam.get("height", 480))
    for _ in range(5):  # mnTrackReferenceForFrame..mnLoopQuery
        w.u64(0)
    w.i32(0)  # mnLoopWords
    w.f32(0.0)  # mLoopScore
    w.u64(0)  # mnRelocQuery
    w.i32(0)  # mnRelocWords
    w.f32(0.0)  # mRelocScore
    _write_mat(w, np.zeros((0, 0), np.float32), 5)  # mTcwGBA
    _write_mat(w, np.zeros((0, 0), np.float32), 5)  # mTcwBefGBA
    w.u64(0)  # mnBAGlobalForKF
    fx = cam.get("fx", 1.0)
    fy = cam.get("fy", 1.0)
    w.f32(fx)
    w.f32(fy)
    w.f32(cam.get("cx", 0.0))
    w.f32(cam.get("cy", 0.0))
    w.f32(1.0 / fx)
    w.f32(1.0 / fy)
    w.f32(cam.get("bf", 0.0))
    w.f32(cam.get("bf", 0.0) / fx)  # mb
    w.f32(cam.get("th_depth", 0.0))
    n_valid = int(valid.sum())
    w.i32(n_valid)  # N
    xy = np.asarray(state.kf_kp_xy[k])
    octv = np.asarray(state.kf_kp_octave[k])
    ang = np.asarray(state.kf_kp_angle[k])
    kps = [
        (xy[i, 0], xy[i, 1], int(octv[i]), float(ang[i]), 0.0)
        for i in range(N) if valid[i]
    ]
    _write_kp_vector(w, kps)  # mvKeys (raw coords unavailable: und used)
    _write_kp_vector(w, kps)  # mvKeysUn
    _write_f32_vector(w, np.asarray(state.kf_kp_ur[k])[valid])
    _write_f32_vector(w, np.asarray(state.kf_kp_depth[k])[valid])
    _write_mat(w, np.asarray(state.kf_desc[k])[valid], 0)  # mDescriptors
    _write_mat(w, np.eye(4, dtype=np.float32), 5)  # mTcp
    w.i32(n_levels)
    w.f32(scale_factor)
    w.f32(float(np.log(scale_factor)))
    sf = np.array([scale_factor**i for i in range(n_levels)], np.float32)
    _write_f32_vector(w, sf)
    _write_f32_vector(w, sf**2)
    _write_f32_vector(w, 1.0 / sf**2)
    w.i32(0)  # mnMinX
    w.i32(0)  # mnMinY
    w.i32(int(cam.get("width", 640)))
    w.i32(int(cam.get("height", 480)))
    K = np.array([[fx, 0, cam.get("cx", 0.0)], [0, fy, cam.get("cy", 0.0)],
                  [0, 0, 1]], np.float32)
    _write_mat(w, K, 5)
    Tcw = np.asarray(state.kf_pose[k], np.float32)
    Twc = np.linalg.inv(Tcw).astype(np.float32)
    _write_mat(w, Tcw, 5)
    _write_mat(w, Twc, 5)
    _write_mat(w, Twc[:3, 3].reshape(3, 1), 5)  # Ow
    _write_mat(w, Twc[:3, 3].reshape(3, 1), 5)  # Cw (stereo center; = Ow mono)
    # map point ids per feature ({bool is_id, u64 id} like KeyFrame.cc:152-170)
    fwd = np.asarray(state.kf_kp_point[k])[valid]
    w.i32(len(fwd))
    for pid in fwd:
        if pid < 0:
            w.boolean(False)
        else:
            w.boolean(True)
            w.u64(int(pid))
    # grid: serialized sizes only (empty rebuilt on load via SetGridParams)
    # connected keyframe weights {bool, u64 id, i32 weight}
    covis = np.asarray(state.covis[k])
    conn = np.nonzero(covis > 0)[0]
    w.i32(len(conn))
    for j in conn:
        w.boolean(True)
        w.u64(int(j))
        w.i32(int(covis[j]))
    # ordered covisibles (ids by descending weight)
    order = conn[np.argsort(-covis[conn])]
    w.i32(len(order))
    for j in order:
        w.boolean(True)
        w.u64(int(j))
    # spanning tree: parent, children, loop edges
    parent = int(state.kf_parent[k])
    if parent >= 0:
        w.boolean(True)
        w.u64(parent)
    else:
        w.boolean(False)
    children = np.nonzero(np.asarray(state.kf_parent) == k)[0]
    w.i32(len(children))
    for c in children:
        w.boolean(True)
        w.u64(int(c))
    loops = np.asarray(state.kf_loop_edges[k])
    loops = loops[loops >= 0]
    w.i32(len(loops))
    for l in loops:
        w.boolean(True)
        w.u64(int(l))


def load_boost_map(path: str | Path, max_keyframes: int = 512,
                   max_points: int = 65536, n_features: int = 2048
                   ) -> MapState:
    """Read the archive back into a MapState (`Map::load`,
    `src/Map.cc:76-133` + the System rebinding passes `System.cc:148-195`,
    which collapse to array writes here)."""
    import jax.numpy as jnp

    r = _Reader(Path(path).read_bytes())
    n_pts = r.i32()
    points = [_read_mappoint(r) for _ in range(n_pts)]
    n_kfs = r.i32()
    kfs = [_read_keyframe(r) for _ in range(n_kfs)]
    n_orig = r.i32()
    for _ in range(n_orig):
        _read_keyframe(r)
    max_kf_id = r.u64()
    sentinel = r.u32()
    if sentinel != TEST_DATA:
        raise ValueError(f"sentinel mismatch: {sentinel:#x}")
    del max_kf_id  # dead tail after this is ignored, like Map::load

    state = ms.empty_map(max_keyframes, max_points, n_features)
    state_np = {k: np.asarray(v).copy() for k, v in state._asdict().items()}
    for kf in kfs:
        k = kf["id"]
        n = min(len(kf["kps"]), n_features)
        state_np["kf_valid"][k] = True
        state_np["kf_timestamp"][k] = kf["timestamp"]
        state_np["kf_frame_id"][k] = kf["frame_id"]
        state_np["kf_pose"][k] = kf["Tcw"]
        for i in range(n):
            x, y, octave, angle, resp = kf["kps"][i]
            state_np["kf_kp_xy"][k, i] = (x, y)
            state_np["kf_kp_octave"][k, i] = octave
            state_np["kf_kp_angle"][k, i] = angle
            state_np["kf_kp_valid"][k, i] = True
        state_np["kf_kp_ur"][k, :n] = kf["ur"][:n]
        state_np["kf_kp_depth"][k, :n] = kf["depth"][:n]
        state_np["kf_desc"][k, :n] = kf["desc"][:n]
        state_np["kf_kp_point"][k, :n] = kf["points"][:n]
        for j, wgt in kf["connections"]:
            state_np["covis"][k, j] = wgt
        state_np["kf_parent"][k] = kf["parent"]
        for i, l in enumerate(kf["loops"][: ms.MAX_LOOP_EDGES]):
            state_np["kf_loop_edges"][k, i] = l
    for pt in points:
        p = pt["id"]
        state_np["pt_valid"][p] = True
        state_np["pt_pos"][p] = pt["pos"]
        state_np["pt_normal"][p] = pt["normal"]
        state_np["pt_desc"][p] = pt["desc"]
        state_np["pt_ref_kf"][p] = pt["ref_kf"]
        state_np["pt_first_kf"][p] = pt["first_kf"]
        state_np["pt_visible"][p] = pt["visible"]
        state_np["pt_found"][p] = pt["found"]
        state_np["pt_min_dist"][p] = pt["min_dist"]
        state_np["pt_max_dist"][p] = pt["max_dist"]
        for lane, (kf, ix) in enumerate(pt["obs"][: ms.MAX_OBS]):
            state_np["pt_obs_kf"][p, lane] = kf
            state_np["pt_obs_idx"][p, lane] = ix
            state_np["pt_obs_oct"][p, lane] = np.int8(
                state_np["kf_kp_octave"][kf, ix]
            )
    state_np["n_kf"] = np.int32(max((kf["id"] for kf in kfs), default=-1) + 1)
    state_np["n_pt"] = np.int32(max((pt["id"] for pt in points), default=-1) + 1)
    import jax

    return jax.tree.map(jnp.asarray, MapState(**state_np))


def _read_mappoint(r: _Reader) -> dict:
    out = {}
    out["id"] = r.u64()
    r.u64()  # nNextId
    out["first_kf"] = r.i64()
    r.i64()  # mnFirstFrame
    r.i32()  # nObs
    r.f32()
    r.f32()
    r.f32()
    r.boolean()
    r.i32()
    r.f32()
    for _ in range(7):
        r.u64()
    _read_mat(r)  # mPosGBA
    r.u64()
    out["pos"] = _read_mat(r).ravel()
    n_obs = r.u32()
    obs = []
    for _ in range(n_obs):
        if r.boolean():
            kf = r.u64()
            ix = r.u64()
            obs.append((kf, ix))
    out["obs"] = obs
    out["normal"] = _read_mat(r).ravel()
    out["desc"] = _read_mat(r).ravel()
    out["ref_kf"] = r.u64() if r.boolean() else -1
    out["visible"] = r.i32()
    out["found"] = r.i32()
    r.boolean()  # mbBad
    out["min_dist"] = r.f32()
    out["max_dist"] = r.f32()
    return out


def _read_keyframe(r: _Reader) -> dict:
    out = {}
    r.u64()  # nNextId
    out["id"] = r.u64()
    out["frame_id"] = r.u64()
    out["timestamp"] = r.f64()
    r.i32()
    r.i32()
    r.f32()
    r.f32()
    for _ in range(5):
        r.u64()
    r.i32()
    r.f32()
    r.u64()
    r.i32()
    r.f32()
    _read_mat(r)
    _read_mat(r)
    r.u64()
    for _ in range(9):  # fx..mThDepth
        r.f32()
    r.i32()  # N
    out["kps"] = _read_kp_vector(r)  # mvKeys
    out["kps_un"] = _read_kp_vector(r)
    out["ur"] = _read_f32_vector(r)
    out["depth"] = _read_f32_vector(r)
    out["desc"] = _read_mat(r)
    _read_mat(r)  # mTcp
    r.i32()  # levels
    r.f32()
    r.f32()
    _read_f32_vector(r)
    _read_f32_vector(r)
    _read_f32_vector(r)
    r.i32()
    r.i32()
    r.i32()
    r.i32()
    _read_mat(r)  # mK
    out["Tcw"] = _read_mat(r)
    _read_mat(r)  # Twc
    _read_mat(r)  # Ow
    _read_mat(r)  # Cw
    n = r.i32()
    pts = np.full(n, -1, np.int64)
    for i in range(n):
        if r.boolean():
            pts[i] = r.u64()
    out["points"] = pts
    n = r.i32()
    conns = []
    for _ in range(n):
        if r.boolean():
            j = r.u64()
            wgt = r.i32()
            conns.append((j, wgt))
    out["connections"] = conns
    n = r.i32()
    for _ in range(n):
        if r.boolean():
            r.u64()
    out["parent"] = r.u64() if r.boolean() else -1
    n = r.i32()
    for _ in range(n):
        if r.boolean():
            r.u64()
    n = r.i32()
    loops = []
    for _ in range(n):
        if r.boolean():
            loops.append(r.u64())
    out["loops"] = loops
    return out
