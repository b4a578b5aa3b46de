"""Device time of STATE-mutating mapping pieces: chain the mutated state
itself through a 20-iteration scan (no DCE possible), one block."""
import os
import sys
import time
from pathlib import Path

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax_tpu")
sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import jax
import jax.numpy as jnp
import numpy as np

import bench as bench_mod
from orbslam_mapsave_tpu import config as config_mod
from orbslam_mapsave_tpu.pipeline import system as system_mod
from orbslam_mapsave_tpu.pipeline import local_mapping as lmod
from orbslam_mapsave_tpu.slammap import mapstate as ms

CH = 20

data = bench_mod.get_sequence()
voc = bench_mod.get_vocabulary(data, config_mod, system_mod)
slam = bench_mod.make_system(voc, config_mod, system_mod)
frames_dev = [(jnp.asarray(g, jnp.float32), jnp.asarray(d, jnp.float32))
              for g, d in data["frames"][:110]]
jax.block_until_ready(frames_dev)
for i, (g, d) in enumerate(frames_dev):
    slam.track_rgbd(g, d, 1000.0 + i / 30.0)
slam.tracker.flush()
state = slam.tracker.map
mapper = slam.mapper
kf = int(np.nonzero(np.asarray(state.kf_valid))[0][-1])
kfj = jnp.asarray(kf, jnp.int32)
print("kfs", slam.n_keyframes, "pts", slam.n_points, flush=True)

trivial = jax.jit(lambda x: x + 1.0)
jax.block_until_ready(trivial(jnp.float32(1.0)))
ts = []
for _ in range(9):
    t0 = time.perf_counter()
    jax.block_until_ready(trivial(jnp.float32(1.0)))
    ts.append(time.perf_counter() - t0)
RTT = float(np.median(ts))
print(f"rtt {RTT*1e3:.1f} ms", flush=True)


def chain_state(label, piece):
    @jax.jit
    def run(st):
        def body(st, _):
            return piece(st), None
        st, _ = jax.lax.scan(body, st, None, length=CH)
        return st.pt_pos[0, 0] + st.n_pt
    jax.block_until_ready(run(state))
    best = 1e9
    for _ in range(3):
        t0 = time.perf_counter()
        jax.block_until_ready(run(state))
        best = min(best, time.perf_counter() - t0)
    print(f"{label:30s} {1e3*(best-RTT)/CH:7.2f} ms", flush=True)


inv2 = mapper.inv_level_sigma2
cam = slam.cam
bounds = slam.builder.bounds
sf = slam.builder.scale_factors
tri = mapper.triangulate_pair
cand = jnp.arange(4096, dtype=jnp.int32)

chain_state("keyframe_culling", lambda st: lmod.keyframe_culling(st, kfj))
chain_state("recent_point_culling", lambda st: lmod.recent_point_culling(
    st, jnp.ones(st.pt_capacity, bool) & st.pt_valid, kfj, False))
chain_state("update_connections", lambda st: ms.update_connections(st, kfj))


def p_desc(st):
    own = st.kf_kp_point[kfj]
    return ms.compute_distinctive_descriptors_idx(st, jnp.clip(own, 0),
                                                  own >= 0)
chain_state("distinctive_desc (own)", p_desc)


def p_nrm(st):
    own = st.kf_kp_point[kfj]
    return ms.update_normal_and_depth_idx(st, jnp.clip(own, 0), own >= 0,
                                          jnp.asarray(sf), 4)
chain_state("normal_and_depth (own)", p_nrm)


def p_tri(st):
    neigh = ms.covisible_keyframes(st, kfj, mapper.n_tri_neighbors)
    st2, slots = tri.batched(st, kfj, neigh)
    st2 = tri.finalize_idx(st2, jnp.clip(slots, 0), slots >= 0)
    return st2
chain_state("triangulation+finalize", p_tri)

chain_state("fwd fuse", lambda st: lmod.fuse_into_keyframe(
    st, kfj, cand, cam, bounds, sf, inv2, 4, 1.5))


def p_ba(st):
    st2, d, e = mapper._ba(st, kfj, jnp.asarray(False))
    return st2
chain_state("_ba", p_ba)

chain_state("FULL map_step", lambda st: mapper._map_step(
    st, kfj, jnp.asarray(0, jnp.int32), jnp.asarray(False))[0])


def p_revfuse(st):
    """The combined reverse-fuse block exactly as _map_step runs it."""
    P = st.pt_capacity
    neigh = ms.covisible_keyframes(st, kfj, mapper.n_tri_neighbors)
    own_pts = st.kf_kp_point[kfj]
    n_rev = min(lmod.N_REV_FUSE, int(neigh.shape[0]))
    N = own_pts.shape[0]

    def match_neighbor(i, wins):
        nb = neigh[i]

        def do(_):
            return lmod.fuse_match(st, nb, own_pts, cam, bounds, sf, inv2,
                                   4, 1.5)
        w = jax.lax.cond(nb >= 0, do,
                         lambda _: jnp.full((N,), -1, jnp.int32), None)
        return wins.at[i].set(w)

    wins = jax.lax.fori_loop(0, n_rev, match_neighbor,
                             jnp.full((n_rev, N), -1, jnp.int32))
    nb_rows = jnp.broadcast_to(neigh[:n_rev, None], (n_rev, N)).reshape(-1)
    feat_rows = jnp.broadcast_to(jnp.arange(N, dtype=jnp.int32)[None, :],
                                 (n_rev, N)).reshape(-1)
    wflat = wins.reshape(-1)
    cand_pt = jnp.where(wflat >= 0, own_pts[jnp.clip(wflat, 0)], -1)
    cand_pt = jnp.where((cand_pt >= 0) & (nb_rows >= 0)
                        & st.pt_valid[jnp.clip(cand_pt, 0)], cand_pt, -1)
    existing = st.kf_kp_point[jnp.clip(nb_rows, 0), feat_rows]
    obs_cnt = jnp.sum((st.pt_obs_kf >= 0).astype(jnp.int32), -1)
    mergeable = (cand_pt >= 0) & (existing >= 0) & (existing != cand_pt)
    keep_exist = obs_cnt[jnp.clip(existing, 0)] > obs_cnt[jnp.clip(cand_pt, 0)]
    src = jnp.where(mergeable, jnp.where(keep_exist, cand_pt, existing), -1)
    dst = jnp.where(mergeable, jnp.where(keep_exist, existing, cand_pt), -1)
    rows = jnp.arange(src.shape[0], dtype=jnp.int32)
    first_of_src = jnp.full(P, 1 << 30, jnp.int32).at[
        jnp.where(src >= 0, src, P - 1)].min(
        jnp.where(src >= 0, rows, 1 << 30), mode="drop")
    is_first = (src >= 0) & (first_of_src[jnp.clip(src, 0)] == rows)
    src_flag = jnp.zeros(P + 1, bool).at[jnp.where(src >= 0, src, P)].set(True)[:P]
    first_of_dst = jnp.full(P, 1 << 30, jnp.int32).at[
        jnp.where(dst >= 0, dst, P - 1)].min(
        jnp.where(dst >= 0, rows, 1 << 30), mode="drop")
    dst_first = (dst >= 0) & (first_of_dst[jnp.clip(dst, 0)] == rows)
    ok_pair = is_first & dst_first & ~src_flag[jnp.clip(dst, 0)]
    src = jnp.where(ok_pair, src, -1)
    dst = jnp.where(ok_pair, dst, -1)
    st = ms.merge_points(st, src, dst, ok_pair)
    addable = (cand_pt >= 0) & (existing < 0) & st.pt_valid[jnp.clip(cand_pt, 0)]
    blk = rows // N
    dupkey = jnp.where(addable, blk * P + cand_pt, n_rev * P)
    first_of_pair = jnp.full(n_rev * P + 1, 1 << 30, jnp.int32).at[dupkey].min(
        jnp.where(addable, rows, 1 << 30), mode="drop")
    addable = addable & (first_of_pair[jnp.clip(blk * P + cand_pt, 0, n_rev * P)] == rows)
    st = ms.add_observations_rows_dup(st, nb_rows,
                                      jnp.where(addable, cand_pt, -1),
                                      feat_rows, addable)
    return st


chain_state("REVERSE fuse block", p_revfuse)


def p_merge_only(st):
    src = jnp.full(3 * 2048, -1, jnp.int32)
    dst = jnp.full(3 * 2048, -1, jnp.int32)
    return ms.merge_points(st, src, dst, src >= 0)
chain_state("merge_points (empty)", p_merge_only)


def p_dup_only(st):
    B = 3 * 2048
    return ms.add_observations_rows_dup(
        st, jnp.full(B, -1, jnp.int32), jnp.full(B, -1, jnp.int32),
        jnp.full(B, 0, jnp.int32), jnp.zeros(B, bool))
chain_state("add_obs_rows_dup (empty)", p_dup_only)
