"""TRUE device time per mapping-step piece: 20 dependent repetitions in one
jitted scan, one block — (wall - rtt)/20 removes the ~44 ms tunnel RTT."""
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
from orbslam_mapsave_tpu.optim import local_ba
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
lc = slam.loop_closer
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


def chain(label, piece):
    """piece(state) -> scalar device value; fed back through a real (but
    numerically negligible) state perturbation so XLA cannot DCE it."""
    @jax.jit
    def run(st):
        def body(st, _):
            out = piece(st)
            st = st._replace(pt_pos=st.pt_pos.at[0, 0].add(
                out.astype(jnp.float32) * 1e-30))
            return st, None
        st, _ = jax.lax.scan(body, st, None, length=CH)
        return st.pt_pos[0, 0]
    jax.block_until_ready(run(state))
    best = 1e9
    for _ in range(3):
        t0 = time.perf_counter()
        jax.block_until_ready(run(state))
        best = min(best, time.perf_counter() - t0)
    print(f"{label:30s} {1e3*(best-RTT)/CH:7.2f} ms", flush=True)


inv2 = mapper.inv_level_sigma2
cam = slam.cam

chain("build_ba_window", lambda st: lmod.build_ba_window(st, kfj)["slot2cam"][0])

def p_assemble(st):
    win = lmod.build_ba_window(st, kfj)
    prob = lmod.assemble_ba_obs(st, win, inv2, lmod.O_BA)
    return prob.obs_cam[0, 0]
chain("window+assemble", p_assemble)

def p_counts(st):
    win = lmod.build_ba_window(st, kfj)
    return (lmod.count_truncated_ba_lanes(st, win, lmod.O_BA)
            + lmod.count_truncated_ba_lanes(st, win, lmod.O_BA_ESC))
chain("window+2 lane counts", p_counts)

def p_solve(st):
    win = lmod.build_ba_window(st, kfj)
    prob = lmod.assemble_ba_obs(st, win, inv2, lmod.O_BA)
    res = local_ba.local_bundle_adjustment(cam, prob, abort=jnp.asarray(False))
    return res.chi2
chain("window+assemble+solve", p_solve)

def p_ba_full(st):
    st2, dropped, esc = mapper._ba._fun(st, kfj, jnp.asarray(False)) if hasattr(mapper._ba, "_fun") else mapper._ba(st, kfj, jnp.asarray(False))
    return jnp.sum(st2.pt_pos[:4]) + dropped
chain("_ba total", p_ba_full)

tri = mapper.triangulate_pair
def p_tri(st):
    neigh = ms.covisible_keyframes(st, kfj, mapper.n_tri_neighbors)
    st2, slots = tri.batched(st, kfj, neigh)
    return slots[0]
chain("triangulation (batched)", p_tri)

bounds = slam.builder.bounds
sf = slam.builder.scale_factors
cand = jnp.arange(4096, dtype=jnp.int32)
def p_fuse(st):
    st2 = lmod.fuse_into_keyframe(st, kfj, cand, cam, bounds, sf, inv2, 4, 1.5)
    return jnp.sum(st2.pt_pos[:4])
chain("fwd fuse (match+apply)", p_fuse)

def p_fusematch(st):
    own = st.kf_kp_point[kfj]
    w = lmod.fuse_match(st, kfj, own, cam, bounds, sf, inv2, 4, 1.5)
    return w[0]
chain("one rev fuse_match", p_fusematch)

def p_cull(st):
    st2 = lmod.keyframe_culling(st, kfj)
    return jnp.sum(st2.pt_pos[:4])
chain("keyframe_culling", p_cull)

def p_rcull(st):
    st2 = lmod.recent_point_culling(st, jnp.ones(st.pt_capacity, bool) & st.pt_valid, kfj, False)
    return jnp.sum(st2.pt_pos[:4])
chain("recent_point_culling", p_rcull)

def p_conn(st):
    st2 = ms.update_connections(st, kfj)
    return jnp.sum(st2.pt_pos[:4])
chain("update_connections", p_conn)

def p_desc(st):
    own = st.kf_kp_point[kfj]
    st2 = ms.compute_distinctive_descriptors_idx(st, jnp.clip(own, 0), own >= 0)
    return jnp.sum(st2.pt_pos[:4])
chain("distinctive_desc (own pts)", p_desc)

def p_nrm(st):
    own = st.kf_kp_point[kfj]
    st2 = ms.update_normal_and_depth_idx(st, jnp.clip(own, 0), own >= 0, jnp.asarray(sf), 4)
    return jnp.sum(st2.pt_pos[:4])
chain("normal_and_depth (own pts)", p_nrm)

# whole map step for reference
def p_map(st):
    st2, d, e = mapper._map_step(st, kfj, jnp.asarray(0, jnp.int32), jnp.asarray(False))
    return jnp.sum(st2.pt_pos[:4])
chain("FULL map_step", p_map)
