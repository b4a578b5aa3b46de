"""Per-program DEVICE time via blocked single-call latency minus the
measured empty-program round trip (median of R). Distinguishes real device
cost from the ~2.5 ms dispatch floor that pollutes REP-pipelined timings."""
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
from orbslam_mapsave_tpu.pipeline.loop_closing import _detect_device
from orbslam_mapsave_tpu.optim import local_ba
from orbslam_mapsave_tpu.slammap import mapstate as ms

R = 15


def lat(name, fn, base=0.0):
    fn()  # warm
    jax.block_until_ready(fn())
    ts = []
    for _ in range(R):
        t0 = time.perf_counter()
        jax.block_until_ready(fn())
        ts.append(time.perf_counter() - t0)
    med = float(np.median(ts)) * 1e3
    print(f"{name:28s} {med:8.2f} ms   (-rtt: {med - base:6.2f})", flush=True)
    return med


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
base = lat("empty rtt", lambda: trivial(jnp.float32(1.0)))

recent = jnp.asarray(0, jnp.int32)
lat("map_step", lambda: mapper._map_step(state, kfj, recent,
                                         jnp.asarray(False)), base)
win = jax.jit(lambda s: lmod.build_ba_window(s, kfj))
lat("build_ba_window", lambda: win(state), base)
f_ba = jax.jit(lambda s: lmod.build_local_ba_problem(
    s, kfj, slam.cam, mapper.inv_level_sigma2))
prob, cam_slots, lidx = f_ba(state)
jax.block_until_ready(prob)
lat("build_ba_problem", lambda: f_ba(state), base)
f_solve = jax.jit(lambda p: local_ba.local_bundle_adjustment(
    slam.cam, p, abort=jnp.asarray(False)))
lat("BA solve (early-exit)", lambda: f_solve(prob), base)
lat("_ba (window+count+solve)", lambda: mapper._ba(
    state, kfj, jnp.asarray(False)), base)

tri = mapper.triangulate_pair
neigh = ms.covisible_keyframes(state, kf, mapper.n_tri_neighbors)
f_tri = jax.jit(tri.batched)
lat("triangulation", lambda: f_tri(state, kfj, neigh), base)
lat("keyframe_culling", lambda: lmod.keyframe_culling(state, kfj), base)
cull = jax.jit(lambda s: lmod.recent_point_culling(
    s, jnp.ones(s.pt_capacity, bool) & s.pt_valid, kfj, False))
lat("recent_point_culling", lambda: cull(state), base)

bounds = slam.builder.bounds
sf = slam.builder.scale_factors
cand = jnp.arange(4096, dtype=jnp.int32)
f_fuse = jax.jit(lambda s: lmod.fuse_into_keyframe(
    s, kfj, cand, slam.cam, bounds, sf, mapper.inv_level_sigma2, 4, 1.5))
lat("fwd fuse pass", lambda: f_fuse(state), base)

lc._ensure_store(state)
if lc._bow_add_one is None:
    lc._bow_add_one = lc._build_bow_add_one(lc.bow_store.word.shape[1])
lat("bow_add_one", lambda: lc._bow_add_one(
    lc.transform.tables, lc.bow_store, state, kfj), base)
bow = lc.compute_bow(state, kf)
jax.block_until_ready(bow)
lat("detect_device", lambda: _detect_device(lc.bow_store, state, bow[0],
                                            bow[1], kfj), base)

# composed per-frame program
g, d = frames_dev[0]
lat("composed frame step", lambda: slam.tracker.step(
    slam.tracker.map, slam.tracker.ctrl, slam.tracker.builder.build(
        g, 1000.0, d)), base)
