"""Device THROUGHPUT of the per-frame programs (REP-pipelined, amortized
round trip) vs single-shot latency — distinguishes device time from
dispatch/tunnel latency."""
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


def t(name, fn, rep=50):
    jax.block_until_ready(fn())
    t0 = time.perf_counter()
    out = None
    for _ in range(rep):
        out = fn()
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / rep * 1e3
    # single-shot latency
    t0 = time.perf_counter()
    jax.block_until_ready(fn())
    lat = (time.perf_counter() - t0) * 1e3
    print(f"{name:34s} thr={dt:8.3f} ms   lat1={lat:7.1f} ms", flush=True)


def main():
    data = bench_mod.get_sequence()
    voc = bench_mod.get_vocabulary(data, config_mod, system_mod)
    slam = bench_mod.make_system(voc, config_mod, system_mod)
    frames_dev = [(jnp.asarray(g, jnp.float32), jnp.asarray(d, jnp.float32))
                  for g, d in data["frames"][:210]]
    jax.block_until_ready(frames_dev)
    t0 = time.perf_counter()
    for i in range(205):
        g, d = frames_dev[i]
        slam.track_rgbd(g, d, 1000.0 + i / 30.0)
    slam.tracker.flush()
    print(f"drive 205: {time.perf_counter()-t0:.1f}s "
          f"kfs={slam.n_keyframes} pts={slam.n_points}", flush=True)

    trk = slam.tracker
    state, ctrl = trk.map, trk.ctrl
    g, d = frames_dev[205]
    t("frame build", lambda: trk.builder.build(g, 1006.8, d))
    t("composed build+step", lambda: trk._composed_rgbd(
        trk.map, trk.ctrl, g, 1006.8, d)[2].pose)
    fr = trk.builder.build(g, 1006.8, d)
    jax.block_until_ready(fr)
    t("fused step (non-KF frame)", lambda: trk.step(state, ctrl, fr)[2].pose)
    # force the KF branch: a ctrl whose timing triggers c1a
    from orbslam_mapsave_tpu.pipeline import fused_step as fs
    ctrl_kf = ctrl._replace(
        last_kf_frame_id=ctrl.frame_id - jnp.asarray(60, jnp.int32))
    t("fused step (KF-forced frame)",
      lambda: trk.step(state, ctrl_kf, fr)[2].pose, rep=20)
    mapper = slam.mapper
    kf = jnp.asarray(int(np.nonzero(np.asarray(state.kf_valid))[0][-1]))
    t("map step alone", lambda: mapper._map_step(
        state, kf, jnp.asarray(0, jnp.int32), jnp.asarray(False)), rep=20)
    k = trk.k
    pose_pred = ctrl.velocity @ ctrl.pose
    m, pw, have, nm = k["track_motion"](
        state, fr, pose_pred, ctrl.last_matched, ctrl.last_frame,
        jnp.asarray(15.0, jnp.float32), ctrl.pose, jnp.asarray(False))
    t("  track_motion", lambda: k["track_motion"](
        state, fr, pose_pred, ctrl.last_matched, ctrl.last_frame,
        jnp.asarray(15.0, jnp.float32), ctrl.pose, jnp.asarray(False)))
    t("  optimize_pose_xyz", lambda: k["optimize_pose_xyz"](
        state, fr, pose_pred, pw, have, m))
    pose, mm, ninl, _ = k["optimize_pose_xyz"](state, fr, pose_pred, pw,
                                               have, m)
    t("  gather_local_map", lambda: k["gather_local_map"](state, mm, pose))
    local_idx, ref2 = k["gather_local_map"](state, mm, pose)
    t("  track_local_map", lambda: k["track_local_map"](
        state, fr, pose, mm, local_idx, jnp.asarray(3.0, jnp.float32)))
    lc = slam.loop_closer
    t("  compute_bow (per KF)", lambda: lc.compute_bow(state, 10))


if __name__ == "__main__":
    main()
