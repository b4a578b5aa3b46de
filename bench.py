"""Headline benchmark: tracked frames/s per chip on a mapping-heavy
synthetic RGB-D loop at the reference's operating point (640x480, 2000 ORB
features, 4 pyramid levels — `Examples/ORB_RGBD640x480.yaml:58-64`).

Workload (VERDICT r1 item 5): a full circle revolution that produces a
keyframe every ~6-8 frames (mapping + local BA run constantly inside the
fused per-frame program), with LOOP CLOSING ENABLED on a vocabulary trained
from the sequence itself — the timed region includes the loop event's
Sim3 + fusion + essential graph + global BA.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
`vs_baseline` is vs the reference's real-time design target of 30 fps on a
desktop CPU (README.md:31, `Camera.fps`, BASELINE.md — the repo publishes no
measured numbers; 30 fps input rate is its design envelope).
"""

import json
import os
import sys
import time
from pathlib import Path

# The axon sitecustomize imports jax at interpreter startup, so env-var
# mutation here is a NO-OP — the persistent compile cache must be enabled
# through jax.config.update after import (verified: with only the env vars,
# jax.config.jax_compilation_cache_dir stays None and nothing is cached).
import jax  # noqa: E402

jax.config.update("jax_compilation_cache_dir",
                  os.environ.get("JAX_COMPILATION_CACHE_DIR",
                                 "/root/.cache/jax_tpu"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

import numpy as np  # noqa: E402

REFERENCE_FPS = 30.0
N_FRAMES = 240
N_WARMUP = 10
W, H = 640, 480
CACHE = Path(__file__).parent / ".bench_cache"


def get_sequence():
    """Render (and cache) the benchmark loop sequence."""
    import pickle

    CACHE.mkdir(exist_ok=True)
    f = CACHE / f"loop_{W}x{H}_{N_FRAMES}_v4.pkl"
    if f.exists():
        with open(f, "rb") as fh:
            return pickle.load(fh)
    from orbslam_mapsave_tpu.io import synthetic

    K = np.array([[520.0, 0, W / 2], [0, 520.0, H / 2], [0, 0, 1.0]])
    poses = synthetic.circle_trajectory(N_FRAMES, radius=0.55, revs=1.30)
    room = synthetic.BoxRoom(half_size=2.0, seed=11)
    frames = []
    for i in range(N_FRAMES):
        gray, depth = room.render(K, poses[i], W, H)
        # storage dtypes = what a sensor delivers (u8 image, f16 depth);
        # the frame builder converts on device — 4x less host->device
        # transfer on the tunnel-attached chip
        frames.append((np.clip(gray, 0, 255).astype(np.uint8),
                       depth.astype(np.float16)))
    data = {"K": K, "poses": poses, "frames": frames}
    with open(f, "wb") as fh:
        pickle.dump(data, fh)
    return data


def make_system(voc, cfg_mod, system_mod):
    cfg = cfg_mod.SystemConfig()
    cfg.camera = cfg_mod.CameraConfig(
        fx=520.0, fy=520.0, cx=W / 2, cy=H / 2, width=W, height=H,
        bf=520.0 * 0.08, th_depth=50.0, fps=30,
    )
    cfg.orb = cfg_mod.ORBConfig(n_features=2000, n_levels=4,
                                scale_factor=1.5)
    cfg.max_keypoints = 2048
    cfg.max_keyframes = 64
    cfg.max_points = 32768
    return system_mod.SLAMSystem(
        cfg, system_mod.Sensor.RGBD, vocabulary=voc,
        enable_loop_closing=voc is not None,
    )


def get_vocabulary(data, cfg_mod, system_mod):
    """Train (and cache) a vocabulary from the sequence's own frames."""
    from orbslam_mapsave_tpu.vocab import vocabulary

    f = CACHE / f"voc_{W}x{H}_{N_FRAMES}_v4.bin"
    if f.exists():
        return vocabulary.load_binary(f)
    sys_ = make_system(None, cfg_mod, system_mod)
    import jax.numpy as jnp

    descs = []
    for i in range(0, N_FRAMES, 12):
        g, d = data["frames"][i]
        fr = sys_.builder.build(jnp.asarray(g, jnp.float32),
                                1000.0 + i / 30.0,
                                jnp.asarray(d, jnp.float32))
        descs.append(np.asarray(fr.desc)[np.asarray(fr.valid)])
    voc = vocabulary.train(np.concatenate(descs), k=10, L=4, seed=1)
    vocabulary.save_binary(f, voc)
    return voc


def main():
    data = get_sequence()
    import jax
    import jax.numpy as jnp

    from orbslam_mapsave_tpu import config as config_mod
    from orbslam_mapsave_tpu.pipeline import system as system_mod

    voc = None if os.environ.get("BENCH_NO_LOOP") else get_vocabulary(
        data, config_mod, system_mod)
    slam = make_system(voc, config_mod, system_mod)

    # Pre-stage the dataset on device (the dataset-benchmark operating mode:
    # decode/transfer off the timed path, exactly like the reference's
    # LoadImages examples which pre-read the whole sequence from disk).
    frames_dev = [
        (jnp.asarray(g, jnp.float32), jnp.asarray(d, jnp.float32))
        for g, d in data["frames"]
    ]
    jax.block_until_ready(frames_dev)

    # warmup: one FULL untimed pass over the workload on the SAME system,
    # then reset() (which keeps the jitted programs and only clears state)
    # — compiles every program the timed run will touch (tracking, mapping
    # keyframe steps, loop detection, Sim3, correction, pose graph, GBA).
    # A throwaway warm system is NOT equivalent: the jitted step closures
    # are per-instance, so a fresh timed system would re-trace and, on an
    # in-process cache miss, re-COMPILE inside the timed region. The
    # reference pays its startup (vocabulary load, lazy allocation)
    # outside its per-frame timings; XLA compilation is this framework's
    # startup cost and the persistent cache amortizes it across processes.
    for i in range(N_FRAMES):
        g, d = frames_dev[i]
        slam.track_rgbd(g, d, 1000.0 + i / 30.0)
    slam.tracker.flush()
    slam.flush_gba()
    slam.reset()

    # R timed passes, MEDIAN is the headline (r4 postmortem: single-pass
    # numbers on the tunnel-attached chip spanned 3.4-60 fps across reruns
    # of identical code — one network stall landed straight in BENCH_rN).
    # Per-pass frame stats make a stall visible and attributable: a tunnel
    # hiccup shows up as a huge max-frame ms in exactly one pass while the
    # other passes (and the median) stay representative of compute.
    n_reps = int(os.environ.get("BENCH_REPS", "5"))
    pass_stats = []
    for rep in range(n_reps):
        if rep:
            slam.reset()
            if os.environ.get("BENCH_SLEEP"):
                time.sleep(float(os.environ["BENCH_SLEEP"]))
        frame_ms = np.empty(N_FRAMES)
        t0 = time.perf_counter()
        tprev = t0
        for i in range(N_FRAMES):
            g, d = frames_dev[i]
            slam.track_rgbd(g, d, 1000.0 + i / 30.0)
            tnow = time.perf_counter()
            frame_ms[i] = 1e3 * (tnow - tprev)
            tprev = tnow
        slam.tracker.flush()
        slam.flush_gba()
        elapsed = time.perf_counter() - t0
        pass_stats.append({
            "fps": N_FRAMES / elapsed,
            "wall_s": elapsed,
            "p50_ms": float(np.percentile(frame_ms, 50)),
            "p99_ms": float(np.percentile(frame_ms, 99)),
            "max_ms": float(frame_ms.max()),
            "stalls": int((frame_ms > 500.0).sum()),
        })
        print(
            f"[bench] pass {rep + 1}/{n_reps}: {pass_stats[-1]['fps']:.1f} "
            f"fps wall={elapsed:.2f}s p50={pass_stats[-1]['p50_ms']:.2f} "
            f"p99={pass_stats[-1]['p99_ms']:.1f} "
            f"max={pass_stats[-1]['max_ms']:.0f}ms "
            f"stalls>500ms={pass_stats[-1]['stalls']}",
            file=sys.stderr,
        )
    all_fps = sorted(s["fps"] for s in pass_stats)
    fps = float(np.median(all_fps))
    elapsed = N_FRAMES / fps

    traj = slam.tracker.trajectory
    n_lost = sum(1 for (_, _, lost) in traj if lost)
    n_loops = len(slam.loop_closer.events) if slam.loop_closer else 0
    # trajectory quality on the timed run (exact ground truth available)
    from orbslam_mapsave_tpu.io import trajectory as traj_io

    valid = np.asarray(slam.map.kf_valid)
    kf_ate = float("nan")
    if valid.any():
        ts = np.asarray(slam.map.kf_timestamp, np.float64)[valid] + (
            slam.tracker.ts_epoch or 0.0)
        est = np.linalg.inv(np.asarray(slam.map.kf_pose)[valid])
        gt_ts = 1000.0 + np.arange(N_FRAMES) / 30.0
        kf_ate = traj_io.ate_rmse(gt_ts, data["poses"], ts, est)
    print(
        f"[bench] frames={N_FRAMES} reps={n_reps} "
        f"median={fps:.1f} min={all_fps[0]:.1f} max={all_fps[-1]:.1f} fps "
        f"avg_ms={1e3 * elapsed / N_FRAMES:.1f} "
        f"lost={n_lost} kfs={slam.n_keyframes} pts={slam.n_points} "
        f"loops={n_loops} kf_ate={kf_ate:.4f}m",
        file=sys.stderr,
    )
    print(json.dumps({
        "metric": "rgbd_slam_fps_per_chip_loopclosing",
        "value": round(fps, 2),
        "unit": "frames/s",
        "vs_baseline": round(fps / REFERENCE_FPS, 3),
        "fps_min": round(all_fps[0], 2),
        "fps_max": round(all_fps[-1], 2),
        "reps": n_reps,
    }))


if __name__ == "__main__":
    main()
