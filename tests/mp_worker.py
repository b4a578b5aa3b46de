"""Worker for the 2-process `jax.distributed` test (run by
`test_distributed.py::test_two_process_distributed_gba`).

Each process owns 2 virtual CPU devices; the global mesh spans 4 devices
across the 2 processes. Builds the same deterministic BA problem, runs
`distributed_full_ba` over the global mesh, and process 0 writes the result
for the parent test to compare against single-process."""

import os
import sys

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "")
    + " --xla_force_host_platform_device_count=2"
).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import jax.numpy as jnp  # noqa: E402

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def build_problem():
    """Deterministic synthetic map (same in every process AND in the
    single-process reference)."""
    from orbslam_mapsave_tpu.slammap import mapstate as ms

    rng = np.random.default_rng(7)
    K, Pcap, Nf = 8, 64, 24
    st = ms.empty_map(K, Pcap, Nf)
    h = {f: np.asarray(getattr(st, f)).copy() for f in st._fields
         if f not in ("n_kf", "n_pt")}
    n_pt = 48
    pts3 = np.stack([rng.uniform(-2, 2, n_pt), rng.uniform(-1, 1, n_pt),
                     rng.uniform(3, 8, n_pt)], -1).astype(np.float32)
    kf_poses = np.tile(np.eye(4, dtype=np.float32), (K, 1, 1))
    kf_poses[:, 0, 3] = np.linspace(0, 1, K)
    feat_count = np.zeros(K, np.int64)
    for p in range(n_pt):
        for lane, c in enumerate(rng.choice(K, 4, replace=False)):
            pc = kf_poses[c, :3, :3] @ pts3[p] + kf_poses[c, :3, 3]
            u = 200.0 * pc[0] / pc[2] + 160.0
            v = 200.0 * pc[1] / pc[2] + 120.0
            nfi = feat_count[c]
            if nfi >= Nf:
                continue
            feat_count[c] += 1
            h["kf_kp_xy"][c, nfi] = (u, v)
            h["kf_kp_valid"][c, nfi] = True
            h["kf_kp_point"][c, nfi] = p
            h["pt_obs_kf"][p, lane] = c
            h["pt_obs_idx"][p, lane] = nfi
    h["kf_pose"][:K] = kf_poses
    h["kf_valid"][:K] = True
    h["pt_pos"][:n_pt] = pts3 + rng.normal(
        size=pts3.shape).astype(np.float32) * 0.02
    h["pt_valid"][:n_pt] = True
    return st._replace(n_kf=jnp.asarray(K, jnp.int32),
                       n_pt=jnp.asarray(n_pt, jnp.int32),
                       **{k: jnp.asarray(v) for k, v in h.items()})


def main():
    from orbslam_mapsave_tpu.geometry import projection
    from orbslam_mapsave_tpu.parallel import dist_gba

    assert dist_gba.initialize_distributed(), "COORDINATOR_ADDRESS not set"
    n_local = jax.local_device_count()
    n_global = jax.device_count()
    pid = jax.process_index()
    print(f"process {pid}: {n_local} local / {n_global} global devices",
          flush=True)
    assert n_global == 2 * n_local, "expected 2 processes"

    cam = projection.Camera.create(200.0, 200.0, 160.0, 120.0, bf=16.0)
    st = build_problem()
    mesh = dist_gba.make_mesh()  # all global devices
    st = dist_gba.shard_map_state(st, mesh)
    poses, pts, cost = dist_gba.distributed_full_ba(
        cam, st, jnp.ones(4, jnp.float32), mesh, n_iters=3, cg_iters=20)
    poses_h = np.asarray(jax.device_get(poses))
    cost_h = float(cost)
    print(f"process {pid}: cost={cost_h:.6f}", flush=True)
    if pid == 0:
        out = os.environ["MP_OUT"]
        np.savez(out, poses=poses_h, cost=cost_h)
    # all processes must reach shutdown together
    jax.distributed.shutdown()


if __name__ == "__main__":
    main()
