"""Tests for the SoA MapState: allocation, observations, covisibility,
distinctive descriptors, erase/replace lifecycles."""

import jax.numpy as jnp
import numpy as np

from orbslam_mapsave_tpu.slammap import mapstate as ms

N_FEAT = 64


def make_kf_args(rng, n=N_FEAT):
    return dict(
        kp_xy=jnp.asarray(rng.uniform(0, 640, (n, 2)), jnp.float32),
        kp_ur=jnp.full((n,), -1.0, jnp.float32),
        kp_depth=jnp.asarray(rng.uniform(0.5, 3, (n,)), jnp.float32),
        kp_octave=jnp.zeros((n,), jnp.int32),
        kp_angle=jnp.zeros((n,), jnp.float32),
        kp_valid=jnp.ones((n,), bool),
        desc=jnp.asarray(rng.integers(0, 256, (n, 32)), jnp.uint8),
    )


def test_add_keyframe_and_points(rng):
    st = ms.empty_map(8, 256, N_FEAT)
    st, k0 = ms.add_keyframe(st, jnp.eye(4), 0.0, 0, **make_kf_args(rng))
    assert int(st.n_kf) == 1 and bool(st.kf_valid[0])
    pos = jnp.asarray(rng.normal(size=(10, 3)), jnp.float32)
    desc = jnp.asarray(rng.integers(0, 256, (10, 32)), jnp.uint8)
    valid = jnp.asarray([True] * 8 + [False, True])
    st, slots = ms.add_points(st, pos, desc, k0, k0, valid)
    slots = np.asarray(slots)
    assert int(st.n_pt) == 9
    assert slots[8] == -1
    assert (slots[[0, 9]] == [0, 8]).all()
    np.testing.assert_allclose(np.asarray(st.pt_pos[8]), np.asarray(pos[9]))


def test_observations_roundtrip(rng):
    st = ms.empty_map(8, 256, N_FEAT)
    st, k0 = ms.add_keyframe(st, jnp.eye(4), 0.0, 0, **make_kf_args(rng))
    st, k1 = ms.add_keyframe(st, jnp.eye(4), 1.0, 1, **make_kf_args(rng))
    pos = jnp.zeros((5, 3), jnp.float32)
    desc = jnp.zeros((5, 32), jnp.uint8)
    st, slots = ms.add_points(st, pos, desc, k0, k0, jnp.ones(5, bool))
    feat = jnp.arange(5, dtype=jnp.int32)
    st = ms.add_observations(st, k0, slots, feat, jnp.ones(5, bool))
    st = ms.add_observations(st, k1, slots, feat + 10, jnp.ones(5, bool))
    cnt = np.asarray(ms.point_obs_count(st))
    assert (cnt[:5] == 2).all()
    assert (np.asarray(st.kf_kp_point[0, :5]) == np.arange(5)).all()
    assert (np.asarray(st.kf_kp_point[1, 10:15]) == np.arange(5)).all()
    # rebuild from forward map must agree
    st2 = ms.rebuild_observations(st)
    cnt2 = np.asarray(ms.point_obs_count(st2))
    np.testing.assert_array_equal(cnt[: int(st.n_pt)], cnt2[: int(st.n_pt)])
    for p in range(5):
        kfs = set(np.asarray(st2.pt_obs_kf[p])[np.asarray(st2.pt_obs_kf[p]) >= 0])
        assert kfs == {0, 1}


def test_covisibility_and_parent(rng):
    st = ms.empty_map(8, 256, N_FEAT)
    st, k0 = ms.add_keyframe(st, jnp.eye(4), 0.0, 0, **make_kf_args(rng))
    st, k1 = ms.add_keyframe(st, jnp.eye(4), 1.0, 1, **make_kf_args(rng))
    n_shared = 20  # >= threshold 15
    pos = jnp.zeros((n_shared, 3), jnp.float32)
    desc = jnp.zeros((n_shared, 32), jnp.uint8)
    st, slots = ms.add_points(st, pos, desc, k0, k0, jnp.ones(n_shared, bool))
    feat = jnp.arange(n_shared, dtype=jnp.int32)
    st = ms.add_observations(st, k0, slots, feat, jnp.ones(n_shared, bool))
    st = ms.add_observations(st, k1, slots, feat, jnp.ones(n_shared, bool))
    st = ms.update_connections(st, k1)
    assert int(st.covis[1, 0]) == n_shared
    assert int(st.covis[0, 1]) == n_shared
    assert int(st.kf_parent[1]) == 0
    top = np.asarray(ms.covisible_keyframes(st, k1, 3))
    assert top[0] == 0 and (top[1:] == -1).all()


def test_covis_below_threshold_keeps_best(rng):
    st = ms.empty_map(8, 256, N_FEAT)
    st, k0 = ms.add_keyframe(st, jnp.eye(4), 0.0, 0, **make_kf_args(rng))
    st, k1 = ms.add_keyframe(st, jnp.eye(4), 1.0, 1, **make_kf_args(rng))
    pos = jnp.zeros((5, 3), jnp.float32)  # only 5 shared < 15
    desc = jnp.zeros((5, 32), jnp.uint8)
    st, slots = ms.add_points(st, pos, desc, k0, k0, jnp.ones(5, bool))
    feat = jnp.arange(5, dtype=jnp.int32)
    st = ms.add_observations(st, k0, slots, feat, jnp.ones(5, bool))
    st = ms.add_observations(st, k1, slots, feat, jnp.ones(5, bool))
    st = ms.update_connections(st, k1)
    # best edge kept though below threshold (KeyFrame.cc:1051-1060)
    assert int(st.covis[1, 0]) == 5


def test_erase_and_replace(rng):
    st = ms.empty_map(8, 256, N_FEAT)
    st, k0 = ms.add_keyframe(st, jnp.eye(4), 0.0, 0, **make_kf_args(rng))
    pos = jnp.zeros((4, 3), jnp.float32)
    desc = jnp.zeros((4, 32), jnp.uint8)
    st, slots = ms.add_points(st, pos, desc, k0, k0, jnp.ones(4, bool))
    feat = jnp.arange(4, dtype=jnp.int32)
    st = ms.add_observations(st, k0, slots, feat, jnp.ones(4, bool))
    # erase point 1
    mask = np.zeros(256, bool)
    mask[1] = True
    st = ms.erase_points(st, jnp.asarray(mask))
    assert not bool(st.pt_valid[1])
    assert int(st.kf_kp_point[0, 1]) == -1
    # replace point 2 by point 3
    st = ms.replace_points(
        st, jnp.asarray([2], jnp.int32), jnp.asarray([3], jnp.int32),
        jnp.asarray([True]),
    )
    assert not bool(st.pt_valid[2])
    assert int(st.kf_kp_point[0, 2]) == 3


def test_distinctive_descriptor(rng):
    st = ms.empty_map(8, 256, N_FEAT)
    args0, args1, args2 = (make_kf_args(rng) for _ in range(3))
    # plant three descriptors for feature 0: two identical, one far
    d_common = np.asarray(rng.integers(0, 256, (32,)), np.uint8)
    d_far = 255 - d_common
    for args, d in ((args0, d_common), (args1, d_common), (args2, d_far)):
        args["desc"] = args["desc"].at[0].set(jnp.asarray(d))
    st, k0 = ms.add_keyframe(st, jnp.eye(4), 0.0, 0, **args0)
    st, k1 = ms.add_keyframe(st, jnp.eye(4), 1.0, 1, **args1)
    st, k2 = ms.add_keyframe(st, jnp.eye(4), 2.0, 2, **args2)
    st, slots = ms.add_points(
        st, jnp.zeros((1, 3)), jnp.zeros((1, 32), jnp.uint8), k0, k0,
        jnp.ones(1, bool),
    )
    for k in (k0, k1, k2):
        st = ms.add_observations(st, k, slots, jnp.zeros(1, jnp.int32),
                                 jnp.ones(1, bool))
    mask = np.zeros(256, bool)
    mask[0] = True
    st = ms.compute_distinctive_descriptors(st, jnp.asarray(mask))
    # the majority descriptor (d_common) must win
    np.testing.assert_array_equal(np.asarray(st.pt_desc[0]), d_common)


def test_update_normal_and_depth(rng):
    from orbslam_mapsave_tpu.geometry import se3

    st = ms.empty_map(8, 256, N_FEAT)
    # camera at origin looking +z; point at (0,0,2)
    st, k0 = ms.add_keyframe(st, jnp.eye(4), 0.0, 0, **make_kf_args(rng))
    st, slots = ms.add_points(
        st, jnp.asarray([[0.0, 0.0, 2.0]]), jnp.zeros((1, 32), jnp.uint8),
        k0, k0, jnp.ones(1, bool),
    )
    st = ms.add_observations(st, k0, slots, jnp.zeros(1, jnp.int32),
                             jnp.ones(1, bool))
    mask = np.zeros(256, bool)
    mask[0] = True
    sf = jnp.asarray([1.0, 1.5, 2.25, 3.375], jnp.float32)
    st = ms.update_normal_and_depth(st, jnp.asarray(mask), sf, 4)
    np.testing.assert_allclose(np.asarray(st.pt_normal[0]), [0, 0, 1], atol=1e-6)
    assert abs(float(st.pt_max_dist[0]) - 2.0) < 1e-5  # octave 0
    assert abs(float(st.pt_min_dist[0]) - 2.0 / 3.375) < 1e-5


def test_obs_drop_telemetry(rng):
    st = ms.empty_map(4, 64, 8)
    st, kf = ms.add_keyframe(
        st, jnp.eye(4), 0.0, 0,
        kp_xy=jnp.zeros((8, 2)), kp_ur=jnp.full(8, -1.0),
        kp_depth=jnp.ones(8), kp_octave=jnp.zeros(8, jnp.int32),
        kp_angle=jnp.zeros(8), kp_valid=jnp.ones(8, bool),
        desc=jnp.zeros((8, 32), jnp.uint8),
    )
    st, slots = ms.add_points(st, jnp.zeros((1, 3)),
                              jnp.zeros((1, 32), jnp.uint8), 0, 0,
                              jnp.ones(1, bool))
    # saturate the single point's observation lanes
    full = jnp.full((1, ms.MAX_OBS), 0, jnp.int32)
    st = st._replace(pt_obs_kf=st.pt_obs_kf.at[0].set(full[0]),
                     pt_obs_idx=st.pt_obs_idx.at[0].set(full[0]))
    before = int(st.n_obs_dropped)
    st = ms.add_observations(st, 0, slots, jnp.asarray([3], jnp.int32),
                             jnp.ones(1, bool))
    assert int(st.n_obs_dropped) == before + 1


def test_compact_points_and_keyframes(rng):
    st = ms.empty_map(8, 64, 16)
    for k in range(4):
        st, _ = ms.add_keyframe(
            st, jnp.eye(4), float(k), k,
            kp_xy=jnp.asarray(rng.uniform(0, 100, (16, 2)), jnp.float32),
            kp_ur=jnp.full(16, -1.0), kp_depth=jnp.ones(16),
            kp_octave=jnp.zeros(16, jnp.int32), kp_angle=jnp.zeros(16),
            kp_valid=jnp.ones(16, bool),
            desc=jnp.asarray(rng.integers(0, 256, (16, 32)), jnp.uint8),
        )
    pos = jnp.asarray(rng.normal(size=(10, 3)), jnp.float32)
    st, slots = ms.add_points(st, pos, jnp.zeros((10, 32), jnp.uint8), 1, 1,
                              jnp.ones(10, bool))
    st = ms.add_observations(st, 1, slots, jnp.arange(10, dtype=jnp.int32),
                             jnp.ones(10, bool))
    st = ms.add_observations(st, 2, slots, jnp.arange(10, dtype=jnp.int32),
                             jnp.ones(10, bool))
    st = st._replace(kf_parent=st.kf_parent.at[2].set(1).at[3].set(2))
    # kill points 2,5 and keyframe 2
    kill = jnp.zeros(64, bool).at[jnp.asarray([2, 5])].set(True)
    st = ms.erase_points(st, kill)
    kf_valid = st.kf_valid.at[2].set(False)
    st = st._replace(kf_valid=kf_valid,
                     kf_parent=st.kf_parent.at[3].set(1),
                     pt_obs_kf=jnp.where(st.pt_obs_kf == 2, -1, st.pt_obs_kf))
    pos_before = np.asarray(st.pt_pos)[np.asarray(st.pt_valid)]

    st2, new_pt = ms.compact_points(st)
    assert int(st2.n_pt) == 8
    assert bool(st2.pt_valid[:8].all()) and not bool(st2.pt_valid[8:].any())
    np.testing.assert_array_equal(
        np.asarray(st2.pt_pos)[:8], pos_before)
    # forward pointers remapped consistently with reverse rows
    fwd = np.asarray(st2.kf_kp_point)
    okf = np.asarray(st2.pt_obs_kf)
    oix = np.asarray(st2.pt_obs_idx)
    for p in range(8):
        for kf, ix in zip(okf[p], oix[p]):
            if kf >= 0:
                assert fwd[kf, ix] == p

    st3, new_kf = ms.compact_keyframes(st2)
    assert int(st3.n_kf) == 3
    assert bool(st3.kf_valid[:3].all()) and not bool(st3.kf_valid[3:].any())
    # old KF 3 -> new 2, parent old-1 -> new-1
    assert int(new_kf[3]) == 2 and int(new_kf[1]) == 1
    assert int(st3.kf_parent[2]) == 1
    # observations reference remapped KF slots only
    assert np.asarray(st3.pt_obs_kf).max() < 3


def test_add_observations_rows_dup(rng):
    """Duplicate pt_slots in one call land in DISTINCT free lanes — the
    combined reverse-fuse pass adds one point to several neighbours at
    once (reference: Fuse once per neighbour, LocalMapping.cc:505-518)."""
    st = ms.empty_map(8, 256, N_FEAT)
    for i in range(4):
        st, _ = ms.add_keyframe(st, jnp.eye(4), float(i), i,
                                **make_kf_args(rng))
    pos = jnp.zeros((3, 3), jnp.float32)
    desc = jnp.zeros((3, 32), jnp.uint8)
    st, slots = ms.add_points(st, pos, desc, 0, 0, jnp.ones(3, bool))
    # point 0 joins KFs 1,2,3 (features 5,6,7); point 1 joins KF 2 only;
    # one invalid row interleaved
    kf_rows = jnp.asarray([1, 2, -1, 2, 3], jnp.int32)
    pt_rows = jnp.asarray([0, 0, 0, 1, 0], jnp.int32)
    ft_rows = jnp.asarray([5, 6, 9, 11, 7], jnp.int32)
    ok = jnp.asarray([True, True, False, True, True])
    st = ms.add_observations_rows_dup(st, kf_rows, pt_rows, ft_rows, ok)
    cnt = np.asarray(ms.point_obs_count(st))
    assert cnt[0] == 3 and cnt[1] == 1
    obs0 = {(int(k), int(f)) for k, f in
            zip(np.asarray(st.pt_obs_kf[0]), np.asarray(st.pt_obs_idx[0]))
            if k >= 0}
    assert obs0 == {(1, 5), (2, 6), (3, 7)}
    assert int(st.kf_kp_point[2, 11]) == 1
    assert int(st.n_obs_dropped) == 0
