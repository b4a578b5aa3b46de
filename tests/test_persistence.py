"""Tests for map persistence: SoA checkpoint + boost-parity converter +
vocabulary formats."""

import jax.numpy as jnp
import numpy as np

from orbslam_mapsave_tpu.io import boost_parity, mapio
from orbslam_mapsave_tpu.slammap import mapstate as ms
from orbslam_mapsave_tpu.vocab import vocabulary

N_FEAT = 64


def build_small_map(rng):
    st = ms.empty_map(8, 128, N_FEAT)
    for k in range(3):
        st, kf = ms.add_keyframe(
            st, jnp.eye(4), float(k), k,
            kp_xy=jnp.asarray(rng.uniform(0, 640, (N_FEAT, 2)), jnp.float32),
            kp_ur=jnp.full((N_FEAT,), -1.0, jnp.float32),
            kp_depth=jnp.asarray(rng.uniform(0.5, 3, (N_FEAT,)), jnp.float32),
            kp_octave=jnp.asarray(rng.integers(0, 4, (N_FEAT,)), jnp.int32),
            kp_angle=jnp.asarray(rng.uniform(0, 360, (N_FEAT,)), jnp.float32),
            kp_valid=jnp.ones((N_FEAT,), bool),
            desc=jnp.asarray(rng.integers(0, 256, (N_FEAT, 32)), jnp.uint8),
        )
    pos = jnp.asarray(rng.normal(size=(20, 3)), jnp.float32)
    desc = jnp.asarray(rng.integers(0, 256, (20, 32)), jnp.uint8)
    st, slots = ms.add_points(st, pos, desc, 0, 0, jnp.ones(20, bool))
    feat = jnp.arange(20, dtype=jnp.int32)
    st = ms.add_observations(st, 0, slots, feat, jnp.ones(20, bool))
    st = ms.add_observations(st, 1, slots, feat + 20, jnp.ones(20, bool))
    st = ms.update_connections(st, 1)
    return st


def test_npz_roundtrip(rng, tmp_path):
    st = build_small_map(rng)
    p = tmp_path / "m.map"
    mapio.save_map(p, st)
    st2 = mapio.load_map(p)
    for name in ms.MapState._fields:
        np.testing.assert_array_equal(
            np.asarray(getattr(st, name)), np.asarray(getattr(st2, name)),
            err_msg=name,
        )


def test_boost_parity_roundtrip(rng, tmp_path):
    st = build_small_map(rng)
    p = tmp_path / "Slam_latest_Map.bin"
    cam = dict(fx=520.0, fy=520.0, cx=320.0, cy=240.0, bf=40.0,
               width=640, height=480)
    boost_parity.save_boost_map(p, st, cam)
    st2 = boost_parity.load_boost_map(p, max_keyframes=8, max_points=128,
                                      n_features=N_FEAT)
    assert int(jnp.sum(st2.kf_valid)) == 3
    assert int(jnp.sum(st2.pt_valid)) == 20
    np.testing.assert_allclose(
        np.asarray(st2.pt_pos[:20]), np.asarray(st.pt_pos[:20]), atol=1e-6
    )
    np.testing.assert_array_equal(
        np.asarray(st2.pt_desc[:20]), np.asarray(st.pt_desc[:20])
    )
    # observations survive
    np.testing.assert_array_equal(
        np.asarray(st2.pt_obs_kf[:20]), np.asarray(st.pt_obs_kf[:20])
    )
    # covisibility weights survive
    assert int(st2.covis[1, 0]) == int(st.covis[1, 0])
    # keypoint double-response quirk: file must parse with response written
    # twice (checked implicitly by the roundtrip) and the dead tail must be
    # present: file is ~2x the single-block point size
    assert p.stat().st_size > 0


def test_boost_sentinel_check(rng, tmp_path):
    st = build_small_map(rng)
    p = tmp_path / "m.bin"
    boost_parity.save_boost_map(p, st, {})
    data = bytearray(p.read_bytes())
    # corrupt the sentinel: find it and flip a byte
    idx = bytes(data).find((0xDEADBEEF).to_bytes(4, "little"))
    assert idx > 0
    data[idx] ^= 0xFF
    p2 = tmp_path / "bad.bin"
    p2.write_bytes(bytes(data))
    try:
        boost_parity.load_boost_map(p2, 8, 128, N_FEAT)
        assert False, "should have raised"
    except ValueError:
        pass


def test_vocabulary_binary_roundtrip(rng, tmp_path):
    desc = rng.integers(0, 256, (400, 32), dtype=np.uint8)
    voc = vocabulary.train(desc, k=4, L=2, seed=1)
    assert voc.n_words > 4
    p = tmp_path / "voc.bin"
    vocabulary.save_binary(p, voc)
    voc2 = vocabulary.load_binary(p)
    assert voc2.k == voc.k and voc2.L == voc.L
    assert voc2.n_words == voc.n_words
    np.testing.assert_array_equal(voc2.desc, voc.desc)
    np.testing.assert_array_equal(voc2.parent, voc.parent)
    np.testing.assert_allclose(voc2.weight, voc.weight, rtol=1e-6)
    # binary header layout parity: {u32 nb_nodes, u32 size_node=41, ...}
    import struct

    raw = p.read_bytes()
    nb_nodes, size_node, k, L, scoring, weighting = struct.unpack_from(
        "<IIiiii", raw, 0
    )
    assert size_node == 41
    assert (k, L) == (voc.k, voc.L)


def test_vocabulary_text_roundtrip(rng, tmp_path):
    desc = rng.integers(0, 256, (200, 32), dtype=np.uint8)
    voc = vocabulary.train(desc, k=3, L=2, seed=2)
    p = tmp_path / "voc.txt"
    vocabulary.save_text(p, voc)
    voc2 = vocabulary.load_text(p)
    assert voc2.n_words == voc.n_words
    np.testing.assert_array_equal(voc2.desc, voc.desc)


def test_vocabulary_transform_and_score(rng):
    desc = rng.integers(0, 256, (300, 32), dtype=np.uint8)
    voc = vocabulary.train(desc, k=5, L=2, seed=3)
    tf = vocabulary.make_transform(voc)
    from orbslam_mapsave_tpu.ops import hamming

    d1 = jnp.asarray(desc[:50])
    out = tf(hamming.unpack_bits(d1), jnp.ones(50, bool))
    words = np.asarray(out["word"])
    assert (words >= 0).all() and (words < voc.n_words).all()
    v1 = vocabulary.bow_vector(out["word"], out["weight"], voc.n_words)
    # same descriptors -> score 1; disjoint random -> lower
    s_self = float(vocabulary.score_l1(v1, v1))
    assert abs(s_self - 1.0) < 1e-6
    d2 = jnp.asarray(rng.integers(0, 256, (50, 32), dtype=np.uint8))
    out2 = tf(hamming.unpack_bits(d2), jnp.ones(50, bool))
    v2 = vocabulary.bow_vector(out2["word"], out2["weight"], voc.n_words)
    assert float(vocabulary.score_l1(v1, v2)) < s_self
