"""ORBvoc-scale vocabulary tests (VERDICT r2 missing #3): the real
vocabulary is k=10, L=6, ~1.1M nodes (`TemplatedVocabulary.h:1471-1476`);
nothing larger than 10k words had ever been loaded before round 3."""

import time

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from orbslam_mapsave_tpu.vocab import database, vocabulary


def test_children_table_vectorized_matches_loop():
    rng = np.random.default_rng(0)
    Nn, k = 500, 4
    parent = np.full(Nn, -1, np.int32)
    parent[1:] = rng.integers(0, np.maximum(np.arange(1, Nn) // 2, 1))
    got = vocabulary._children_table(parent, k)
    # reference loop
    ref = np.full((Nn, k), -1, np.int32)
    counts = np.zeros(Nn, np.int32)
    for nid in range(1, Nn):
        p = parent[nid]
        if 0 <= p < Nn and counts[p] < k:
            ref[p, counts[p]] = nid
            counts[p] += 1
    np.testing.assert_array_equal(got, ref)


@pytest.mark.slow
def test_orbvoc_scale_roundtrip_and_transform(tmp_path):
    t0 = time.perf_counter()
    voc = vocabulary.synthetic_full(k=10, L=6, seed=1)
    t_build = time.perf_counter() - t0
    assert voc.n_nodes == 1111111
    assert voc.n_words == 10**6

    # binary roundtrip at full scale (the fork's ORBvoc.bin layout)
    f = tmp_path / "orbvoc_synth.bin"
    t0 = time.perf_counter()
    vocabulary.save_binary(f, voc)
    t_save = time.perf_counter() - t0
    t0 = time.perf_counter()
    voc2 = vocabulary.load_binary(f)
    t_load = time.perf_counter() - t0
    assert voc2.n_nodes == voc.n_nodes
    assert voc2.n_words == voc.n_words
    np.testing.assert_array_equal(voc2.parent, voc.parent)
    np.testing.assert_array_equal(voc2.desc, voc.desc)
    np.testing.assert_array_equal(voc2.children, voc.children)

    # packed transform of a full 2048-feature frame through the 1M tree
    transform = vocabulary.make_transform_packed(voc2)
    rng = np.random.default_rng(2)
    desc = jnp.asarray(rng.integers(0, 256, (2048, 32), dtype=np.uint8))
    valid = jnp.ones(2048, bool)
    out = transform(desc, valid)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    out = transform(desc, valid)
    jax.block_until_ready(out)
    t_tf = time.perf_counter() - t0
    w = np.asarray(out["word"])
    assert (w >= 0).all() and (w < voc.n_words).all()
    # descent correctness spot check vs a host walk for 4 descriptors
    d_np = np.asarray(desc)
    for i in range(4):
        cur = 0
        bits = np.unpackbits(d_np[i])
        for _ in range(voc.L + 1):
            ch = voc.children[cur]
            ch = ch[ch >= 0]
            if len(ch) == 0:
                break
            dd = [np.unpackbits(voc.desc[c] ^ d_np[i]).sum() for c in ch]
            cur = int(ch[int(np.argmin(dd))])
        assert int(voc.word_id[cur]) == int(w[i])
    # sparse row build + store insert at 1M-word ids
    words, weights = vocabulary.sparse_bow(out["word"], out["weight"], 2048)
    store = database.empty_sparse_store(8, 2048)
    store = database.add_keyframe_bow_sparse(store, 0, words, weights)
    common, scores = database._sparse_common_and_scores(
        store, words, weights)
    assert float(scores[0]) == pytest.approx(1.0, abs=1e-4)
    print(f"[voc-scale] build={t_build:.1f}s save={t_save:.1f}s "
          f"load={t_load:.1f}s transform(2048)={t_tf*1e3:.0f}ms")
