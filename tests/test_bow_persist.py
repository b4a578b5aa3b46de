"""Persisted BoW store round-trip (VERDICT r3 item 9): the sparse per-KF
BoW rows ride inside the map checkpoint so reuse-mode startup skips the
rebuild-on-load transform the reference always pays (`src/System.cc:
162-163`); a vocabulary mismatch falls back to rebuild."""

import jax.numpy as jnp
import numpy as np

from orbslam_mapsave_tpu.io import mapio
from orbslam_mapsave_tpu.slammap import mapstate as ms
from orbslam_mapsave_tpu.vocab import database


def test_bow_store_roundtrip(tmp_path):
    state = ms.empty_map(8, 64, 32)
    store = database.empty_sparse_store(8, 16)
    store = database.add_keyframe_bow_sparse(
        store, 2,
        jnp.asarray(np.sort(np.array([3, 7, 100] + [2**31 - 1] * 13)),
                    jnp.int32),
        jnp.asarray([0.5, 0.25, 0.25] + [0.0] * 13, jnp.float32),
    )
    p = tmp_path / "m.npz"
    mapio.save_map(p, state, ts_epoch=1.5, bow_store=store, voc_n_words=1000)

    out = mapio.load_bow_store(p, 1000)
    assert out is not None
    np.testing.assert_array_equal(np.asarray(out.word),
                                  np.asarray(store.word))
    np.testing.assert_allclose(np.asarray(out.weight),
                               np.asarray(store.weight))

    # different vocabulary -> must force a rebuild
    assert mapio.load_bow_store(p, 999) is None

    # checkpoints without a store -> None
    p2 = tmp_path / "m2.npz"
    mapio.save_map(p2, state, ts_epoch=0.0)
    assert mapio.load_bow_store(p2, 1000) is None

    # the map itself still loads (bow arrays must not leak into MapState)
    st2 = mapio.load_map(p)
    assert int(st2.kf_capacity) == 8
