"""Distributed relocalization / place-recognition queries over a sharded
keyframe database.

BASELINE config 5 ("multi-host pod slice ... distributed BA + relocalization
at N>=2 hosts") and SURVEY.md §5.8's DCN story: when the map is sharded by
keyframe block (`dist_gba.shard_map_state`), the sparse BoW store shards the
same way — each host owns the rows of its trajectory block. A lost frame's
query then runs as:

1. the query's sparse BoW row (words, weights) is REPLICATED (broadcast) —
   it is a few KB;
2. every shard scores the query against its LOCAL store rows (the same
   searchsorted intersection as `vocab.database._sparse_common_and_scores`)
   — zero cross-shard traffic;
3. per-shard gates (common-word count, accumulated-group score) reduce with
   `psum`/`pmax` over the mesh axis — scalars;
4. each shard keeps its top-k candidates; one small all-gather returns the
   global candidate set to every host.

The reference has no distributed anything — its `KeyFrameDatabase` is one
inverted index behind a mutex (`src/KeyFrameDatabase.cc:151-272`).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..vocab import database


def shard_store(store: database.SparseBowStore, mesh: Mesh,
                axis: str = "blk") -> database.SparseBowStore:
    """Block-shard the per-KF sparse BoW rows over the mesh (rows co-sharded
    with `dist_gba.shard_map_state`'s keyframe blocks)."""
    blk = NamedSharding(mesh, P(axis))
    return database.SparseBowStore(
        word=jax.device_put(store.word, blk),
        weight=jax.device_put(store.weight, blk),
    )


def make_distributed_query(mesh: Mesh, axis: str = "blk", top_k: int = 5):
    """Build query(store, kf_valid, q_word, q_weight) ->
    (cand_slots (nblk*top_k,), cand_scores) — the global candidate set,
    replicated on every host.

    Gates mirror `KeyFrameDatabase::DetectRelocalizationCandidates`
    (`src/KeyFrameDatabase.cc:274-391`): common words > 0.8 * global max,
    retain > 0.75 * global best accumulated score. The covisibility-group
    accumulation is approximated per-shard (a candidate's top covisibles
    live in its own trajectory block by construction of the keyframe-block
    sharding).
    """
    from jax import shard_map

    blk = P(axis)
    rep = P()
    nblk = mesh.shape[axis]

    def device_fn(word_l, weight_l, kf_valid_l, q_word, q_weight):
        Kl, M = word_l.shape
        sub = database.SparseBowStore(word=word_l, weight=weight_l)
        common_l, scores_l = database._sparse_common_and_scores(
            sub, q_word, q_weight)
        common_l = jnp.where(kf_valid_l, common_l, 0)
        # global common-word gate (psum-free: max reduces over the axis)
        max_common = jax.lax.pmax(jnp.max(common_l), axis)
        min_common = (0.8 * max_common).astype(jnp.int32)  # :315
        ok_l = kf_valid_l & (common_l > min_common)
        acc_l = jnp.where(ok_l, scores_l, 0.0)
        best_acc = jax.lax.pmax(jnp.max(jnp.where(ok_l, acc_l, -jnp.inf)),
                                axis)
        keep_l = ok_l & (acc_l > 0.75 * best_acc)  # :368
        sc = jnp.where(keep_l, scores_l, -jnp.inf)
        top_s, top_i = jax.lax.top_k(sc, min(top_k, Kl))
        blk_id = jax.lax.axis_index(axis)
        slots = jnp.where(jnp.isfinite(top_s),
                          top_i.astype(jnp.int32) + blk_id * Kl, -1)
        # gather every shard's candidates (small)
        all_slots = jax.lax.all_gather(slots, axis, axis=0, tiled=True)
        all_scores = jax.lax.all_gather(top_s, axis, axis=0, tiled=True)
        return all_slots, all_scores

    sharded = shard_map(
        device_fn, mesh=mesh,
        in_specs=(blk, blk, blk, rep, rep),
        out_specs=(rep, rep),
        check_vma=False,
    )

    @jax.jit
    def query(store: database.SparseBowStore, kf_valid, q_word, q_weight):
        return sharded(store.word, store.weight, kf_valid, q_word, q_weight)

    del nblk
    return query
