"""Keyframe database: BoW retrieval for loop detection and relocalization.

`KeyFrameDatabase` parity (`src/KeyFrameDatabase.cc`, SURVEY.md §2.1). The
reference keeps an inverted index word -> list<KeyFrame*> and walks lists
per query word (`DetectLoopCandidates`, `:151-272`). TPU-native design:
BoW vectors live as a dense (K, W) matrix, so

- common-word counts = boolean matmul (query>0) . (bow>0)^T;
- L1 similarity scores for ALL keyframes = one matmul;
- the reference's gates run as masked reductions: minCommonWords =
  0.8 * maxCommonWords (`:195,315`), minScore floor (loop only),
  covisibility-group score accumulation over top-10 covisibles with the
  0.75 * bestAccScore cut (`:227-258,342-380`).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..optim import lm as lm_mod
from ..slammap import mapstate as ms


def empty_bow_store(max_keyframes: int, n_words: int) -> jax.Array:
    return jnp.zeros((max_keyframes, n_words), jnp.float32)


def add_keyframe_bow(store: jax.Array, kf_slot, bow: jax.Array) -> jax.Array:
    """`KeyFrameDatabase::add` (`:115-121`)."""
    return store.at[kf_slot].set(bow)


def erase_keyframe_bow(store: jax.Array, kf_slot) -> jax.Array:
    """`KeyFrameDatabase::erase` (`:123-142`)."""
    return store.at[kf_slot].set(0.0)


def _common_words_and_scores(store: jax.Array, query: jax.Array):
    common = jax.lax.dot_general(
        (store > 0).astype(jnp.float32), (query > 0).astype(jnp.float32),
        (((1,), (0,)), ((), ())), precision=lm_mod.HI,
    )  # (K,)
    # L1 score vs all rows: 1 - 0.5*sum|a-b|
    scores = 1.0 - 0.5 * jnp.sum(jnp.abs(store - query[None, :]), axis=-1)
    return common.astype(jnp.int32), scores


@jax.jit
def detect_loop_candidates(store: jax.Array, state: ms.MapState,
                           query_bow: jax.Array, query_kf,
                           min_score: jax.Array):
    """`DetectLoopCandidates` (`src/KeyFrameDatabase.cc:151-272`).

    Excludes the query's covisible neighbours; gates: common words >
    0.8*max, score >= minScore, then accumulated covisibility-group score
    (top-10 covisibles of each candidate) with the 0.75*bestAccScore cut.
    Returns (candidate_mask (K,), scores (K,)).
    """
    K = store.shape[0]
    connected = state.covis[query_kf] > 0
    eligible = state.kf_valid & ~connected & (jnp.arange(K) != query_kf)
    common, scores = _common_words_and_scores(store, query_bow)
    common = jnp.where(eligible, common, 0)
    max_common = jnp.max(common)
    min_common = (0.8 * max_common).astype(jnp.int32)  # :195
    ok = eligible & (common > min_common) & (scores >= min_score)
    # accumulated group score over each candidate's top-10 covisibles (:227-246)
    top_w, top_kf = jax.lax.top_k(state.covis, 10)  # (K,10)
    neigh_ok = (top_w > 0) & ok[top_kf]  # neighbours that also matched
    neigh_scores = jnp.where(neigh_ok, scores[top_kf], 0.0)
    acc = jnp.where(ok, scores, 0.0) + jnp.sum(neigh_scores, -1)
    best_acc = jnp.max(jnp.where(ok, acc, -jnp.inf))
    keep = ok & (acc > 0.75 * best_acc)  # :251
    return keep, scores


@jax.jit
def detect_relocalization_candidates(store: jax.Array, state: ms.MapState,
                                     query_bow: jax.Array):
    """`DetectRelocalizationCandidates` (`src/KeyFrameDatabase.cc:274-391`) —
    same gating minus the covisibility exclusion and minScore floor."""
    common, scores = _common_words_and_scores(store, query_bow)
    common = jnp.where(state.kf_valid, common, 0)
    max_common = jnp.max(common)
    min_common = (0.8 * max_common).astype(jnp.int32)  # :315
    ok = state.kf_valid & (common > min_common)
    top_w, top_kf = jax.lax.top_k(state.covis, 10)
    neigh_ok = (top_w > 0) & ok[top_kf]
    neigh_scores = jnp.where(neigh_ok, scores[top_kf], 0.0)
    acc = jnp.where(ok, scores, 0.0) + jnp.sum(neigh_scores, -1)
    best_acc = jnp.max(jnp.where(ok, acc, -jnp.inf))
    keep = ok & (acc > 0.75 * best_acc)  # :368
    return keep, scores
