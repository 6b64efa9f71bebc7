"""On-device BM25 scoring over CSR postings.

TPU-native replacement for the reference's pure-Python full-corpus BM25 scan
(rank_bm25 via streaming_index.py:150-179). The index layout is
term-major CSR with **precomputed per-posting impacts**:

    indptr  [Vcap+1] int32   postings range of each term id
    post_doc [Pcap]  int32   doc row position, ascending within a term
    post_w   [Pcap]  float32 idf(t) * tf*(k1+1) / (tf + k1*(1-b+b*dl/avgdl))

so query-time scoring is pure gather/sum — the Okapi math runs once per index
sync, vectorized. Three query ops:

- `score_all`: exhaustive scores for every doc (scatter-add; exact parity
  oracle for the reference's `bm25.get_scores`).
- `score_docs`: exact scores for an arbitrary doc set via per-term binary
  search over the doc-sorted postings (no scatter; used to score the hybrid
  union pool for the router).
- `topk_twostage`: impact-ordered candidate generation + sort/segment-sum +
  exact rescore — the scatter-free hot path (exact whenever `beam` covers
  each query term's posting list; tested against `score_all`).

Query term ids are padded with -1 (unknown/padding terms contribute 0,
matching BM25Okapi's missing-term behavior); repeated query terms contribute
once per occurrence, as in `bm25.get_scores`.
"""

from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp

_DOC_SENTINEL = jnp.iinfo(jnp.int32).max


def _term_ranges(indptr: jax.Array, qtids: jax.Array) -> Tuple[jax.Array, jax.Array]:
    """(start, end) postings ranges per query slot; empty range for padding."""
    valid = qtids >= 0
    safe = jnp.where(valid, qtids, 0)
    start = indptr[safe]
    end = indptr[safe + 1]
    start = jnp.where(valid, start, 0)
    end = jnp.where(valid, end, 0)
    return start, end


def _segment_searchsorted(
    post_doc: jax.Array, start: jax.Array, end: jax.Array, target: jax.Array
) -> jax.Array:
    """First index in [start, end) with post_doc[i] >= target (binary search).

    Vectorized over arbitrary broadcasted shapes of start/end/target.
    """
    pcap = post_doc.shape[0]
    start, end, target = jnp.broadcast_arrays(start, end, target)

    def body(_, lh):
        lo, hi = lh
        active = lo < hi
        mid = (lo + hi) >> 1
        v = post_doc[jnp.clip(mid, 0, pcap - 1)]
        less = v < target
        lo = jnp.where(active & less, mid + 1, lo)
        hi = jnp.where(active & ~less, mid, hi)
        return lo, hi

    lo, _ = jax.lax.fori_loop(0, 32, body, (start, end))
    return lo


@partial(jax.jit, static_argnames=("n_docs_cap", "max_df"))
def score_all(
    indptr: jax.Array,
    post_doc: jax.Array,
    post_w: jax.Array,
    qtids: jax.Array,  # [B, Lq] int32, -1 padded
    n_docs_cap: int,
    max_df: int,
) -> jax.Array:
    """Exhaustive BM25 scores [B, n_docs_cap] (exact, scatter-add)."""
    pcap = post_doc.shape[0]
    off = jnp.arange(max_df, dtype=jnp.int32)

    def one_query(tids: jax.Array) -> jax.Array:
        start, end = _term_ranges(indptr, tids)  # [Lq]
        idx = start[:, None] + off[None, :]  # [Lq, max_df]
        ok = off[None, :] < (end - start)[:, None]
        idx = jnp.clip(idx, 0, pcap - 1)
        docs = post_doc[idx]
        w = jnp.where(ok, post_w[idx], 0.0)
        scores = jnp.zeros((n_docs_cap,), dtype=jnp.float32)
        docs = jnp.where(ok, docs, 0)  # masked entries add 0.0 to row 0
        return scores.at[docs.reshape(-1)].add(w.reshape(-1))

    return jax.vmap(one_query)(qtids)


@jax.jit
def score_docs(
    indptr: jax.Array,
    post_doc: jax.Array,
    post_w: jax.Array,
    qtids: jax.Array,  # [B, Lq]
    doc_positions: jax.Array,  # [B, P] int32, -1 padded
) -> jax.Array:
    """Exact BM25 scores [B, P] for specific docs (binary-search lookup)."""
    pcap = post_doc.shape[0]

    def one_query(tids: jax.Array, docs: jax.Array) -> jax.Array:
        start, end = _term_ranges(indptr, tids)  # [Lq]
        target = jnp.maximum(docs, 0)[None, :]  # [1, P]
        lo = _segment_searchsorted(
            post_doc, start[:, None], end[:, None], target
        )  # [Lq, P]
        hit = (lo < end[:, None]) & (post_doc[jnp.clip(lo, 0, pcap - 1)] == target)
        w = jnp.where(hit, post_w[jnp.clip(lo, 0, pcap - 1)], 0.0)
        total = jnp.sum(w, axis=0)  # [P]
        return jnp.where(docs >= 0, total, 0.0)

    return jax.vmap(one_query)(qtids, doc_positions)


@partial(jax.jit, static_argnames=("k", "beam", "rescore"))
def topk_twostage(
    indptr: jax.Array,
    post_doc: jax.Array,
    post_w: jax.Array,
    cand_indptr: jax.Array,
    cand_doc: jax.Array,  # impact-ordered within each term
    cand_w: jax.Array,
    qtids: jax.Array,  # [B, Lq]
    k: int,
    beam: int = 1024,
    rescore: int = 0,  # 0 => 4 * k
) -> Tuple[jax.Array, jax.Array]:
    """Scatter-free BM25 top-k: impact candidates -> segment-sum -> exact rescore.

    Returns (scores [B, k] float32, doc positions [B, k] int32, -1 for dead
    slots). Exact whenever every query term's full posting list fits in
    `beam`; otherwise candidate generation is impact-truncated (rescoring of
    surviving candidates is always exact).
    """
    n_rescore = rescore or 4 * k
    ccap = cand_doc.shape[0]
    off = jnp.arange(beam, dtype=jnp.int32)

    def gen_one(tids: jax.Array) -> Tuple[jax.Array, jax.Array]:
        start, end = _term_ranges(cand_indptr, tids)  # [Lq]
        idx = jnp.clip(start[:, None] + off[None, :], 0, ccap - 1)
        ok = off[None, :] < (end - start)[:, None]
        docs = jnp.where(ok, cand_doc[idx], _DOC_SENTINEL).reshape(-1)
        w = jnp.where(ok, cand_w[idx], 0.0).reshape(-1)

        # Group contributions by doc: sort, then run-sum via cumsum deltas.
        order = jnp.argsort(docs)
        docs = docs[order]
        w = w[order]
        cs = jnp.cumsum(w)
        prev = jnp.concatenate([jnp.array([-1], dtype=docs.dtype), docs[:-1]])
        nxt = jnp.concatenate([docs[1:], jnp.array([_DOC_SENTINEL], dtype=docs.dtype)])
        is_first = docs != prev
        is_last = docs != nxt
        # cs value just before the current run starts, carried across the run.
        base = jax.lax.cummax(jnp.where(is_first, cs - w, -jnp.inf))
        run_total = cs - jnp.maximum(base, 0.0)
        valid = is_last & (docs != _DOC_SENTINEL)
        part = jnp.where(valid, run_total, -jnp.inf)
        pv, sel = jax.lax.top_k(part, n_rescore)
        pd = jnp.where(jnp.isneginf(pv), -1, docs[sel])
        return pd, pv

    cand_positions, _ = jax.vmap(gen_one)(qtids)  # [B, n_rescore]
    exact = score_docs(indptr, post_doc, post_w, qtids, cand_positions)
    exact = jnp.where(cand_positions >= 0, exact, -jnp.inf)
    vals, sel = jax.lax.top_k(exact, k)
    docs = jnp.take_along_axis(cand_positions, sel, axis=-1)
    docs = jnp.where(jnp.isneginf(vals), -1, docs)
    vals = jnp.where(jnp.isneginf(vals), 0.0, vals)
    return vals, docs


@partial(jax.jit, static_argnames=("k",))
def topk_from_scores(scores: jax.Array, k: int) -> Tuple[jax.Array, jax.Array]:
    """Top-k over dense score rows; -1 indices for non-positive-score slots.

    Matches the reference's positive-scores-only contract for BM25 search
    results (streaming_index.py:172-179).
    """
    vals, idx = jax.lax.top_k(scores, k)
    dead = vals <= 0.0
    return jnp.where(dead, 0.0, vals), jnp.where(dead, -1, idx).astype(jnp.int32)
