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
- `topk_twotier`: the scatter-free EXACT hot path — high-df terms scored for
  every doc by one MXU matmul over a dense [T, N] impact matrix, low-df
  terms fully covered by posting slices + segment-sum, merged top-k (tested
  against `score_all`).
- `topk_lowscatter`: same two tiers, but the low-tier raw postings are
  scatter-added into the high-tier score matrix and top-k runs over the
  totals — fewer passes (~25% faster at bench shape), exact for any impact
  sign when approx=False, whole-result approx recall when approx=True.

Query term ids are padded with -1 (unknown/padding terms contribute 0,
matching BM25Okapi's missing-term behavior); repeated query terms contribute
once per occurrence, as in `bm25.get_scores`.
"""

from __future__ import annotations

from functools import partial
from typing import Optional, Tuple

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


def _low_tier_segsum(
    low_ranges: jax.Array,  # [2, Vcap] explicit (start, end) per term
    post_packed: jax.Array,  # [2, Pcap] int32: (doc, bitcast f32 weight)
    tids: jax.Array,  # [Lq]
    beam: int,
) -> Tuple[jax.Array, jax.Array]:
    """Per-query low-tier contributions grouped by doc.

    Fetches each low-tier query term's full posting list (length <= beam by
    construction) with one dynamic_slice of the packed (doc, weight) array,
    sorts the Lq*beam pool by doc, and segment-sums runs via cumsum deltas.
    Returns (docs [Lq*beam], sums [Lq*beam]); non-run-last slots have doc -1
    and sum -inf.
    """
    pcap = post_packed.shape[1]
    valid = tids >= 0
    safe = jnp.where(valid, tids, 0)
    start = jnp.where(valid, low_ranges[0, safe], 0)
    end = jnp.where(valid, low_ranges[1, safe], 0)
    safe_start = jnp.minimum(start, max(pcap - beam, 0))

    sl = jax.vmap(
        lambda s: jax.lax.dynamic_slice(post_packed, (0, s), (2, beam))
    )(safe_start)  # [Lq, 2, beam]
    docs = sl[:, 0, :]
    w = jax.lax.bitcast_convert_type(sl[:, 1, :], jnp.float32)
    off = jnp.arange(beam, dtype=jnp.int32)[None, :]
    pos = safe_start[:, None] + off
    ok = (pos >= start[:, None]) & (pos < end[:, None])
    docs = jnp.where(ok, docs, _DOC_SENTINEL).reshape(-1)
    w = jnp.where(ok, w, 0.0).reshape(-1)

    order = jnp.argsort(docs)
    docs = docs[order]
    w = w[order]
    # Group by doc with a shift-window sum instead of cumsum/cummax scans:
    # a doc appears at most once per query term, so after sorting, runs of
    # equal doc ids are at most Lq long — the run total at the run's last
    # element is the sum of the <= Lq-1 preceding equal-doc weights.
    n_terms = tids.shape[0]
    run_total = w
    for shift in range(1, n_terms):
        shifted_docs = jnp.concatenate(
            [jnp.full((shift,), -2, dtype=docs.dtype), docs[:-shift]]
        )
        shifted_w = jnp.concatenate(
            [jnp.zeros((shift,), dtype=w.dtype), w[:-shift]]
        )
        run_total = run_total + jnp.where(shifted_docs == docs, shifted_w, 0.0)
    nxt = jnp.concatenate([docs[1:], jnp.array([_DOC_SENTINEL], dtype=docs.dtype)])
    is_last = docs != nxt
    valid = is_last & (docs != _DOC_SENTINEL)
    return (
        jnp.where(valid, docs, -1),
        jnp.where(valid, run_total, -jnp.inf),
    )


@partial(jax.jit, static_argnames=("k", "beam", "approx", "lsel", "nonneg"))
def topk_twotier(
    low_ranges: jax.Array,  # [2, Vcap] (start, end), emptied for dense tier
    post_packed: jax.Array,  # [2, Pcap] packed (doc, bitcast weight)
    term_row: jax.Array,  # [Vcap] -> dense-tier row id or -1
    impact: jax.Array,  # [T_cap, Ncap] per-doc impacts of dense-tier terms
    qtids: jax.Array,  # [B, Lq]
    k: int,
    beam: int,
    approx: bool = False,
    lsel: int = 0,
    impact_scale: Optional[jax.Array] = None,  # [T_cap] per-row int8 scales
    nonneg: bool = True,
) -> Tuple[jax.Array, jax.Array]:
    """EXACT BM25 top-k via two-tier scoring, scatter-free.

    High-df terms (df > beam) contribute through one MXU matmul: a query
    one-hot over dense-tier rows times the [T, N] impact matrix gives their
    contribution H for every doc. Low-df terms (df <= beam) are fully covered
    by posting slices and segment-summed per doc (L). The global top-k of
    H + L is a subset of top-k(H) ∪ docs(L), so merging top-k(H) with the
    L-candidates' H-augmented totals is exact (up to the impact matrix's
    storage dtype rounding). Returns (scores [B, k], doc positions [B, k]);
    callers apply the positive-scores-only contract.

    `approx=True` replaces the exact top-k over the H matrix with the TPU
    PartialReduce-based approx_max_k (~0.95 recall on that branch only —
    returned scores stay exact); exact top_k over [B, N] is ~20x slower on
    current XLA, so the hot path uses approx and parity tests use exact.
    `lsel > 0` additionally truncates the low-tier candidate pool (see the
    inline comment) and is only meaningful together with approx=True; with
    the default lsel=0 and approx=False the op is exact.
    """
    ncap = impact.shape[1]
    tcap = impact.shape[0]
    valid_q = qtids >= 0
    safe_q = jnp.where(valid_q, qtids, 0)
    rows = jnp.where(valid_q, term_row[safe_q], -1)  # [B, Lq]

    # High tier: one-hot (counting repeated query terms) x impact matrix.
    # For int8 impacts, the per-term dequantization scale folds into the
    # one-hot (scale_t multiplies every contribution of term t), so the big
    # matrix is read at 1 byte/element.
    onehot_dtype = jnp.bfloat16 if impact.dtype == jnp.int8 else impact.dtype
    onehot = jnp.sum(
        jax.nn.one_hot(rows, tcap, dtype=onehot_dtype), axis=1
    )  # [B, T]
    if impact_scale is not None:
        onehot = onehot * impact_scale.astype(onehot_dtype)[None, :]
    high = jnp.dot(
        onehot, impact.astype(onehot_dtype), preferred_element_type=jnp.float32
    )  # [B, N]

    # Low tier: per-query segment sums.
    ldocs, lsums = jax.vmap(
        lambda t: _low_tier_segsum(low_ranges, post_packed, t, beam)
    )(qtids)  # [B, Lq*beam]

    if lsel and ldocs.shape[-1] > lsel:
        # Opt-in approximation for wide-beam (budget-capped) corpora: keep
        # only the lsel largest low-tier sums before the H gather. A dropped
        # candidate can be mis-scored (missing its low-tier sum, bounded by
        # the lsel-th largest sum in its row) or, if its H alone is outside
        # top-k(H), missed entirely — so this MUST stay off (lsel=0) on the
        # exact path; callers enable it only alongside approx=True.
        lsums, sel = jax.lax.top_k(lsums, lsel)
        ldocs = jnp.take_along_axis(ldocs, sel, axis=-1)

    if not nonneg:
        # Degenerate corpora (average idf < 0 after the rank_bm25 epsilon
        # floor) can carry NEGATIVE low-tier impacts, which breaks the
        # merge containment argument below (top-k(H+L) need not be inside
        # top-k(H) ∪ docs(L) when L can push docs DOWN). Fall back to an
        # unconditionally exact scatter of L into the H matrix.
        b_ix = jnp.arange(high.shape[0], dtype=jnp.int32)[:, None]
        safe_docs = jnp.clip(ldocs, 0, ncap - 1).astype(jnp.int32)
        add = jnp.where(ldocs >= 0, lsums, 0.0)
        total = high.at[b_ix, safe_docs].add(add)
        if approx:
            vals, docs = jax.lax.approx_max_k(total, k)
        else:
            vals, docs = jax.lax.top_k(total, k)
        return vals, docs.astype(jnp.int32)

    lgather = jnp.take_along_axis(
        high, jnp.clip(ldocs, 0, ncap - 1).astype(jnp.int32), axis=-1
    )
    ltot = jnp.where(ldocs >= 0, lsums + lgather, -jnp.inf)

    if approx:
        hv, hi = jax.lax.approx_max_k(high, k)
        hi = hi.astype(jnp.int32)
    else:
        hv, hi = jax.lax.top_k(high, k)
    # Drop H-only entries that are superseded by an L-augmented total.
    dup = jnp.any(
        hi[:, :, None] == jnp.where(ldocs >= 0, ldocs, -7)[:, None, :], axis=-1
    )
    hv = jnp.where(dup, -jnp.inf, hv)

    cat_v = jnp.concatenate([hv, ltot], axis=-1)
    cat_i = jnp.concatenate([hi, ldocs], axis=-1)
    vals, sel = jax.lax.top_k(cat_v, k)
    docs = jnp.take_along_axis(cat_i, sel, axis=-1)
    docs = jnp.where(jnp.isneginf(vals), -1, docs)
    vals = jnp.where(jnp.isneginf(vals), 0.0, vals)
    return vals, docs.astype(jnp.int32)


@partial(jax.jit, static_argnames=("k", "beam", "approx", "recall_target"))
def topk_lowscatter(
    low_ranges: jax.Array,  # [2, Vcap] (start, end), emptied for dense tier
    post_packed: jax.Array,  # [2, Pcap] packed (doc, bitcast weight)
    term_row: jax.Array,  # [Vcap] -> dense-tier row id or -1
    impact: jax.Array,  # [T_cap, Ncap] per-doc impacts of dense-tier terms
    qtids: jax.Array,  # [B, Lq]
    k: int,
    beam: int,
    approx: bool = False,
    impact_scale: Optional[jax.Array] = None,  # [T_cap] per-row int8 scales
    recall_target: float = 0.95,  # approx_max_k per-row recall (approx=True)
    active_rows: Optional[jax.Array] = None,  # [Ta_cap] batch-active rows
    rows_compact: Optional[jax.Array] = None,  # [B, Lq] compact slot or -1
    low_blocks: Optional[jax.Array] = None,  # [Lcap, 2, beam] padded blocks
    low_row: Optional[jax.Array] = None,  # [Vcap] -> block row (pad = last)
) -> Tuple[jax.Array, jax.Array]:
    """Two-tier BM25 top-k via low-tier scatter-add (no sort, no merge).

    Same index layout as `topk_twotier`, different low-tier mechanics: the
    raw (doc, weight) posting entries of each low-df query term are
    scatter-added straight into the high-tier [B, N] score matrix (duplicate
    docs accumulate natively), then one top-k over the totals. Compared to
    `topk_twotier` this removes the per-query argsort, the shift-window
    segment-sum, the H-gather for L-candidates and the containment merge —
    measured ~25% faster at batch 2048 on the wiki-100k bench shape — and it
    is unconditionally exact for ANY impact sign when approx=False (no
    containment argument needed). With approx=True, `approx_max_k` runs over
    the full totals, so low-tier candidates share its ~0.95/row recall
    (measured top-10 agreement vs exact: 0.966 vs twotier's 0.975 on the
    bench corpus). Callers apply the positive-scores-only contract.

    Round-3 layout options, both from the measured stage breakdown
    (docs/kernels.md):
    - Active-term compaction: with `active_rows` (the batch's active
      dense-tier row ids, 0-padded, host-computed by
      retrieval/fused.encode_for_fused) and `rows_compact` (qtids remapped
      to compact slots, -1 elsewhere), the high tier runs on the gathered
      [Ta_cap, N] submatrix, with the one-hot built by a REAL scatter into
      a [B, Ta] buffer so XLA emits an MXU matmul instead of rewriting the
      one-hot pattern into per-slot row gathers (whose cost is B*Lq rows
      regardless of T).
    - Padded low-tier blocks: with `low_blocks`/`low_row` (index sync
      builds them under `low_block_budget_bytes`), the low tier is ONE row
      gather of [B, Lq] block rows instead of B*Lq dynamic slices
      (measured 25 ms/batch of pure slice overhead at bench shape).
    """
    ncap = impact.shape[1]
    tcap = impact.shape[0]
    pcap = post_packed.shape[1]
    nq = qtids.shape[0]
    valid_q = qtids >= 0
    safe_q = jnp.where(valid_q, qtids, 0)
    b_ix = jnp.arange(nq, dtype=jnp.int32)[:, None]

    # High tier: one-hot x impact matmul, over the batch-active submatrix
    # when compaction inputs are provided.
    onehot_dtype = jnp.bfloat16 if impact.dtype == jnp.int8 else impact.dtype
    if active_rows is not None and rows_compact is not None:
        t_active = active_rows.shape[0]
        sub_impact = impact[active_rows]  # [Ta_cap, N] gather
        scale_slot = (
            impact_scale[active_rows][jnp.maximum(rows_compact, 0)]
            if impact_scale is not None
            else jnp.ones(rows_compact.shape, jnp.float32)
        )
        # Scatter-built one-hot (not jax.nn.one_hot + sum): a materialized
        # [B, Ta] operand forces a true MXU matmul. Dead slots use an
        # out-of-bounds-HIGH sentinel (t_active) so mode="drop" discards
        # them — a -1 sentinel would WRAP to the last column (jnp.at
        # applies NumPy negative-index semantics before the OOB check).
        rc = jnp.where(rows_compact >= 0, rows_compact, t_active)
        onehot = jnp.zeros((nq, t_active), dtype=onehot_dtype).at[
            b_ix, rc
        ].add(scale_slot.astype(onehot_dtype), mode="drop")
        high = jnp.dot(
            onehot, sub_impact.astype(onehot_dtype),
            preferred_element_type=jnp.float32,
        )  # [B, N]
    else:
        rows = jnp.where(valid_q, term_row[safe_q], -1)
        onehot = jnp.sum(
            jax.nn.one_hot(rows, tcap, dtype=onehot_dtype), axis=1
        )
        if impact_scale is not None:
            onehot = onehot * impact_scale.astype(onehot_dtype)[None, :]
        high = jnp.dot(
            onehot, impact.astype(onehot_dtype),
            preferred_element_type=jnp.float32,
        )  # [B, N]

    # Low tier: posting entries scattered into the totals. Padded-block
    # layout (one row gather) when available; else per-term dynamic slices.
    if low_blocks is not None and low_row is not None:
        pad_row = low_blocks.shape[0] - 1  # all-pad row
        # low_row maps dense-tier/unseen terms to the pad row already;
        # padding QUERY slots (qtids -1) must route there explicitly
        # (safe_q turned them into term 0).
        brows = jnp.where(valid_q, low_row[safe_q], pad_row)
        sl = low_blocks[brows]  # [B, Lq, 2, beam] single gather
        docs = sl[:, :, 0, :].reshape(nq, -1)
        w = jax.lax.bitcast_convert_type(
            sl[:, :, 1, :], jnp.float32
        ).reshape(nq, -1)  # padding entries: doc=ncap (OOB), dropped below
    else:
        start = jnp.where(valid_q, low_ranges[0, safe_q], 0)
        end = jnp.where(valid_q, low_ranges[1, safe_q], 0)
        safe_start = jnp.minimum(start, max(pcap - beam, 0))
        sl = jax.vmap(jax.vmap(
            lambda s: jax.lax.dynamic_slice(post_packed, (0, s), (2, beam))
        ))(safe_start)  # [B, Lq, 2, beam]
        docs = sl[:, :, 0, :]
        w = jax.lax.bitcast_convert_type(sl[:, :, 1, :], jnp.float32)
        off = jnp.arange(beam, dtype=jnp.int32)[None, None, :]
        pos = safe_start[:, :, None] + off
        ok = (pos >= start[:, :, None]) & (pos < end[:, :, None])
        docs = jnp.where(ok, docs, 0).reshape(nq, -1)  # masked -> add 0.0
        w = jnp.where(ok, w, 0.0).reshape(nq, -1)
    # mode="drop" discards the block layout's OOB padding entries; the
    # slice layout's padding (doc 0, +0.0) is in-bounds and adds zero.
    total = high.at[b_ix, docs].add(w, mode="drop")

    if approx:
        vals, idx = jax.lax.approx_max_k(total, k, recall_target=recall_target)
    else:
        vals, idx = jax.lax.top_k(total, k)
    return vals, idx.astype(jnp.int32)


@partial(jax.jit, static_argnames=("k",))
def topk_from_scores(scores: jax.Array, k: int) -> Tuple[jax.Array, jax.Array]:
    """Top-k over dense score rows; -1 indices for non-positive-score slots.

    Matches the reference's positive-scores-only contract for BM25 search
    results (streaming_index.py:172-179).
    """
    vals, idx = jax.lax.top_k(scores, k)
    dead = vals <= 0.0
    return jnp.where(dead, 0.0, vals), jnp.where(dead, -1, idx).astype(jnp.int32)
