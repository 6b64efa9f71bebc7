"""Fused on-device hybrid query: one XLA program from query vectors to top-k.

This is the framework's hot path (the reference walks streaming_index.py
hybrid_search -> router.forward -> torch.topk across Python/HTTP boundaries,
SURVEY.md §3.2). One jit-compiled program does:

    dense top-pool      one [B, N] cosine matmul (MXU) + top-k
    sparse top-pool     impact-ordered BM25 candidates, sort-light segment sum
    union merge         equality-matrix join of the two pools (no sort,
                        no gather); missing scores are 0.0, the reference's
                        union semantics (streaming_index.py:498-499)
    fusion              learned router gating (router.py:199) or the
                        reference's fixed mean-of-max-normalized fusion
                        (streaming_index.py:510-521)
    final top-k

Gather- and scatter-free by construction: per-query work is a matmul row,
contiguous posting slices, small sorts (<= prune), and elementwise math —
the shapes TPUs like. Exact variants of both pools exist for parity tests
(exact_bm25 / dense streaming top-k).
"""

from __future__ import annotations

from functools import partial
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from rag_uq_tpu.ops import bm25 as bm25_ops
from rag_uq_tpu.ops.topk import cosine_topk, cosine_topk_single
from rag_uq_tpu.router.model import fuse_hybrid

_INT_MAX = jnp.iinfo(jnp.int32).max


def union_dedup(positions: jax.Array) -> jax.Array:
    """Sort-based on-device dedup of doc positions; dups/dead become -1."""
    mapped = jnp.where(positions >= 0, positions, _INT_MAX)
    s = jnp.sort(mapped, axis=-1)
    prev = jnp.concatenate(
        [jnp.full(s.shape[:-1] + (1,), -1, dtype=s.dtype), s[..., :-1]], axis=-1
    )
    keep = (s != prev) & (s != _INT_MAX)
    return jnp.where(keep, s, -1)


def merge_pools(
    bvals: jax.Array,  # [B, Pb] BM25 pool scores
    bidx: jax.Array,  # [B, Pb] doc positions (-1 dead)
    dvals: jax.Array,  # [B, Pd] dense pool scores
    didx: jax.Array,  # [B, Pd]
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Union the two pools with aligned per-doc score columns.

    Docs in both pools collapse onto the dense entry, which receives the BM25
    score; scores missing from a pool are 0.0 (reference union semantics).
    Pure elementwise/einsum — no sort, no gather. Returns
    (positions [B, Pb+Pd], bm25_col, dense_col).
    """
    live_d = didx >= 0
    live_b = bidx >= 0
    eq = (didx[:, :, None] == bidx[:, None, :]) & live_d[:, :, None] & live_b[:, None, :]
    bm25_for_dense = jnp.einsum("bij,bj->bi", eq.astype(bvals.dtype), bvals)
    b_is_dup = jnp.any(eq, axis=1)  # [B, Pb]

    positions = jnp.concatenate([didx, jnp.where(b_is_dup, -1, bidx)], axis=-1)
    dense_col = jnp.concatenate(
        [jnp.where(live_d, dvals, 0.0), jnp.zeros_like(bvals)], axis=-1
    )
    bm25_col = jnp.concatenate(
        [bm25_for_dense, jnp.where(b_is_dup | ~live_b, 0.0, bvals)], axis=-1
    )
    return positions, bm25_col, dense_col


def fuse_pools_select(
    bvals: jax.Array,
    bidx: jax.Array,
    dvals: jax.Array,
    didx: jax.Array,
    k: int,
    router_module=None,
    router_vars=None,
    router_width: Optional[int] = None,
) -> Tuple[jax.Array, jax.Array]:
    """Union-merge the two pools, fuse (router or fixed), select final top-k.

    The shared tail of the single-chip fused query and the sharded fused
    query (parallel/sharding.py::make_fused_sharded_query) — one definition
    so the two paths cannot drift. Reference semantics:
    streaming_index.py:498-521 (union + mean-of-max-normalized fusion) or
    retrieval_router.py:199 (learned gating).

    `router_width` clamps the gate to the pool width it was trained on
    (router.trained_num_passages, reference num_passages=20): the deployed
    policy then matches the eval protocol (cli/evaluate._router_order over
    the "balanced" pool) — balanced-select the `router_width` head of the
    union pool by best single-tower rank, router-rerank ONLY that head, and
    rank every non-selected member after it in fixed-fusion order. Without
    it the gate scores the full ~2*pool merged columns, a train/serve
    distribution shift (advisor r3; review r4).
    """
    positions, bm25_scores, dense_scores = merge_pools(bvals, bidx, dvals, didx)
    live = positions >= 0

    if router_module is not None and router_vars is not None:
        M = bm25_scores.shape[-1]
        w = min(router_width or M, M)
        if w < M:
            return _router_head_select(
                positions, bm25_scores, dense_scores, live, k, w,
                router_module, router_vars,
            )
        weights = router_module.apply(
            router_vars, bm25_scores, dense_scores,
            update_stats=False, train=False,
        )
        hybrid = fuse_hybrid(
            router_module.config, weights, bm25_scores, dense_scores
        )
    else:
        # Reference fixed fusion: mean of per-query max-normalized scores.
        max_b = jnp.maximum(jnp.max(bm25_scores, axis=-1, keepdims=True), 1e-12)
        max_d = jnp.maximum(jnp.max(dense_scores, axis=-1, keepdims=True), 1e-12)
        hybrid = (bm25_scores / max_b + dense_scores / max_d) / 2.0

    hybrid = jnp.where(live, hybrid, -jnp.inf)
    vals, sel = jax.lax.top_k(hybrid, k)
    out_pos = jnp.take_along_axis(positions, sel, axis=-1)
    out_pos = jnp.where(jnp.isneginf(vals), -1, out_pos)
    vals = jnp.where(jnp.isneginf(vals), 0.0, vals)
    return vals, out_pos


def _router_head_select(
    positions: jax.Array,
    bm25_scores: jax.Array,
    dense_scores: jax.Array,
    live: jax.Array,
    k: int,
    w: int,
    router_module,
    router_vars,
) -> Tuple[jax.Array, jax.Array]:
    """Balanced-head router rerank at the trained width — the in-program
    twin of the host-side eval protocol (get_scores_for_router_batch
    pool_order="balanced" + cli/evaluate._router_order): select the w-member
    head by best single-tower rank (fused-score tiebreak), present it in
    fixed-fusion order, gate ONLY that head, and rank all non-selected
    members after it in fixed-fusion order. All small [B, M] sorts (M ~ 100)
    — trivial VPU work next to the towers."""
    neg = -jnp.inf
    M = positions.shape[-1]
    b_live = jnp.where(live, bm25_scores, neg)
    d_live = jnp.where(live, dense_scores, neg)
    max_b = jnp.maximum(jnp.max(b_live, axis=-1, keepdims=True), 1e-12)
    max_d = jnp.maximum(jnp.max(d_live, axis=-1, keepdims=True), 1e-12)
    fused_s = jnp.where(
        live, (bm25_scores / max_b + dense_scores / max_d) / 2.0, neg
    )
    rank_b = jnp.argsort(jnp.argsort(-b_live, axis=-1), axis=-1)
    rank_d = jnp.argsort(jnp.argsort(-d_live, axis=-1), axis=-1)
    min_rank = jnp.where(live, jnp.minimum(rank_b, rank_d), M + 1)
    # Balanced selection: primary best single-tower rank, secondary fused.
    sel = jnp.lexsort((-fused_s, min_rank), axis=-1)[..., :w]
    sel_fused = jnp.take_along_axis(fused_s, sel, axis=-1)
    head = jnp.take_along_axis(sel, jnp.argsort(-sel_fused, axis=-1), axis=-1)
    hb = jnp.take_along_axis(bm25_scores, head, axis=-1)
    hd = jnp.take_along_axis(dense_scores, head, axis=-1)
    h_live = jnp.take_along_axis(live, head, axis=-1)
    hb = jnp.where(h_live, hb, 0.0)
    hd = jnp.where(h_live, hd, 0.0)
    weights = router_module.apply(
        router_vars, hb, hd, update_stats=False, train=False,
    )
    gated = jnp.where(
        h_live, fuse_hybrid(router_module.config, weights, hb, hd), neg
    )
    # Per-column rank keys: head members take 0..w-1 by gated score, every
    # other member w + its fused rank; dead columns sink unconditionally.
    # Stable argsorts keep tie semantics identical to the numpy eval path.
    rank_in_head = jnp.argsort(jnp.argsort(-gated, axis=-1), axis=-1)
    rank_fused = jnp.argsort(jnp.argsort(-fused_s, axis=-1), axis=-1)
    key = jax.vmap(lambda kk, hh, rr: kk.at[hh].set(rr))(
        w + rank_fused, head, rank_in_head
    )
    key = jnp.where(live, key, 2 * M + w)
    # Returned scores: ONE scale for every row — the max-normalized
    # fixed-fusion score (<= 1). Ranking (head by gated router score, then
    # tail by fused) is carried entirely by `key`, so returned vals are NOT
    # guaranteed descending under the router policy; the previous mix of
    # raw gated head scores and normalized fused tail scores was
    # incomparable within one result list (advisor r4).
    vals_src = fused_s
    sel_k = jnp.argsort(key, axis=-1)[..., :k]
    out_pos = jnp.take_along_axis(positions, sel_k, axis=-1)
    out_vals = jnp.take_along_axis(vals_src, sel_k, axis=-1)
    out_live = jnp.take_along_axis(live, sel_k, axis=-1)
    out_pos = jnp.where(out_live, out_pos, -1)
    out_vals = jnp.where(out_live, out_vals, 0.0)
    return out_vals, out_pos


def make_fused_hybrid_query(
    router_module=None,
    router_width: Optional[int] = None,  # router.trained_num_passages
    k: int = 10,
    pool: int = 50,
    block: int = 8192,
    beam: int = 128,
    approx_topk: bool = True,
    exact_bm25: bool = False,
    dense_mode: str = "single",  # "single" | "single_approx" | "stream"
    max_df: Optional[int] = None,  # REQUIRED with exact_bm25 (index max df)
    nonneg: bool = True,  # pass the index's dev["nonneg"] flag
    delta_cap: int = 0,  # live-ingest delta doc capacity (0 = no delta)
    delta_max_df: int = 0,
    sparse_mode: str = "twotier",  # "twotier" | "scatter"
    sparse_recall_target: float = 0.95,  # scatter-mode approx_max_k recall
    lsel: int = 4096,  # twotier approx low-tier candidate truncation (0 = off)
):
    """Build the jitted fused query fn.

    Returns fn(index_state, q_vecs, qterms, router_vars) ->
    (scores [B, k], positions [B, k]) where `index_state` is the dict from
    `build_index_state`, `qterms` the dict from `encode_for_fused`, and
    `router_vars` is {"params", "stats"} or None for the reference's
    fixed-weight fusion.

    sparse_mode selects the BM25 pool op: "twotier" (containment merge,
    exact L-candidates even under approx_topk) or "scatter"
    (`topk_lowscatter`: low-tier postings scatter-added into the high-tier
    totals — ~25% faster at bench shape, whole-pool approx recall under
    approx_topk, exact for any impact sign when approx_topk=False).
    """
    if exact_bm25 and max_df is None:
        raise ValueError(
            "exact_bm25=True needs max_df=bm25_index._sync()['max_df'] — a "
            "default cap would silently truncate postings of common terms"
        )
    if sparse_mode not in ("twotier", "scatter"):
        raise ValueError(f"unknown sparse_mode {sparse_mode!r}")

    @partial(jax.jit, static_argnames=())
    def fused(state: Dict[str, Any], q_vecs, qterms, router_vars=None):
        emb = state["emb"]
        size = state["size"]

        if dense_mode == "stream":
            dvals, didx = cosine_topk(emb, q_vecs, size, pool, block)
        elif dense_mode == "pallas":
            from rag_uq_tpu.ops.pallas_topk import pallas_cosine_topk

            dvals, didx = pallas_cosine_topk(emb, q_vecs, size, pool, block)
        else:
            dvals, didx = cosine_topk_single(
                emb, q_vecs, size, pool, approx=(dense_mode == "single_approx")
            )
        dvals = jnp.where(didx >= 0, dvals, 0.0)

        if exact_bm25:
            all_scores = bm25_ops.score_all(
                state["indptr"], state["post_doc"], state["post_w"],
                qterms["qtids"], emb.shape[0], max_df,
            )
            bvals, bidx = bm25_ops.topk_from_scores(all_scores, pool)
        else:
            if sparse_mode == "scatter":
                bvals, bidx = bm25_ops.topk_lowscatter(
                    state["low_ranges"], state["post_packed"],
                    state["term_row"], state["impact"],
                    qterms["qtids_base"], pool, beam=beam, approx=approx_topk,
                    impact_scale=state["impact_scale"],
                    recall_target=sparse_recall_target,
                    active_rows=qterms.get("active_rows"),
                    rows_compact=qterms.get("rows_compact"),
                    low_blocks=state.get("low_blocks"),
                    low_row=state.get("low_row"),
                )
            else:
                bvals, bidx = bm25_ops.topk_twotier(
                    state["low_ranges"], state["post_packed"],
                    state["term_row"], state["impact"],
                    qterms["qtids_base"], pool, beam=beam, approx=approx_topk,
                    lsel=lsel if approx_topk else 0,
                    impact_scale=state["impact_scale"],
                    nonneg=nonneg,
                )
            if "delta_indptr" in state:
                # Live-ingest delta: exhaustively score the recently added
                # docs (small) and merge into the BM25 pool.
                dscores = bm25_ops.score_all(
                    state["delta_indptr"], state["delta_post_doc"],
                    state["delta_post_w"], qterms["qtids"],
                    delta_cap, delta_max_df,
                )
                k_delta = min(pool, delta_cap)
                dv, di = bm25_ops.topk_from_scores(dscores, k_delta)
                di = jnp.where(di >= 0, di + state["delta_base_docs"], -1)
                cat_v = jnp.concatenate([bvals, dv], axis=-1)
                cat_i = jnp.concatenate([bidx, di], axis=-1)
                bvals, sel = jax.lax.top_k(cat_v, pool)
                bidx = jnp.take_along_axis(cat_i, sel, axis=-1)
            dead = bvals <= 0.0
            bvals = jnp.where(dead, 0.0, bvals)
            bidx = jnp.where(dead, -1, bidx)

        return fuse_pools_select(
            bvals, bidx, dvals, didx, k,
            router_module=router_module, router_vars=router_vars,
            router_width=router_width,
        )

    return fused


def encode_for_fused(
    bm25_index, queries, active_compaction: bool = False
) -> Dict[str, jax.Array]:
    """Encode a query batch into the fused program's term inputs.

    qtids_base clamps term ids beyond the synced base vocabulary capacity
    (terms first seen after the base sync exist only in the delta).

    With `active_compaction`, also emits the BM25 high-tier active-term
    compaction inputs (ops/bm25.topk_lowscatter): `active_rows` — the
    pow2-bucketed, 0-padded list of dense-tier impact rows any query in the
    batch touches — and `rows_compact` — qtids remapped to compact slots
    (-1 for padding/low-tier terms). Host cost is one np.unique over
    [B*Lq] ints; the device matmul then runs on the [Ta, N] submatrix
    instead of all T_cap rows (measured 3.5x on the high tier).
    """
    import jax.numpy as jnp

    qtids = bm25_index.encode_queries(queries)
    base_dev = bm25_index._device
    if base_dev is not None:
        base_vcap = base_dev["indptr"].shape[0] - 1
        qtids_base = np.where(qtids < base_vcap, qtids, -1)
    else:
        qtids_base = qtids
    out = {
        "qtids": jnp.asarray(qtids),
        "qtids_base": jnp.asarray(qtids_base),
    }
    if active_compaction and base_dev is not None:
        host_term_row = bm25_index._term_row_host
        safe = np.where(qtids_base >= 0, qtids_base, 0)
        rows = np.where(
            qtids_base >= 0, host_term_row[safe], -1
        )  # [B, Lq] impact row or -1
        uniq = np.unique(rows[rows >= 0])
        ta_cap = int(_next_pow2_host(max(uniq.shape[0], 1), floor=64))
        active = np.zeros(ta_cap, dtype=np.int32)
        active[: uniq.shape[0]] = uniq
        remap = np.full(base_dev["impact"].shape[0], -1, dtype=np.int32)
        remap[uniq] = np.arange(uniq.shape[0], dtype=np.int32)
        rows_compact = np.where(rows >= 0, remap[np.maximum(rows, 0)], -1)
        out["active_rows"] = jnp.asarray(active)
        out["rows_compact"] = jnp.asarray(rows_compact)
    return out


def _next_pow2_host(n: int, floor: int = 1) -> int:
    p = floor
    while p < n:
        p <<= 1
    return p


def build_index_state(
    dense_index, bm25_index, allow_delta: bool = False
) -> Dict[str, Any]:
    """Collect device arrays from the two indices into one state dict.

    With allow_delta (and bm25.delta_sync_fraction > 0), a live delta is
    kept/built instead of forcing a full resync; its arrays join the state
    and make_fused_hybrid_query must receive the matching delta_cap/max_df.
    """
    if allow_delta:
        dev, delta = bm25_index._sync_incremental()
    else:
        dev, delta = bm25_index._require_full_sync(), None
    state = {
        "emb": dense_index._emb,
        "size": jnp.int32(len(dense_index)),
        "indptr": dev["indptr"],
        "post_doc": dev["post_doc"],
        "post_w": dev["post_w"],
        "low_ranges": dev["low_ranges"],
        "post_packed": dev["post_packed"],
        "term_row": dev["term_row"],
        "impact": dev["impact"],
        "impact_scale": dev["impact_scale"],
    }
    if "low_blocks" in dev:
        state["low_blocks"] = dev["low_blocks"]
        state["low_row"] = dev["low_row"]
    if delta is not None:
        state.update(
            delta_indptr=delta["indptr"],
            delta_post_doc=delta["post_doc"],
            delta_post_w=delta["post_w"],
            delta_base_docs=jnp.int32(delta["base_docs"]),
        )
    return state
