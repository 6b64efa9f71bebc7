"""Corpus sharding over a device mesh with per-shard top-k merged over ICI.

The reference has no parallelism at all (SURVEY.md §2.3); its only
"distribution" is HTTP calls to two services. Here the corpus embedding
matrix is sharded row-wise across a `jax.sharding.Mesh` axis ("corpus"),
queries are replicated, every chip computes an exact local top-k on its
shard, and the (score, global-id) pairs are merged with an all-gather over
ICI inside one jit/shard_map program. Results are bit-identical to the
single-chip path (tested on a virtual 8-device CPU mesh).

BM25 postings shard the same way: each shard holds the postings of its doc
range (doc ids are global), idf/avgdl are computed from global statistics at
sync, so local scores equal global scores and the same merge applies.
"""

from __future__ import annotations

from functools import partial
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax import shard_map

from rag_uq_tpu.core.mesh import CORPUS_AXIS
from rag_uq_tpu.index.sparse import _next_pow2
from rag_uq_tpu.ops import bm25 as bm25_ops
from rag_uq_tpu.ops.topk import cosine_topk


def shard_corpus_matrix(emb: jax.Array, mesh: Mesh) -> jax.Array:
    """Place a [cap, D] matrix row-sharded over the corpus axis.

    cap must divide evenly by the axis size (pad capacity accordingly).
    """
    return jax.device_put(emb, NamedSharding(mesh, P(CORPUS_AXIS, None)))


def make_sharded_dense_topk(mesh: Mesh, k: int, block: int = 8192):
    """Build a jitted sharded exact top-k: emb sharded, queries replicated."""

    n_shards = mesh.shape[CORPUS_AXIS]

    @jax.jit
    @partial(
        shard_map,
        mesh=mesh,
        in_specs=(P(CORPUS_AXIS, None), P(None, None), P()),
        out_specs=(P(None, None), P(None, None)),
        check_vma=False,
    )
    def sharded_topk(emb_local, queries, size):
        shard_cap = emb_local.shape[0]
        i = jax.lax.axis_index(CORPUS_AXIS)
        local_size = jnp.clip(size - i * shard_cap, 0, shard_cap)
        # A shard holds at most shard_cap docs, so a local top-min(k, cap)
        # suffices for an exact global merge (and cosine_topk requires
        # k <= block <= shard_cap).
        k_local = min(k, shard_cap)
        vals, idx = cosine_topk(
            emb_local, queries, local_size, k_local, min(block, shard_cap)
        )
        idx = jnp.where(idx >= 0, idx + i * shard_cap, -1)
        # Merge per-shard top-k over ICI: all-gather the (score, id) pairs,
        # then every shard selects the global top-k (replicated output).
        all_vals = jax.lax.all_gather(vals, CORPUS_AXIS)  # [S, B, k_local]
        all_idx = jax.lax.all_gather(idx, CORPUS_AXIS)
        bsz = vals.shape[0]
        cat_v = jnp.transpose(all_vals, (1, 0, 2)).reshape(bsz, n_shards * k_local)
        cat_i = jnp.transpose(all_idx, (1, 0, 2)).reshape(bsz, n_shards * k_local)
        k_out = min(k, n_shards * k_local)
        mv, sel = jax.lax.top_k(cat_v, k_out)
        mi = jnp.take_along_axis(cat_i, sel, axis=-1)
        mi = jnp.where(jnp.isneginf(mv), -1, mi)
        if k_out < k:  # pad to the requested width with dead slots
            pad = ((0, 0), (0, k - k_out))
            mv = jnp.pad(mv, pad, constant_values=-jnp.inf)
            mi = jnp.pad(mi, pad, constant_values=-1)
        return mv, mi

    return sharded_topk


def shard_bm25_state(
    state: Dict[str, jax.Array], mesh: Mesh
) -> Dict[str, jax.Array]:
    """Row-shard CSR postings across the corpus axis by doc range.

    Host-side reshard: postings are re-bucketed so shard s holds postings of
    docs in [s*docs_per_shard, (s+1)*docs_per_shard), each shard with its own
    local indptr. Per-posting impacts already bake in GLOBAL idf/avgdl, so
    local scoring is exact.
    """
    n_shards = mesh.shape[CORPUS_AXIS]
    indptr = np.asarray(state["indptr"])
    post_doc = np.asarray(state["post_doc"])
    post_w = np.asarray(state["post_w"])
    vcap = indptr.shape[0] - 1
    n_post = int(indptr[-1])

    # Expand postings to (term, doc, w) triples, bucket by doc shard.
    tids = np.repeat(np.arange(vcap, dtype=np.int32), np.diff(indptr))
    docs = post_doc[:n_post]
    ws = post_w[:n_post]
    # docs-per-shard derived from the dense capacity convention: the caller
    # passes `docs_per_shard` via state["docs_per_shard"].
    dps = int(state["docs_per_shard"])
    shard_of = docs // dps

    max_local = max(
        int(np.max(np.bincount(shard_of, minlength=n_shards))) if n_post else 1, 1
    )
    pcap_local = 1 << (max_local - 1).bit_length()

    local_indptr = np.zeros((n_shards, vcap + 1), dtype=np.int32)
    local_doc = np.zeros((n_shards, pcap_local), dtype=np.int32)
    local_w = np.zeros((n_shards, pcap_local), dtype=np.float32)
    for s in range(n_shards):
        m = shard_of == s
        t_s, d_s, w_s = tids[m], docs[m], ws[m]
        order = np.lexsort((d_s, t_s))
        t_s, d_s, w_s = t_s[order], d_s[order], w_s[order]
        counts = np.bincount(t_s, minlength=vcap)
        np.cumsum(counts, out=local_indptr[s, 1:])
        local_doc[s, : d_s.shape[0]] = d_s - s * dps  # local row positions
        local_w[s, : w_s.shape[0]] = w_s

    sharding = NamedSharding(mesh, P(CORPUS_AXIS, None))
    return {
        "indptr": jax.device_put(jnp.asarray(local_indptr), sharding),
        "post_doc": jax.device_put(jnp.asarray(local_doc), sharding),
        "post_w": jax.device_put(jnp.asarray(local_w), sharding),
        "docs_per_shard": dps,
    }


def shard_bm25_twotier(
    csr: Dict[str, object], mesh: Mesh, shard_cap: int, config
) -> Dict[str, object]:
    """Per-shard TWO-TIER BM25 layout with global statistics (fast sparse).

    The sharded twin of `BM25Index._sync_locked`'s two-tier split
    (index/sparse.py:273-344): each shard holds the postings of its doc
    range re-laid out as (a) a dense [T, shard_cap] per-doc impact matrix
    for high-df terms — scored for the whole shard by one MXU matmul — and
    (b) packed low-tier posting slices. The dense-term set is chosen from
    GLOBAL document frequencies (identical `term_row` on every shard, so it
    ships replicated), and the per-posting impacts already bake in global
    idf/avgdl (host_csr), so per-shard scores equal the single-chip scores
    exactly.

    `csr` is `BM25Index.host_csr()` output. Memory: the impact matrix is
    [T, shard_cap] PER CHIP — the single-chip [T, Ncap] matrix split
    row-range-wise, honoring `impact_budget_bytes` per shard.

    Returns a state dict of device arrays sharded over the corpus axis
    (leading dim = shard) plus static metadata (beam, nonneg, pcap).
    """
    n_shards = mesh.shape[CORPUS_AXIS]
    tid_s = np.asarray(csr["tid"], dtype=np.int64)
    doc_s = np.asarray(csr["doc"], dtype=np.int64)
    w_s = np.asarray(csr["w"], dtype=np.float64)
    df = np.asarray(csr["df"], dtype=np.int64)
    vsize = df.shape[0]
    vcap = int(_next_pow2(max(vsize, 1), floor=1024))
    n_post = tid_s.shape[0]

    # Global dense-term selection under the per-shard memory budget.
    thresh = config.dense_tier_threshold
    itemsize = (
        2 if config.impact_dtype == "bfloat16"
        else np.dtype(config.impact_dtype).itemsize
    )
    max_rows = min(
        config.max_dense_tier_rows,
        max(config.impact_budget_bytes // max(shard_cap * itemsize, 1), 8),
    )
    if vsize and int((df > thresh).sum()) > max_rows:
        thresh = int(np.partition(df, -max_rows - 1)[-max_rows - 1])
    dense_terms = np.nonzero(df > thresh)[0]
    t_dense = dense_terms.shape[0]
    tcap = int(_next_pow2(max(t_dense, 1), floor=8))
    term_row = np.full(vcap, -1, dtype=np.int32)
    term_row[dense_terms] = np.arange(t_dense, dtype=np.int32)
    is_dense_term = np.zeros(vcap, dtype=bool)
    is_dense_term[dense_terms] = True

    shard_of = (doc_s // shard_cap) if n_post else np.zeros(0, np.int64)
    counts = (
        np.bincount(shard_of, minlength=n_shards) if n_post
        else np.zeros(n_shards, np.int64)
    )
    pcap = int(_next_pow2(int(counts.max()) if n_post else 1, floor=1024))

    low_ranges = np.zeros((n_shards, 2, vcap), dtype=np.int32)
    packed = np.zeros((n_shards, 2, pcap), dtype=np.int32)
    impact_scale = np.ones((n_shards, tcap), dtype=np.float32)
    if config.impact_dtype == "int8":
        impact = np.zeros((n_shards, tcap, shard_cap), dtype=np.int8)
    else:
        import ml_dtypes

        impact_np_dtype = (
            ml_dtypes.bfloat16 if config.impact_dtype == "bfloat16"
            else np.dtype(config.impact_dtype)
        )
        impact = np.zeros((n_shards, tcap, shard_cap), dtype=impact_np_dtype)

    for s in range(n_shards):
        m = shard_of == s
        t_l = tid_s[m]
        d_l = doc_s[m] - s * shard_cap  # local row positions
        w_l = w_s[m]
        n_l = t_l.shape[0]
        # Global CSR order is (term asc, doc asc); filtering by doc range
        # preserves it, so the slice layout stays term-contiguous.
        cnt = np.bincount(t_l, minlength=vsize) if n_l else np.zeros(vsize, np.int64)
        iptr = np.zeros(vsize + 1, dtype=np.int64)
        np.cumsum(cnt, out=iptr[1:])
        low_start = np.full(vcap, n_l, dtype=np.int32)
        low_end = np.full(vcap, n_l, dtype=np.int32)
        low_start[:vsize] = iptr[:-1]
        low_end[:vsize] = iptr[1:]
        low_end[is_dense_term] = low_start[is_dense_term]
        low_ranges[s, 0] = low_start
        low_ranges[s, 1] = low_end

        packed[s, 0, :n_l] = d_l.astype(np.int32)
        packed[s, 1, :n_l] = w_l.astype(np.float32).view(np.int32)

        rows_of = term_row[t_l] if n_l else np.zeros(0, np.int32)
        mm = rows_of >= 0
        rows_m, docs_m, w_m = rows_of[mm], d_l[mm], w_l[mm]
        if config.impact_dtype == "int8":
            row_max = np.zeros(tcap, dtype=np.float64)
            if rows_m.size:
                np.maximum.at(row_max, rows_m, np.abs(w_m))
            impact_scale[s] = np.maximum(row_max / 127.0, 1e-12).astype(np.float32)
            impact[s, rows_m, docs_m] = np.clip(
                np.rint(w_m / impact_scale[s][rows_m]), -127, 127
            ).astype(np.int8)
        else:
            impact[s, rows_m, docs_m] = w_m.astype(impact.dtype)

    row3 = NamedSharding(mesh, P(CORPUS_AXIS, None, None))
    row2 = NamedSharding(mesh, P(CORPUS_AXIS, None))
    rep = NamedSharding(mesh, P(None))
    return {
        "low_ranges": jax.device_put(jnp.asarray(low_ranges), row3),
        "post_packed": jax.device_put(jnp.asarray(packed), row3),
        "term_row": jax.device_put(jnp.asarray(term_row), rep),
        "impact": jax.device_put(jnp.asarray(impact), row3),
        "impact_scale": jax.device_put(jnp.asarray(impact_scale), row2),
        "beam": int(_next_pow2(max(thresh, 1), floor=8)),
        "nonneg": bool(w_s.min() >= 0) if n_post else True,
        "pcap": pcap,
        "tcap": tcap,
    }


def make_fused_sharded_query(
    mesh: Mesh,
    shard_cap: int,
    router_module=None,
    router_width: Optional[int] = None,  # router.trained_num_passages
    k: int = 10,
    pool: int = 50,
    beam: int = 128,
    approx_topk: bool = True,
    dense_approx: bool = False,
    sparse_mode: str = "twotier",  # "twotier" | "scatter"
    sparse_recall_target: float = 0.95,
    lsel: int = 4096,
    nonneg: bool = True,
    delta_cap: int = 0,  # replicated live-ingest delta capacity (0 = none)
    delta_max_df: int = 0,
):
    """ONE-program sharded hybrid query (the multi-chip hot path).

    The sharded twin of `retrieval.fused.make_fused_hybrid_query`: a single
    jit/shard_map program runs, per shard, the dense cosine top-pool on the
    local embedding rows and the two-tier BM25 top-pool on the local impact
    matrix + posting slices; per-shard (score, global-id) pools are merged
    with one all-gather over ICI per pool; the replicated union merge +
    fusion (router or reference fixed fusion) + final top-k reuse the exact
    single-chip tail (`fuse_pools_select`). No host hops between the pools
    and the fusion — versus the previous three-program path
    (ShardedHybridIndex.search_batch r1) this removes two device round-trips
    and lets XLA overlap the dense matmul with the sparse gather work.

    Returns fn(state, q_vecs, qterms[, router_vars]) -> (scores [B,k],
    global positions [B,k]). `state` combines `shard_corpus_matrix` output
    ("emb"), `shard_bm25_twotier` output, and "size" (total docs, int32).
    """
    if sparse_mode not in ("twotier", "scatter"):
        raise ValueError(f"unknown sparse_mode {sparse_mode!r}")

    from rag_uq_tpu.retrieval.fused import fuse_pools_select

    n_shards = mesh.shape[CORPUS_AXIS]
    k_local = min(pool, shard_cap)

    state_specs = {
        "emb": P(CORPUS_AXIS, None),
        "low_ranges": P(CORPUS_AXIS, None, None),
        "post_packed": P(CORPUS_AXIS, None, None),
        "term_row": P(None),
        "impact": P(CORPUS_AXIS, None, None),
        "impact_scale": P(CORPUS_AXIS, None),
        "size": P(),
    }
    if delta_cap > 0:
        # Streaming-ingest delta: small and REPLICATED — every chip scores
        # the recent docs exhaustively (cheap) and merges them into its
        # pools; only the big base layout is sharded. Mirrors the
        # single-chip main+delta design (retrieval/fused.py:158-175).
        state_specs.update(
            delta_emb=P(None, None),
            delta_indptr=P(None),
            delta_post_doc=P(None),
            delta_post_w=P(None),
            delta_size=P(),
            delta_base_docs=P(),
        )

    def _gather_merge_pool(vals, idx, dead_to):
        """all_gather per-shard (score, id) pools, select the global top-pool."""
        all_vals = jax.lax.all_gather(vals, CORPUS_AXIS)  # [S, B, k_local]
        all_idx = jax.lax.all_gather(idx, CORPUS_AXIS)
        bsz = vals.shape[0]
        cat_v = jnp.transpose(all_vals, (1, 0, 2)).reshape(bsz, n_shards * k_local)
        cat_i = jnp.transpose(all_idx, (1, 0, 2)).reshape(bsz, n_shards * k_local)
        k_out = min(pool, n_shards * k_local)
        mv, sel = jax.lax.top_k(cat_v, k_out)
        mi = jnp.take_along_axis(cat_i, sel, axis=-1)
        dead = jnp.isneginf(mv)
        mv = jnp.where(dead, dead_to, mv)
        mi = jnp.where(dead, -1, mi)
        return mv, mi

    def _body(state, q_vecs, qterms, router_vars):
        qtids = qterms["qtids"]
        i = jax.lax.axis_index(CORPUS_AXIS)
        local_size = jnp.clip(state["size"] - i * shard_cap, 0, shard_cap)

        # Dense pool: one [B, shard_cap] matmul + local top-k.
        from rag_uq_tpu.ops.topk import cosine_topk_single

        dvals, didx = cosine_topk_single(
            state["emb"], q_vecs, local_size, k_local, approx=dense_approx
        )
        didx = jnp.where(didx >= 0, didx + i * shard_cap, -1)
        dvals = jnp.where(didx >= 0, dvals, -jnp.inf)

        # Sparse pool: local two-tier/scatter BM25 on the shard layout.
        if sparse_mode == "scatter":
            bvals, bidx = bm25_ops.topk_lowscatter(
                state["low_ranges"][0], state["post_packed"][0],
                state["term_row"], state["impact"][0],
                qtids, k_local, beam=beam, approx=approx_topk,
                impact_scale=state["impact_scale"][0],
                recall_target=sparse_recall_target,
            )
        else:
            bvals, bidx = bm25_ops.topk_twotier(
                state["low_ranges"][0], state["post_packed"][0],
                state["term_row"], state["impact"][0],
                qtids, k_local, beam=beam, approx=approx_topk,
                lsel=lsel if approx_topk else 0,
                impact_scale=state["impact_scale"][0],
                nonneg=nonneg,
            )
        # Positive-scores-only contract, applied before the shard merge so
        # dead local slots never outrank live docs from other shards.
        blive = (bvals > 0.0) & (bidx >= 0)
        bvals = jnp.where(blive, bvals, -jnp.inf)
        bidx = jnp.where(blive, bidx + i * shard_cap, -1)

        dvals, didx = _gather_merge_pool(dvals, didx, 0.0)
        bvals, bidx = _gather_merge_pool(bvals, bidx, 0.0)

        if delta_cap > 0:
            k_delta = min(pool, delta_cap)
            # Dense delta: one small replicated matmul + local top-k.
            dv2, di2 = cosine_topk_single(
                state["delta_emb"], q_vecs, state["delta_size"], k_delta
            )
            di2 = jnp.where(di2 >= 0, di2 + state["delta_base_docs"], -1)
            dv2 = jnp.where(di2 >= 0, dv2, 0.0)
            cat_v = jnp.concatenate([dvals, dv2], axis=-1)
            cat_i = jnp.concatenate([didx, di2], axis=-1)
            dvals, sel = jax.lax.top_k(cat_v, pool)
            didx = jnp.take_along_axis(cat_i, sel, axis=-1)

            # Sparse delta: exhaustive scatter-add over the small delta CSR.
            dscores = bm25_ops.score_all(
                state["delta_indptr"], state["delta_post_doc"],
                state["delta_post_w"], qterms["qtids_full"],
                delta_cap, delta_max_df,
            )
            bv2, bi2 = bm25_ops.topk_from_scores(dscores, k_delta)
            blive2 = (bv2 > 0.0) & (bi2 >= 0)
            bv2 = jnp.where(blive2, bv2, 0.0)
            bi2 = jnp.where(blive2, bi2 + state["delta_base_docs"], -1)
            cat_v = jnp.concatenate([bvals, bv2], axis=-1)
            cat_i = jnp.concatenate([bidx, bi2], axis=-1)
            bvals, sel = jax.lax.top_k(cat_v, pool)
            bidx = jnp.take_along_axis(cat_i, sel, axis=-1)
            bidx = jnp.where(bvals > 0.0, bidx, -1)
            bvals = jnp.where(bvals > 0.0, bvals, 0.0)

        return fuse_pools_select(
            bvals, bidx, dvals, didx, k,
            router_module=router_module, router_vars=router_vars,
            router_width=router_width,
        )

    if router_module is not None:
        @jax.jit
        @partial(
            shard_map, mesh=mesh,
            in_specs=(state_specs, P(None, None), P(None, None), P()),
            out_specs=(P(None, None), P(None, None)),
            check_vma=False,
        )
        def fused(state, q_vecs, qterms, router_vars):
            return _body(state, q_vecs, qterms, router_vars)
    else:
        @jax.jit
        @partial(
            shard_map, mesh=mesh,
            in_specs=(state_specs, P(None, None), P(None, None)),
            out_specs=(P(None, None), P(None, None)),
            check_vma=False,
        )
        def fused(state, q_vecs, qterms):
            return _body(state, q_vecs, qterms, None)

    return fused


def make_sharded_bm25_topk(mesh: Mesh, k: int, max_df: int, n_docs_cap: int):
    """Sharded exhaustive BM25 top-k with ICI merge (exact)."""

    n_shards = mesh.shape[CORPUS_AXIS]

    @jax.jit
    @partial(
        shard_map,
        mesh=mesh,
        in_specs=(
            P(CORPUS_AXIS, None),
            P(CORPUS_AXIS, None),
            P(CORPUS_AXIS, None),
            P(None, None),
        ),
        out_specs=(P(None, None), P(None, None)),
        check_vma=False,
    )
    def sharded_bm25(indptr_l, post_doc_l, post_w_l, qtids):
        i = jax.lax.axis_index(CORPUS_AXIS)
        dps = n_docs_cap // n_shards
        scores = bm25_ops.score_all(
            indptr_l[0], post_doc_l[0], post_w_l[0], qtids, dps, max_df
        )
        # A shard holds at most dps docs: clamp the local k (exact merge).
        k_local = min(k, dps)
        vals, idx = bm25_ops.topk_from_scores(scores, k_local)
        idx = jnp.where(idx >= 0, idx + i * dps, -1)
        all_vals = jax.lax.all_gather(vals, CORPUS_AXIS)
        all_idx = jax.lax.all_gather(idx, CORPUS_AXIS)
        bsz = vals.shape[0]
        cat_v = jnp.transpose(all_vals, (1, 0, 2)).reshape(bsz, n_shards * k_local)
        cat_i = jnp.transpose(all_idx, (1, 0, 2)).reshape(bsz, n_shards * k_local)
        k_out = min(k, n_shards * k_local)
        mv, sel = jax.lax.top_k(cat_v, k_out)
        mi = jnp.take_along_axis(cat_i, sel, axis=-1)
        dead = mv <= 0.0
        mv = jnp.where(dead, 0.0, mv)
        mi = jnp.where(dead, -1, mi)
        if k_out < k:
            pad = ((0, 0), (0, k - k_out))
            mv = jnp.pad(mv, pad)
            mi = jnp.pad(mi, pad, constant_values=-1)
        return mv, mi

    return sharded_bm25
