"""Hybrid retriever: BM25 + dense with union-pool score fusion.

Behavioral parity with the reference's `HybridRetriever`
(rag_uq/streaming_index.py:376-560): top-`retrieval_pool_size` from each
retriever, union of doc ids with missing scores = 0.0, per-query
max-normalization of each score column, fusion by the mean of the two, and
`get_scores_for_router` returning aligned zero-padded arrays. Both retrievers
run on device; this layer also exposes a fully batched path used by the
benchmark and the sharded multi-chip search.
"""

from __future__ import annotations

import logging
import threading
from typing import Dict, List, Optional, Sequence, Tuple

import jax.numpy as jnp
import numpy as np

from rag_uq_tpu.core.config import BM25Config, DenseIndexConfig, EmbedderConfig
from rag_uq_tpu.core.types import DocStore, Document, RetrievalResult
from rag_uq_tpu.embed.base import Embedder
from rag_uq_tpu.index.dense import DenseIndex
from rag_uq_tpu.index.sparse import BM25Index

logger = logging.getLogger(__name__)


class HybridRetriever:
    """Unified hybrid retrieval combining BM25 and dense search."""

    def __init__(
        self,
        bm25_persist_path: Optional[str] = None,
        dense_persist_directory: Optional[str] = None,
        embedder: Optional[Embedder] = None,
        bm25_config: Optional[BM25Config] = None,
        dense_config: Optional[DenseIndexConfig] = None,
        embedder_config: Optional[EmbedderConfig] = None,
    ):
        self.bm25_index = BM25Index(
            persist_path=bm25_persist_path, config=bm25_config
        )
        self.dense_index = DenseIndex(
            embedder=embedder,
            config=dense_config,
            embedder_config=embedder_config,
            persist_directory=dense_persist_directory,
        )
        # Host-side doc store for text lookup (reference :423). The two
        # indices append in the same order, so row positions coincide.
        self.documents: DocStore = self.dense_index.store
        # Serializes the lazy fused-state rebuild: if a post-ingest rebuild
        # fails, N concurrent searcher threads would otherwise each trigger
        # the resync and concurrently mutate the BM25 host/device buffers
        # (advisor r3, cli/serve.py). Uncontended acquire is ~100 ns —
        # noise next to a device call.
        self._fused_lock = threading.RLock()

    def __len__(self) -> int:
        return len(self.documents)

    def add_documents(
        self, documents: Sequence[Document], batch_size: int = 256
    ) -> Dict[str, int]:
        stats = {
            "bm25_added": self.bm25_index.add_documents(documents),
            "dense_added": self.dense_index.add_documents(documents, batch_size),
        }
        stats["total_documents"] = len(self.documents)
        return stats

    # -- single-method search (parity :451-462) ---------------------------------

    def bm25_search(self, query: str, top_k: int = 20) -> List[Tuple[str, float]]:
        return self.bm25_index.search(query, top_k)

    def dense_search(self, query: str, top_k: int = 20) -> List[Tuple[str, float]]:
        return [
            (doc_id, score) for doc_id, score, _ in self.dense_index.search(query, top_k)
        ]

    # -- batched union pool (device hot path) -----------------------------------

    def pooled_scores_batch(
        self,
        queries: Sequence[str],
        pool_size: int = 50,
        exact_bm25: bool = True,
    ) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
        """Union-pool doc positions + aligned raw scores for a query batch.

        Returns (positions [B, 2*pool], bm25 [B, 2*pool], dense [B, 2*pool]);
        position -1 marks dead slots (deduped or missing), whose scores are 0.
        Missing-in-one-retriever scores are the exact scores computed on the
        union pool (>= the reference's 0.0 placeholder, since ours are exact).
        """
        n = len(self.documents)
        pool = min(pool_size, max(n, 1))
        # Encode once; both the pool searches and the union-pool rescoring
        # reuse the same query vectors/term ids.
        q_vecs = self.dense_index.embed_queries(queries)
        qtids = self.bm25_index.encode_queries(queries)
        b_scores, b_pos = self.bm25_index.search_batch(
            queries, top_k=pool, exact=exact_bm25, qtids=qtids
        )
        d_scores, d_pos = self.dense_index.search_batch(
            queries, top_k=pool, q_vecs=q_vecs
        )

        # Union with on-device dedup (sort-based; duplicates and dead slots
        # become -1). The reference unions per-row Python sets
        # (streaming_index.py:489-499) — O(B*pool) host loops on a 1-core
        # host; here one small device sort covers the whole batch. Score
        # alignment is by doc position, so slot order within a row is free.
        from rag_uq_tpu.retrieval.fused import union_dedup

        cat = np.concatenate([b_pos, d_pos], axis=1)  # [B, 2*pool]
        positions = np.asarray(union_dedup(jnp.asarray(cat, dtype=jnp.int32)))

        bm25 = np.array(
            self.bm25_index.score_positions_batch(queries, positions, qtids=qtids)
        )
        dense = np.array(
            self.dense_index.score_positions_batch(queries, positions, q_vecs=q_vecs)
        )
        dead = positions < 0
        bm25[dead] = 0.0
        dense[dead] = 0.0
        return positions, bm25, dense

    # -- fused batched hot path ---------------------------------------------------

    def _fused_state(self):
        def cache_key(bm25):
            # The monotonic sync generation (not id(dict), which can be
            # reused after GC) detects device-state replacement; _dirty and
            # the sizes detect pending mutations not yet synced.
            return (
                len(self.dense_index),
                bm25._n_postings,
                bm25.sync_generation,
                bm25._dirty,
            )

        # Double-checked locking: the fast path (cache hit) stays lock-free;
        # a needed rebuild is serialized so concurrent searchers can never
        # tear the host/device buffers mid-sync.
        if getattr(self, "_fused_cache_key", None) != cache_key(self.bm25_index):
            with self._fused_lock:
                if getattr(self, "_fused_cache_key", None) != cache_key(
                    self.bm25_index
                ):
                    from rag_uq_tpu.retrieval.fused import build_index_state

                    allow_delta = (
                        self.bm25_index.config.delta_sync_fraction > 0
                    )
                    self._fused_state_cache = build_index_state(
                        self.dense_index, self.bm25_index,
                        allow_delta=allow_delta,
                    )
                    # Key recomputed AFTER the build: build_index_state syncs
                    # the index, bumping the generation it should be cached
                    # under.
                    self._fused_cache_key = cache_key(self.bm25_index)
        return self._fused_state_cache

    def hybrid_search_batch(
        self,
        queries: Sequence[str],
        top_k: int = 10,
        retrieval_pool_size: int = 50,
        router=None,
        approx: bool = True,
        sparse_mode: str = "twotier",
    ) -> Tuple[np.ndarray, np.ndarray]:
        """Batched hybrid search through the fused one-program device path.

        Returns (scores [B, k], doc positions [B, k]); -1 marks dead slots.
        Scores are always the max-normalized mean-fusion relevance (one
        consistent <=1 scale per query); under a width-clamped router the
        ROW ORDER follows the deployed gate policy, so scores are ranked by
        policy, not necessarily descending by value.
        `router` is an optional RetrievalRouter whose gate replaces the fixed
        mean-of-max-normalized fusion. `approx=False` uses exact top-k on
        every branch (slower; bit-comparable to `hybrid_search`).
        `sparse_mode="scatter"` selects the faster scatter-add BM25 pool op
        (see make_fused_hybrid_query).
        """
        from rag_uq_tpu.retrieval.fused import (
            encode_for_fused,
            make_fused_hybrid_query,
        )

        state = self._fused_state()
        dev = self.bm25_index._device
        beam, nonneg = dev["beam"], dev["nonneg"]
        delta = self.bm25_index._delta_device
        delta_cap = delta["n_docs_cap"] if delta is not None else 0
        delta_max_df = delta["max_df"] if delta is not None else 0
        pool = min(retrieval_pool_size, max(len(self.documents), 1))
        # Cache the jitted program per static configuration: a fresh closure
        # per call would retrace/recompile every request.
        lsel = self.bm25_index.config.lsel
        # Clamp the gate to its trained pool width (deployed-policy parity
        # with the eval protocol's _router_order; review r4).
        router_width = (
            getattr(router, "trained_num_passages", None)
            if router is not None else None
        )
        key = (
            min(top_k, 2 * pool), pool, beam, approx, nonneg,
            delta_cap, delta_max_df, sparse_mode, lsel,
            id(router.module) if router is not None else None,
            router_width,
        )
        if not hasattr(self, "_fused_fns"):
            self._fused_fns = {}
        fused = self._fused_fns.get(key)
        if fused is None:
            fused = make_fused_hybrid_query(
                router_module=router.module if router is not None else None,
                router_width=router_width,
                k=min(top_k, 2 * pool),
                pool=pool,
                beam=beam,
                approx_topk=approx,
                dense_mode="single",
                nonneg=nonneg,
                delta_cap=delta_cap,
                delta_max_df=delta_max_df,
                sparse_mode=sparse_mode,
                lsel=lsel,
            )
            self._fused_fns[key] = fused
        q_vecs = self.dense_index.embed_queries(queries)
        qterms = encode_for_fused(
            self.bm25_index, queries,
            active_compaction=(sparse_mode == "scatter"),
        )
        router_vars = (
            {"params": router.params, "stats": router.stats}
            if router is not None
            else None
        )
        vals, pos = fused(state, q_vecs, qterms, router_vars)
        return np.asarray(vals), np.asarray(pos)

    # -- hybrid search (parity :464-523) -----------------------------------------

    def hybrid_search(
        self,
        query: str,
        top_k: int = 10,
        retrieval_pool_size: int = 50,
    ) -> List[RetrievalResult]:
        """Union pool -> max-normalize each column -> rank by mean score."""
        if len(self.documents) == 0:
            return []
        positions, bm25, dense = self.pooled_scores_batch(
            [query], pool_size=retrieval_pool_size
        )
        positions, bm25, dense = positions[0], bm25[0], dense[0]
        live = positions >= 0
        if not live.any():
            return []
        # Guard against non-positive column maxima (possible here because we
        # compute exact union-pool scores, unlike the reference's 0.0 fill):
        # dividing by a negative max would invert the ranking.
        max_bm25 = max(float(bm25[live].max()), 1e-12)
        max_dense = max(float(dense[live].max()), 1e-12)

        results = []
        for pos, bs, ds in zip(positions[live], bm25[live], dense[live]):
            doc = self.documents.document_at(int(pos))
            results.append(
                RetrievalResult(
                    doc_id=doc.id,
                    text=doc.text,
                    bm25_score=float(bs),
                    dense_score=float(ds),
                    hybrid_score=float(bs / max_bm25 + ds / max_dense) / 2,
                    title=doc.title,
                    metadata=doc.metadata,
                )
            )
        results.sort(key=lambda r: r.hybrid_score or 0, reverse=True)
        return results[:top_k]

    def get_scores_for_router(
        self, query: str, num_passages: int = 20
    ) -> Tuple[List[float], List[float], List[str], List[str]]:
        """Aligned zero-padded score arrays for the router (parity :525-557)."""
        results = self.hybrid_search(query, top_k=num_passages)
        bm25_scores = [r.bm25_score for r in results]
        dense_scores = [r.dense_score for r in results]
        doc_ids = [r.doc_id for r in results]
        texts = [r.text for r in results]
        while len(bm25_scores) < num_passages:
            bm25_scores.append(0.0)
            dense_scores.append(0.0)
            doc_ids.append("")
            texts.append("")
        return bm25_scores, dense_scores, doc_ids, texts

    def get_scores_for_router_batch(
        self,
        queries: Sequence[str],
        num_passages: int = 20,
        retrieval_pool_size: int = 50,
        pool_order: str = "fused",
    ) -> Tuple[np.ndarray, np.ndarray, List[List[str]], List[List[str]]]:
        """Batched get_scores_for_router: one device program batch for the
        whole query list instead of a Python loop of single-query searches
        (the reference's per-query protocol, streaming_index.py:525-557,
        kept semantically: per-query union pool, fixed fusion ranking, the
        top `num_passages` rows returned with raw scores, zero-padded).

        `pool_order` controls which `num_passages` union-pool members are
        kept when the pool is wider than the output:

        - "fused" (default, reference parity): the head of the fixed
          mean-fusion ranking (streaming_index.py:510-521). When one tower's
          scores are uninformative noise (e.g. BM25 on alias queries whose
          terms occur in no document), max-normalization still scales that
          noise to O(1), and fusing it can push the other tower's true top
          candidates past position P — the router never sees them.
        - "balanced": keep each candidate by its BEST single-tower rank
          (min of bm25-rank and dense-rank; fused score breaks ties), so
          both towers' top ~P/2 always survive selection, then present the
          kept rows in fixed-fusion order. Fixed fusion over this pool is
          unchanged in formula (its head is still the first rows); a learned
          router gets the candidates it needs to beat fixed fusion.

        Returns (bm25 [B, P], dense [B, P], doc_ids [B][P], texts [B][P]).
        """
        if len(self.documents) == 0 or not queries:
            bsz = len(queries)
            empty = np.zeros((bsz, num_passages), dtype=np.float64)
            pads = [[""] * num_passages for _ in range(bsz)]
            return empty, empty.copy(), pads, [r[:] for r in pads]
        positions, bm25, dense = self.pooled_scores_batch(
            list(queries), pool_size=retrieval_pool_size
        )
        live = positions >= 0
        # Reference fixed fusion over the union pool (hybrid_search :510-521)
        # with the same non-positive-max guard as hybrid_search above.
        max_b = np.maximum(np.where(live, bm25, -np.inf).max(axis=1), 1e-12)
        max_d = np.maximum(np.where(live, dense, -np.inf).max(axis=1), 1e-12)
        fused = (bm25 / max_b[:, None] + dense / max_d[:, None]) / 2.0
        fused = np.where(live, fused, -np.inf)
        if pool_order == "balanced":
            big = bm25.shape[1] + 1
            rank_b = np.argsort(
                np.argsort(-np.where(live, bm25, -np.inf), axis=1), axis=1
            )
            rank_d = np.argsort(
                np.argsort(-np.where(live, dense, -np.inf), axis=1), axis=1
            )
            min_rank = np.where(live, np.minimum(rank_b, rank_d), big)
            # Primary: best single-tower rank; secondary: fused score.
            sel = np.lexsort((-fused, min_rank), axis=1)[:, :num_passages]
            # Present the kept candidates in fixed-fusion order.
            sel_fused = np.take_along_axis(fused, sel, axis=1)
            order = np.take_along_axis(
                sel, np.argsort(-sel_fused, axis=1), axis=1
            )
        else:
            order = np.argsort(-fused, axis=1)[:, :num_passages]

        sel_pos = np.take_along_axis(positions, order, axis=1)
        sel_b = np.take_along_axis(bm25, order, axis=1)
        sel_d = np.take_along_axis(dense, order, axis=1)
        dead = sel_pos < 0
        sel_b = np.where(dead, 0.0, sel_b)
        sel_d = np.where(dead, 0.0, sel_d)
        pad = num_passages - sel_pos.shape[1]
        if pad > 0:
            sel_pos = np.pad(sel_pos, ((0, 0), (0, pad)), constant_values=-1)
            sel_b = np.pad(sel_b, ((0, 0), (0, pad)))
            sel_d = np.pad(sel_d, ((0, 0), (0, pad)))
        store = self.documents
        doc_ids = [
            [store.ids[int(p)] if p >= 0 else "" for p in row] for row in sel_pos
        ]
        texts = [
            [store.texts[int(p)] if p >= 0 else "" for p in row]
            for row in sel_pos
        ]
        return sel_b, sel_d, doc_ids, texts
