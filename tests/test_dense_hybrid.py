"""Dense index + hybrid retriever tests: exact top-k vs oracle, fusion parity."""

import numpy as np
import pytest

from rag_uq_tpu.core.types import Document
from rag_uq_tpu.core.config import DenseIndexConfig, EmbedderConfig
from rag_uq_tpu.embed.hash_embed import NgramHashEmbedder, Sha256Embedder
from rag_uq_tpu.index.dense import DenseIndex
from rag_uq_tpu.retrieval.hybrid import HybridRetriever

from tests.oracles import make_synthetic_corpus

import jax.numpy as jnp

from rag_uq_tpu.ops.topk import cosine_topk, merge_topk


SMALL_CFG = DenseIndexConfig(embedding_dim=64, initial_capacity=128, score_block=128)
SMALL_EMB = EmbedderConfig(dim=64, vocab_hash_buckets=4096, max_seq_len=64)


class TestCosineTopK:
    def test_matches_global_topk(self, rng):
        emb = rng.normal(size=(512, 32)).astype(np.float32)
        emb /= np.linalg.norm(emb, axis=1, keepdims=True)
        q = rng.normal(size=(7, 32)).astype(np.float32)
        q /= np.linalg.norm(q, axis=1, keepdims=True)
        size = 400  # live rows only
        vals, idx = cosine_topk(
            jnp.asarray(emb), jnp.asarray(q), jnp.int32(size), 10, block=128
        )
        ref_scores = q @ emb[:size].T
        ref_idx = np.argsort(-ref_scores, axis=1)[:, :10]
        np.testing.assert_array_equal(np.asarray(idx), ref_idx)
        np.testing.assert_allclose(
            np.asarray(vals),
            np.take_along_axis(ref_scores, ref_idx, axis=1),
            rtol=1e-5,
        )

    def test_fewer_live_rows_than_k(self, rng):
        emb = rng.normal(size=(128, 16)).astype(np.float32)
        q = rng.normal(size=(2, 16)).astype(np.float32)
        vals, idx = cosine_topk(
            jnp.asarray(emb), jnp.asarray(q), jnp.int32(3), 8, block=128
        )
        assert (np.asarray(idx)[:, 3:] == -1).all()
        assert np.isneginf(np.asarray(vals)[:, 3:]).all()

    def test_merge_topk(self, rng):
        va = np.array([[3.0, 1.0]]); ia = np.array([[0, 2]], dtype=np.int32)
        vb = np.array([[2.0, 0.5]]); ib = np.array([[5, 7]], dtype=np.int32)
        v, i = merge_topk(jnp.asarray(va), jnp.asarray(ia), jnp.asarray(vb), jnp.asarray(ib), 3)
        np.testing.assert_allclose(np.asarray(v)[0], [3.0, 2.0, 1.0])
        np.testing.assert_array_equal(np.asarray(i)[0], [0, 5, 2])


class TestDenseIndex:
    def test_self_retrieval(self):
        corpus = make_synthetic_corpus(np.random.default_rng(1), 40)
        idx = DenseIndex(
            embedder=NgramHashEmbedder(dim=64, buckets=4096), config=SMALL_CFG
        )
        idx.add_documents([Document(str(i), t) for i, t in enumerate(corpus)])
        # A document's own text should retrieve itself at rank 1.
        hits = idx.search(corpus[7], top_k=3)
        assert hits[0][0] == "7"
        # bf16 storage rounds the unit norm, so self-similarity is ~1 +- 2^-8.
        assert hits[0][1] == pytest.approx(1.0, abs=0.01)

    def test_growth_preserves_content(self):
        emb = Sha256Embedder(dim=64)
        idx = DenseIndex(embedder=emb, config=SMALL_CFG)
        docs = [Document(str(i), f"text number {i}") for i in range(300)]
        idx.add_documents(docs[:50])
        before = idx.search("text number 13", top_k=1)
        idx.add_documents(docs[50:])  # forces capacity growth
        after = idx.search("text number 13", top_k=1)
        assert before[0][0] == after[0][0]
        assert len(idx) == 300

    def test_dedup(self):
        idx = DenseIndex(embedder=Sha256Embedder(dim=64), config=SMALL_CFG)
        docs = [Document("a", "alpha"), Document("b", "beta")]
        assert idx.add_documents(docs) == 2
        assert idx.add_documents(docs) == 0

    def test_save_load(self, tmp_path):
        idx = DenseIndex(
            embedder=Sha256Embedder(dim=64),
            config=SMALL_CFG,
            persist_directory=str(tmp_path),
        )
        idx.add_documents([Document(str(i), f"doc {i}") for i in range(20)])
        idx.save()
        idx2 = DenseIndex(
            embedder=Sha256Embedder(dim=64),
            config=SMALL_CFG,
            persist_directory=str(tmp_path),
        )
        assert len(idx2) == 20
        assert idx2.search("doc 5", 1)[0][0] == idx.search("doc 5", 1)[0][0]

    def test_tokenizer_version_guard(self, tmp_path, caplog):
        """A persisted index built under an older tokenizer RAISES by
        default (a version mismatch is always a correctness problem:
        stored doc vectors bake in build-time tokenization, so mismatched
        query embeddings silently lose recall); the explicit
        allow_tokenizer_mismatch flag downgrades it to a warning."""
        import dataclasses
        import json
        import logging

        idx = DenseIndex(
            embedder=Sha256Embedder(dim=64),
            config=SMALL_CFG,
            persist_directory=str(tmp_path),
        )
        idx.add_documents([Document(str(i), f"doc {i}") for i in range(3)])
        idx.save()
        meta = json.loads((tmp_path / "meta.json").read_text())
        from rag_uq_tpu.text.tokenize import TOKENIZER_VERSION

        assert meta["tokenizer"] == TOKENIZER_VERSION
        meta["tokenizer"] = "v1-bare-split"
        (tmp_path / "meta.json").write_text(json.dumps(meta))
        with pytest.raises(ValueError, match="tokenizer"):
            DenseIndex(
                embedder=Sha256Embedder(dim=64),
                config=SMALL_CFG,
                persist_directory=str(tmp_path),
            )
        with caplog.at_level(logging.WARNING):
            idx2 = DenseIndex(
                embedder=Sha256Embedder(dim=64),
                config=dataclasses.replace(
                    SMALL_CFG, allow_tokenizer_mismatch=True
                ),
                persist_directory=str(tmp_path),
            )
        assert len(idx2) == 3  # still loads under the explicit flag
        assert any("tokenizer" in r.message for r in caplog.records)


class TestHybridRetriever:
    @pytest.fixture(scope="class")
    def retriever(self):
        corpus = make_synthetic_corpus(np.random.default_rng(3), 50)
        r = HybridRetriever(
            embedder=NgramHashEmbedder(dim=64, buckets=4096),
            dense_config=SMALL_CFG,
        )
        r.add_documents([Document(str(i), t) for i, t in enumerate(corpus)])
        return r

    def test_hybrid_search_shape(self, retriever):
        results = retriever.hybrid_search("w1 w2 the", top_k=10)
        assert 0 < len(results) <= 10
        # Sorted by hybrid score descending.
        scores = [r.hybrid_score for r in results]
        assert scores == sorted(scores, reverse=True)
        # Fusion formula: mean of max-normalized columns, all <= 1.
        assert all(0 <= s <= 1.0 + 1e-6 for s in scores)

    def test_union_includes_both_retrievers(self, retriever):
        bm25_top = {d for d, _ in retriever.bm25_search("w1 w2", top_k=5)}
        results = retriever.hybrid_search("w1 w2", top_k=50, retrieval_pool_size=50)
        got = {r.doc_id for r in results}
        assert bm25_top & got  # bm25 hits present in the union pool

    def test_get_scores_for_router_padding(self, retriever):
        # Corpus has 50 docs, so asking for 60 passages forces tail padding.
        bm25, dense, ids, texts = retriever.get_scores_for_router("w1", num_passages=60)
        assert len(bm25) == len(dense) == len(ids) == len(texts) == 60
        # Padded tail.
        assert ids[-1] == "" and bm25[-1] == 0.0

    def test_empty_retriever(self):
        r = HybridRetriever(
            embedder=Sha256Embedder(dim=64), dense_config=SMALL_CFG
        )
        assert r.hybrid_search("anything") == []
        b, d, ids, texts = r.get_scores_for_router_batch(["q1", "q2"], 5)
        assert b.shape == (2, 5) and ids == [[""] * 5] * 2

    def test_balanced_pool_contains_both_tower_tops(self, retriever):
        # pool_order="balanced": each tower's top candidates must survive
        # selection even when fixed fusion would rank them past P, and the
        # kept rows are presented in fixed-fusion order.
        queries = ["w1 w2 the", "w10 w3"]
        P = 6
        b, d, ids, _ = retriever.get_scores_for_router_batch(
            queries, num_passages=P, pool_order="balanced"
        )
        for qi, q in enumerate(queries):
            got = {i for i in ids[qi] if i}
            top_b = [doc for doc, _ in retriever.bm25_search(q, top_k=3)]
            top_d = [doc for doc, _ in retriever.dense_search(q, top_k=3)]
            for doc in top_b + top_d:
                assert doc in got, (q, doc, ids[qi])
            # Presentation order is fused-descending. The per-row max of
            # the returned scores equals the pool max (each tower's top-1
            # is always selected), so the fusion is exactly recomputable.
            live = np.array([bool(i) for i in ids[qi]])
            max_b = max(b[qi][live].max(), 1e-12)
            max_d = max(d[qi][live].max(), 1e-12)
            fused = (b[qi] / max_b + d[qi] / max_d) / 2.0
            fused = fused[live]
            assert np.all(np.diff(fused) <= 1e-9), fused

    def test_batched_router_scores_match_per_query(self, retriever):
        # The batched path must reproduce the per-query protocol: same doc
        # ids (up to fusion-score ties) and same raw scores per doc.
        queries = ["w1 w2 the", "w10 w3", "the of a"]
        b_b, b_d, b_ids, b_texts = retriever.get_scores_for_router_batch(
            queries, num_passages=10
        )
        for qi, q in enumerate(queries):
            s_b, s_d, s_ids, s_texts = retriever.get_scores_for_router(q, 10)
            by_id_batch = {
                i: (b_b[qi][j], b_d[qi][j]) for j, i in enumerate(b_ids[qi]) if i
            }
            by_id_single = {
                i: (s_b[j], s_d[j]) for j, i in enumerate(s_ids) if i
            }
            # Tie order at the pool tail can differ; require >= 80% id
            # overlap and identical scores on the overlap.
            common = set(by_id_batch) & set(by_id_single)
            assert len(common) >= 0.8 * max(len(by_id_single), 1)
            for doc_id in common:
                np.testing.assert_allclose(
                    by_id_batch[doc_id], by_id_single[doc_id], rtol=1e-5,
                    err_msg=f"query {q!r} doc {doc_id}",
                )


class TestWithinBatchDedup:
    def test_duplicate_ids_in_one_batch(self):
        """First occurrence wins when one batch repeats an id (the
        documented dedup-by-id contract)."""
        from rag_uq_tpu.index.sparse import BM25Index

        idx = DenseIndex(embedder=Sha256Embedder(dim=64), config=SMALL_CFG)
        n = idx.add_documents([Document("a", "first text"),
                               Document("a", "second text"),
                               Document("b", "other")])
        assert n == 2
        assert len(idx) == 2
        assert idx.store.get("a").text == "first text"

        bm = BM25Index()
        n = bm.add_documents([Document("a", "alpha words"),
                              Document("a", "beta words"),
                              Document("b", "gamma")])
        assert n == 2 and len(bm) == 2
        assert bm.store.get("a").text == "alpha words"
