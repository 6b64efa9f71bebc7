"""BM25 parity tests: device CSR scoring vs the numpy Okapi oracle."""

import numpy as np
import pytest

from rag_uq_tpu.core.types import Document
from rag_uq_tpu.index.sparse import BM25Index
from rag_uq_tpu.text.tokenize import tokenize

from tests.oracles import bm25_okapi_scores, make_synthetic_corpus


@pytest.fixture(scope="module")
def corpus():
    rng = np.random.default_rng(42)
    return make_synthetic_corpus(rng, n_docs=60)


@pytest.fixture(scope="module")
def index(corpus):
    idx = BM25Index()
    idx.add_documents([Document(id=str(i), text=t) for i, t in enumerate(corpus)])
    return idx


QUERIES = [
    "w1 w2 the",
    "w10",
    "the is a",  # stopword-heavy (negative raw idf -> epsilon floor)
    "w5 w5 w5",  # repeated query terms
    "unknownterm w3",
    "",
]


class TestScoreAllParity:
    @pytest.mark.parametrize("query", QUERIES)
    def test_matches_okapi_oracle(self, corpus, index, query):
        got = index.score_all_batch([query])[0]
        want = bm25_okapi_scores(
            [tokenize(t) for t in corpus], tokenize(query)
        )
        np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)

    def test_batch_consistency(self, index):
        batched = index.score_all_batch(QUERIES[:3])
        for i, q in enumerate(QUERIES[:3]):
            single = index.score_all_batch([q])[0]
            np.testing.assert_allclose(batched[i], single, rtol=1e-6)


class TestSearch:
    def test_top1_is_argmax(self, corpus, index):
        scores = index.score_all_batch(["w1 w2"])[0]
        results = index.search("w1 w2", top_k=1)
        if scores.max() > 0:
            assert results[0][0] == str(int(np.argmax(scores)))
            assert results[0][1] == pytest.approx(float(scores.max()), rel=1e-5)

    def test_positive_scores_only(self, index):
        results = index.search("unknownterm", top_k=5)
        assert results == []

    def test_empty_index(self):
        idx = BM25Index()
        assert idx.search("anything") == []

    def test_twotier_matches_exact(self, corpus, index):
        queries = ["w1 w2 the", "w10 w3", "the is", "w5 w5 unknownterm"]
        exact_v, exact_i = index.search_batch(queries, top_k=5, exact=True)
        fast_v, fast_i = index.search_batch(queries, top_k=5, exact=False)
        live = exact_v > 0
        np.testing.assert_allclose(fast_v[live], exact_v[live], rtol=2e-2)
        np.testing.assert_array_equal(fast_i[live], exact_i[live])

    def test_twotier_row_cap_raises_threshold_stays_exact(self, corpus):
        """Capping the dense tier reroutes terms to a wider low-tier beam
        without changing results."""
        from rag_uq_tpu.core.config import BM25Config

        idx = BM25Index(config=BM25Config(
            impact_dtype="float32", dense_tier_threshold=2,
            max_dense_tier_rows=4,
        ))
        idx.add_documents([Document(str(i), t) for i, t in enumerate(corpus)])
        dev = idx._sync()
        assert dev["impact"].shape[0] <= 8  # <= next_pow2(4) rows
        queries = ["w1 w2 the", "the is a"]
        exact_v, exact_i = idx.search_batch(queries, top_k=5, exact=True)
        fast_v, fast_i = idx.search_batch(queries, top_k=5, exact=False)
        live = exact_v > 0
        np.testing.assert_allclose(fast_v[live], exact_v[live], rtol=1e-5)
        np.testing.assert_array_equal(fast_i[live], exact_i[live])

    def test_twotier_exact_with_f32_impacts(self, corpus):
        from rag_uq_tpu.core.config import BM25Config

        idx = BM25Index(config=BM25Config(impact_dtype="float32",
                                          dense_tier_threshold=8))
        idx.add_documents([Document(str(i), t) for i, t in enumerate(corpus)])
        queries = ["w1 w2 the", "the is a", "w10"]
        exact_v, exact_i = idx.search_batch(queries, top_k=5, exact=True)
        fast_v, fast_i = idx.search_batch(queries, top_k=5, exact=False)
        live = exact_v > 0
        np.testing.assert_allclose(fast_v[live], exact_v[live], rtol=1e-5)
        np.testing.assert_array_equal(fast_i[live], exact_i[live])

    def test_score_positions_exact(self, corpus, index):
        query = "w1 w2 the"
        all_scores = index.score_all_batch([query])[0]
        positions = np.array([[0, 5, 17, -1]], dtype=np.int32)
        got = index.score_positions_batch([query], positions)[0]
        np.testing.assert_allclose(got[:3], all_scores[[0, 5, 17]], rtol=1e-4)
        assert got[3] == 0.0


class TestIncremental:
    def test_incremental_equals_bulk(self, corpus):
        bulk = BM25Index()
        bulk.add_documents([Document(str(i), t) for i, t in enumerate(corpus)])
        inc = BM25Index()
        for start in range(0, len(corpus), 7):
            inc.add_documents(
                [
                    Document(str(i), corpus[i])
                    for i in range(start, min(start + 7, len(corpus)))
                ]
            )
        q = ["w1 w2 the is"]
        np.testing.assert_allclose(
            bulk.score_all_batch(q), inc.score_all_batch(q), rtol=1e-6
        )

    def test_dedup_by_id(self, corpus):
        idx = BM25Index()
        docs = [Document(str(i), corpus[i]) for i in range(5)]
        assert idx.add_documents(docs) == 5
        assert idx.add_documents(docs) == 0
        assert len(idx) == 5


class TestPersistence:
    def test_save_load_roundtrip(self, corpus, tmp_path):
        path = str(tmp_path / "bm25.json")
        idx = BM25Index(persist_path=path)
        idx.add_documents([Document(str(i), corpus[i]) for i in range(20)])
        scores_before = idx.score_all_batch(["w1 the"])

        idx2 = BM25Index(persist_path=path)
        assert len(idx2) == 20
        np.testing.assert_allclose(
            idx2.score_all_batch(["w1 the"]), scores_before, rtol=1e-6
        )

    def test_tokenizer_version_guard(self, corpus, tmp_path, caplog):
        """Loading an index persisted under an older tokenizer RAISES by
        default (queries would tokenize differently from the saved
        vocabulary — a correctness problem, advisor r4); the explicit
        allow_tokenizer_mismatch flag downgrades it to a warning."""
        import json
        import logging

        from rag_uq_tpu.core.config import BM25Config

        path = str(tmp_path / "bm25.json")
        idx = BM25Index(persist_path=path)
        idx.add_documents([Document(str(i), corpus[i]) for i in range(5)])
        meta = json.loads((tmp_path / "bm25.json").read_text())
        meta["tokenizer"] = "v1-bare-split"
        (tmp_path / "bm25.json").write_text(json.dumps(meta))
        import pytest

        with pytest.raises(ValueError, match="tokenizer"):
            BM25Index(persist_path=path)
        with caplog.at_level(logging.WARNING):
            idx2 = BM25Index(
                persist_path=path,
                config=BM25Config(allow_tokenizer_mismatch=True),
            )
        assert len(idx2) == 5
        assert any("tokenizer" in r.message for r in caplog.records)


class TestLselTruncation:
    def test_lsel_branch_bounded_error(self, corpus, index):
        """The opt-in lsel truncation returns valid positions and scores
        bounded above by the exact totals (dropped candidates may only lose
        score, never gain)."""
        from rag_uq_tpu.ops import bm25 as bm25_ops

        dev = index._sync()
        queries = ["w1 w2 the is a", "the is w3 w4 w5"]
        qtids = index.encode_queries(queries)
        import jax.numpy as jnp

        full_v, full_i = bm25_ops.topk_twotier(
            dev["low_ranges"], dev["post_packed"], dev["term_row"],
            dev["impact"], jnp.asarray(qtids), 5, beam=dev["beam"],
        )
        trunc_v, trunc_i = bm25_ops.topk_twotier(
            dev["low_ranges"], dev["post_packed"], dev["term_row"],
            dev["impact"], jnp.asarray(qtids), 5, beam=dev["beam"],
            lsel=8,  # force the truncation branch (Lq*beam > 8)
        )
        full_v, full_i = np.asarray(full_v), np.asarray(full_i)
        trunc_v, trunc_i = np.asarray(trunc_v), np.asarray(trunc_i)
        # Positions valid; scores never exceed the exact score of that doc.
        exact_all = index.score_all_batch(queries)
        for b in range(trunc_i.shape[0]):
            for v, p in zip(trunc_v[b], trunc_i[b]):
                if p >= 0:
                    assert v <= exact_all[b, p] + 1e-3
        # The top-1 (largest total) survives truncation with lsel=8 here.
        assert trunc_i[0, 0] == full_i[0, 0]

    def test_exact_path_has_no_truncation(self, index):
        """Default lsel=0: results identical regardless of pool width."""
        v1, i1 = index.search_batch(["w1 w2 the is"], top_k=5, exact=False)
        # approx=False is the default; ensure deterministic across calls
        v2, i2 = index.search_batch(["w1 w2 the is"], top_k=5, exact=False)
        np.testing.assert_array_equal(i1, i2)


class TestInt8Impacts:
    def test_int8_close_to_exact(self, corpus):
        from rag_uq_tpu.core.config import BM25Config

        idx = BM25Index(config=BM25Config(impact_dtype="int8",
                                          dense_tier_threshold=8))
        idx.add_documents([Document(str(i), t) for i, t in enumerate(corpus)])
        queries = ["w1 w2 the", "the is a", "w10 w3"]
        exact_v, exact_i = idx.search_batch(queries, top_k=5, exact=True)
        fast_v, fast_i = idx.search_batch(queries, top_k=5, exact=False)
        live = exact_v > 0.05
        # 8-bit per-term quantization: scores within ~1% of row max.
        np.testing.assert_allclose(fast_v[live], exact_v[live], rtol=3e-2)
        agree = np.mean(fast_i[live] == exact_i[live])
        assert agree > 0.9


class TestNegativeImpactCorpus:
    def test_twotier_exact_with_negative_weights(self):
        """Degenerate corpus (avg idf < 0 -> negative epsilon-floored
        weights): the two-tier op must fall back to the scatter path and
        still match the exhaustive oracle."""
        from rag_uq_tpu.core.config import BM25Config

        # Vocabulary dominated by all-doc terms -> average idf < 0 -> the
        # rank_bm25 epsilon floor assigns NEGATIVE weights.
        shared = " ".join(f"c{j}" for j in range(10))
        docs = [
            Document(str(i), f"{shared} tag{i % 3}") for i in range(12)
        ]
        idx = BM25Index(config=BM25Config(impact_dtype="float32",
                                          dense_tier_threshold=2))
        idx.add_documents(docs)
        dev = idx._sync()
        assert not dev["nonneg"]  # the degenerate regime is detected
        queries = ["c1 c2 tag0", "c3 c4 c5", "tag2 c0"]
        ev, ei = idx.search_batch(queries, top_k=3, exact=True)
        fv, fi = idx.search_batch(queries, top_k=3, exact=False)
        live = ev > 0
        np.testing.assert_allclose(fv[live], ev[live], rtol=1e-5)
        np.testing.assert_array_equal(fi[live], ei[live])


class TestLowScatter:
    """topk_lowscatter: the scatter-add two-tier variant must be exact
    (approx=False) against the exhaustive oracle for every impact regime."""

    def _check(self, idx, queries, k=5):
        import jax.numpy as jnp

        from rag_uq_tpu.ops import bm25 as bm25_ops

        dev = idx._sync()
        qtids = jnp.asarray(idx.encode_queries(queries))
        ncap = dev["impact"].shape[1]
        ex = bm25_ops.score_all(
            dev["indptr"], dev["post_doc"], dev["post_w"], qtids, ncap,
            dev["max_df"],
        )
        ev, ei = bm25_ops.topk_from_scores(ex, k)
        fv, fi = bm25_ops.topk_lowscatter(
            dev["low_ranges"], dev["post_packed"], dev["term_row"],
            dev["impact"], qtids, k, beam=dev["beam"], approx=False,
            impact_scale=dev["impact_scale"],
        )
        ev, ei = np.asarray(ev), np.asarray(ei)
        fv, fi = np.asarray(fv), np.asarray(fi)
        live = ev > 0
        np.testing.assert_allclose(fv[live], ev[live], rtol=1e-5)
        np.testing.assert_array_equal(fi[live], ei[live])

    def test_exact_f32(self, corpus):
        from rag_uq_tpu.core.config import BM25Config

        idx = BM25Index(config=BM25Config(impact_dtype="float32",
                                          dense_tier_threshold=8))
        idx.add_documents([Document(str(i), t) for i, t in enumerate(corpus)])
        self._check(idx, ["w1 w2 the", "the is a", "w10", "w5 w5 w5",
                          "unknownterm w3"])

    def test_exact_with_negative_weights(self):
        """Unlike topk_twotier, no containment argument is needed: the
        scatter accumulates signed weights directly, so the op is exact for
        degenerate (negative-impact) corpora without any fallback."""
        from rag_uq_tpu.core.config import BM25Config

        shared = " ".join(f"c{j}" for j in range(10))
        docs = [Document(str(i), f"{shared} tag{i % 3}") for i in range(12)]
        idx = BM25Index(config=BM25Config(impact_dtype="float32",
                                          dense_tier_threshold=2))
        idx.add_documents(docs)
        assert not idx._sync()["nonneg"]
        self._check(idx, ["c1 c2 tag0", "c3 c4 c5", "tag2 c0"], k=3)

    def test_int8_close_to_exact(self, corpus):
        from rag_uq_tpu.core.config import BM25Config

        import jax.numpy as jnp

        from rag_uq_tpu.ops import bm25 as bm25_ops

        idx = BM25Index(config=BM25Config(impact_dtype="int8",
                                          dense_tier_threshold=8))
        idx.add_documents([Document(str(i), t) for i, t in enumerate(corpus)])
        dev = idx._sync()
        qtids = jnp.asarray(idx.encode_queries(["w1 w2 the", "w10 w3"]))
        ex = bm25_ops.score_all(dev["indptr"], dev["post_doc"], dev["post_w"],
                                qtids, dev["impact"].shape[1], dev["max_df"])
        ev, _ = bm25_ops.topk_from_scores(ex, 5)
        fv, _ = bm25_ops.topk_lowscatter(
            dev["low_ranges"], dev["post_packed"], dev["term_row"],
            dev["impact"], qtids, 5, beam=dev["beam"], approx=False,
            impact_scale=dev["impact_scale"],
        )
        live = np.asarray(ev) > 0.05
        np.testing.assert_allclose(np.asarray(fv)[live], np.asarray(ev)[live],
                                   rtol=3e-2)

    def test_row_cap_wide_beam(self, corpus):
        from rag_uq_tpu.core.config import BM25Config

        idx = BM25Index(config=BM25Config(impact_dtype="float32",
                                          dense_tier_threshold=2,
                                          max_dense_tier_rows=4))
        idx.add_documents([Document(str(i), t) for i, t in enumerate(corpus)])
        self._check(idx, ["w1 w2 the", "the is a"])


class TestDeltaSync:
    def _make(self, corpus, frac):
        from rag_uq_tpu.core.config import BM25Config

        idx = BM25Index(config=BM25Config(delta_sync_fraction=frac,
                                          impact_dtype="float32",
                                          dense_tier_threshold=8))
        idx.add_documents([Document(str(i), corpus[i]) for i in range(40)])
        idx.search_batch(["w1"], top_k=3, exact=False)  # base sync
        return idx

    def test_delta_serves_without_full_resync(self, corpus):
        idx = self._make(corpus, frac=0.5)
        base_docs = idx._base["docs"]
        idx.add_documents([Document(str(i), corpus[i]) for i in range(40, 50)])
        v, i = idx.search_batch(["w1 w2 the"], top_k=10, exact=False)
        assert idx._delta_device is not None  # delta path used
        assert idx._base["docs"] == base_docs  # base untouched
        # New docs are reachable through the delta.
        all_pos = set(i[i >= 0].tolist())
        # Results approximately match the full rebuild (idf staleness only).
        full = BM25Index()
        full.add_documents([Document(str(n), corpus[n]) for n in range(50)])
        fv, fi = full.search_batch(["w1 w2 the"], top_k=10, exact=False)
        overlap = len(all_pos & set(fi[fi >= 0].tolist())) / max(
            (fi >= 0).sum(), 1
        )
        assert overlap >= 0.8

    def test_new_delta_terms_are_searchable(self, corpus):
        idx = self._make(corpus, frac=0.5)
        idx.add_documents([Document("new1", "zzznovel qqqterm w1")])
        v, i = idx.search_batch(["zzznovel"], top_k=3, exact=False)
        live = i[0][i[0] >= 0]
        assert 40 in live.tolist()  # the new doc (position 40) is found

    def test_fraction_exceeded_triggers_full_sync(self, corpus):
        idx = self._make(corpus, frac=0.1)
        idx.add_documents(
            [Document(str(i), corpus[i % len(corpus)] + f" x{i}")
             for i in range(40, 60)]
        )  # +50% > 10%
        idx.search_batch(["w1"], top_k=3, exact=False)
        assert idx._delta_device is None  # full resync happened
        assert idx._base["docs"] == 60

    def test_delta_staleness_is_frozen_stats_exactly(self, corpus):
        # Property (VERDICT r1 #8): the delta path's ONLY approximation is
        # frozen statistics. Delta-doc scores must bit-match a numpy oracle
        # that scores the delta docs with the BASE corpus's idf/avgdl, and
        # base-doc scores must be untouched by the delta ingest.
        idx = self._make(corpus, frac=0.5)
        base_v, base_i = idx.search_batch(["w1 w2 the"], top_k=40, exact=False)
        delta_texts = ["w1 w2 zznew", "the w3 w3 w3", "w2 w2 of is"]
        idx.add_documents(
            [Document(f"d{i}", t) for i, t in enumerate(delta_texts)]
        )
        v, i = idx.search_batch(["w1 w2 the"], top_k=43, exact=False)
        assert idx._delta_device is not None
        scores = {int(p): float(s) for s, p in zip(v[0], i[0]) if p >= 0}
        # Base docs: identical scores to the pre-delta search.
        base_scores = {
            int(p): float(s) for s, p in zip(base_v[0], base_i[0]) if p >= 0
        }
        for p, s in base_scores.items():
            assert abs(scores.get(p, 0.0) - s) < 1e-5, (p, s, scores.get(p))
        # Delta docs: frozen-stats oracle (base corpus tokens define
        # idf/avgdl; delta docs only contribute tf/dl terms).
        base_tokens = [corpus[i].split() for i in range(40)]
        doc_len = np.array([len(t) for t in base_tokens], dtype=np.float64)
        avgdl = doc_len.mean()
        n = len(base_tokens)
        import collections

        df = collections.Counter()
        for t in base_tokens:
            for w in set(t):
                df[w] += 1
        idf = {}
        neg = []
        for w, d in df.items():
            idf[w] = np.log(n - d + 0.5) - np.log(d + 0.5)
            if idf[w] < 0:
                neg.append(w)
        avg_idf = sum(idf.values()) / len(idf)
        for w in neg:
            idf[w] = 0.25 * avg_idf
        for j, text in enumerate(delta_texts):
            toks = text.split()
            tf = collections.Counter(toks)
            dl = len(toks)
            expect = 0.0
            for q in "w1 w2 the".split():
                f = tf.get(q, 0)
                expect += idf.get(q, 0.0) * f * 2.5 / (
                    f + 1.5 * (1 - 0.75 + 0.75 * dl / avgdl)
                )
            got = scores.get(40 + j, 0.0)
            assert abs(got - expect) < 1e-4, (j, got, expect)
        # And the drift vs a full resync is small at this delta fraction:
        # ranking overlap of top-10 >= 0.8 (idf staleness only).
        full = BM25Index()
        full.add_documents([Document(str(i), corpus[i]) for i in range(40)])
        full.add_documents(
            [Document(f"d{i}", t) for i, t in enumerate(delta_texts)]
        )
        fv, fi = full.search_batch(["w1 w2 the"], top_k=10, exact=True)
        dv, di = v[0][:10], i[0][:10]
        overlap = len(set(di[di >= 0].tolist()) & set(fi[fi >= 0].tolist()))
        assert overlap >= 8

    def test_delta_vocab_grows_past_base_capacity(self):
        # Regression (ADVICE r1): the delta indptr was sized by the BASE
        # vocab pow2 capacity; delta docs adding terms past that boundary
        # raised a broadcast ValueError inside _sync_incremental. Build a
        # base whose vocab exactly fills its 1024-slot capacity, then push
        # past it via delta ingest.
        from rag_uq_tpu.core.config import BM25Config

        idx = BM25Index(config=BM25Config(delta_sync_fraction=0.5,
                                          impact_dtype="float32",
                                          dense_tier_threshold=8))
        idx.add_documents([
            Document(str(i), " ".join(f"t{i}x{j}" for j in range(32)))
            for i in range(32)
        ])
        idx.search_batch(["t0x0"], top_k=3, exact=False)  # base sync
        assert len(idx.vocab) == 1024  # vocab exactly at the pow2 capacity
        idx.add_documents([Document("new", "zzzfresh t0x0")])
        v, i = idx.search_batch(["zzzfresh"], top_k=3, exact=False)
        assert idx._delta_device is not None  # served via the delta path
        assert 32 in i[0][i[0] >= 0].tolist()  # the new doc is found

    def test_exact_path_forces_full_sync(self, corpus):
        idx = self._make(corpus, frac=0.5)
        idx.add_documents([Document("n1", "w1 w2 fresh")])
        idx.search_batch(["w1"], top_k=3, exact=False)
        assert idx._delta_device is not None
        ev, ei = idx.search_batch(["w1"], top_k=3, exact=True)
        assert idx._delta_device is None  # collapsed into the base
        # exact now matches a from-scratch index bit-for-bit
        full = BM25Index()
        full.add_documents([Document(str(i), corpus[i]) for i in range(40)])
        full.add_documents([Document("n1", "w1 w2 fresh")])
        fv, fi = full.search_batch(["w1"], top_k=3, exact=True)
        np.testing.assert_allclose(ev, fv, rtol=1e-6)
        np.testing.assert_array_equal(ei, fi)


class TestActiveCompaction:
    """Batch-active-term compaction of the high-tier matmul
    (ops/bm25.topk_lowscatter active_rows/rows_compact; encode_for_fused
    emits them). Same math over the same nonzero terms — results must match
    the uncompacted op."""

    def test_compact_matches_full(self, corpus):
        import jax.numpy as jnp

        from rag_uq_tpu.core.config import BM25Config
        from rag_uq_tpu.ops import bm25 as bm25_ops
        from rag_uq_tpu.retrieval.fused import encode_for_fused

        idx = BM25Index(config=BM25Config(impact_dtype="float32",
                                          dense_tier_threshold=4))
        idx.add_documents([Document(str(i), t) for i, t in enumerate(corpus)])
        dev = idx._sync()
        queries = ["w1 w2 the", "the is a", "w10", "w5 w5 w5",
                   "unknownterm w3"]
        qterms = encode_for_fused(idx, queries, active_compaction=True)
        assert "active_rows" in qterms and "rows_compact" in qterms
        # Active list covers exactly the dense-tier rows the batch touches.
        rows_c = np.asarray(qterms["rows_compact"])
        n_active = int((rows_c.max() + 1)) if (rows_c >= 0).any() else 0
        assert n_active <= qterms["active_rows"].shape[0]

        full_v, full_i = bm25_ops.topk_lowscatter(
            dev["low_ranges"], dev["post_packed"], dev["term_row"],
            dev["impact"], qterms["qtids_base"], 5, beam=dev["beam"],
            approx=False, impact_scale=dev["impact_scale"],
        )
        comp_v, comp_i = bm25_ops.topk_lowscatter(
            dev["low_ranges"], dev["post_packed"], dev["term_row"],
            dev["impact"], qterms["qtids_base"], 5, beam=dev["beam"],
            approx=False, impact_scale=dev["impact_scale"],
            active_rows=qterms["active_rows"],
            rows_compact=qterms["rows_compact"],
        )
        np.testing.assert_allclose(
            np.asarray(comp_v), np.asarray(full_v), rtol=1e-6, atol=1e-6
        )
        np.testing.assert_array_equal(np.asarray(comp_i), np.asarray(full_i))

    def test_fused_batch_path_uses_compaction_and_stays_exact(self, corpus):
        from rag_uq_tpu.core.config import BM25Config
        from rag_uq_tpu.retrieval.hybrid import HybridRetriever

        r = HybridRetriever(bm25_config=BM25Config(
            impact_dtype="float32", dense_tier_threshold=4))
        r.add_documents([Document(str(i), t) for i, t in enumerate(corpus)])
        queries = ["w1 w2", "the w10"]
        sv, sp = r.hybrid_search_batch(queries, top_k=5, approx=False,
                                       sparse_mode="scatter")
        tv, tp = r.hybrid_search_batch(queries, top_k=5, approx=False,
                                       sparse_mode="twotier")
        np.testing.assert_allclose(sv, tv, rtol=1e-5, atol=1e-6)
        np.testing.assert_array_equal(sp, tp)


class TestLowBlockBudgetPow2:
    def test_budget_caps_actual_pow2_allocation(self):
        from rag_uq_tpu.core.config import BM25Config

        """Regression (round-3 review): the low-block byte-budget gate
        checked (n_low+1) rows while allocating next_pow2(n_low+1) rows, so
        the device array could be nearly 2x the knob. The gate now budgets
        the pow2-grown allocation. 16 low-tier terms -> 17 raw rows (8704 B
        at beam 64) but lcap=32 rows (16384 B); a 10 kB budget must refuse
        the layout."""
        words = [f"term{i}" for i in range(16)]
        docs = [Document(str(i), " ".join(words[i % 16] for _ in range(3)))
                for i in range(20)]
        lo = BM25Index(config=BM25Config(
            impact_dtype="float32", low_block_budget_bytes=10_000,
        ))
        lo.add_documents(docs)
        assert "low_blocks" not in lo._sync(), (
            "pow2-grown allocation exceeds the byte budget"
        )
        hi = BM25Index(config=BM25Config(
            impact_dtype="float32", low_block_budget_bytes=20_000,
        ))
        hi.add_documents(docs)
        dev = hi._sync()
        assert "low_blocks" in dev
        blk = dev["low_blocks"]
        assert blk.shape[0] * 2 * blk.shape[2] * 4 <= 20_000
