"""Randomized property tests: parity across random corpora/queries/configs."""

import numpy as np
import pytest

from rag_uq_tpu.core.config import BM25Config, DenseIndexConfig
from rag_uq_tpu.core.types import Document
from rag_uq_tpu.index.sparse import BM25Index
from rag_uq_tpu.text.tokenize import tokenize

from tests.oracles import bm25_okapi_scores, make_synthetic_corpus


@pytest.mark.parametrize("seed", [1, 7, 13, 99])
def test_bm25_oracle_parity_random_corpora(seed):
    """Exhaustive device scores == numpy Okapi oracle for random corpora,
    random query mixes (known/unknown/repeated terms), both tokenizers."""
    rng = np.random.default_rng(seed)
    n_docs = int(rng.integers(10, 80))
    corpus = make_synthetic_corpus(rng, n_docs)
    queries = []
    for _ in range(4):
        n_terms = int(rng.integers(1, 9))
        terms = list(rng.choice([f"w{i}" for i in range(40)] + ["the", "zzz"],
                                size=n_terms))
        queries.append(" ".join(terms))

    for use_native in ("never", "auto"):
        idx = BM25Index(use_native=use_native)
        idx.add_documents([Document(str(i), t) for i, t in enumerate(corpus)])
        got = idx.score_all_batch(queries)
        for qi, q in enumerate(queries):
            want = bm25_okapi_scores([tokenize(t) for t in corpus], tokenize(q))
            np.testing.assert_allclose(got[qi], want, rtol=1e-4, atol=1e-5,
                                       err_msg=f"seed={seed} q={q!r}")


@pytest.mark.parametrize("seed", [3, 21])
def test_twotier_matches_exhaustive_random(seed):
    """Fast path (exact config) == exhaustive top-k on random corpora."""
    rng = np.random.default_rng(seed)
    corpus = make_synthetic_corpus(rng, int(rng.integers(30, 120)))
    idx = BM25Index(config=BM25Config(impact_dtype="float32",
                                      dense_tier_threshold=int(rng.integers(2, 32))))
    idx.add_documents([Document(str(i), t) for i, t in enumerate(corpus)])
    queries = ["w1 w2 the", "the is a w9 w9", "w30 w31 w32"]
    ev, ei = idx.search_batch(queries, top_k=7, exact=True)
    fv, fi = idx.search_batch(queries, top_k=7, exact=False)
    live = ev > 1e-6
    np.testing.assert_allclose(fv[live], ev[live], rtol=1e-4)
    np.testing.assert_array_equal(fi[live], ei[live])


def test_unicode_documents_no_crash():
    """Unicode corpora index and search without error on both tokenizers.

    Known boundary: the native tokenizer splits on ASCII whitespace only, so
    exotic Unicode spaces (e.g. \\u00a0) tokenize differently from Python's
    str.split(); both paths must still behave, and the Python path is the
    parity authority for such corpora.
    """
    docs = [
        Document("1", "École straße naïve 北京 МОСКВА"),
        Document("2", "word joined normal words"),
        Document("3", "emoji 🙂 content"),
    ]
    for use_native in ("never", "auto"):
        idx = BM25Index(use_native=use_native)
        idx.add_documents(docs)
        hits = idx.search("école", top_k=3)
        assert hits and hits[0][0] == "1"
        idx.search("北京")
        idx.search("🙂")


def test_hybrid_randomized_consistency(rng):
    """Batched fused search returns valid, deduped, sorted results across
    random corpora."""
    from rag_uq_tpu.embed.hash_embed import NgramHashEmbedder
    from rag_uq_tpu.retrieval.hybrid import HybridRetriever

    corpus = make_synthetic_corpus(rng, 45)
    r = HybridRetriever(
        embedder=NgramHashEmbedder(dim=32, buckets=1024),
        dense_config=DenseIndexConfig(embedding_dim=32, initial_capacity=64,
                                      score_block=64),
    )
    r.add_documents([Document(str(i), t) for i, t in enumerate(corpus)])
    queries = ["w1 the", "w2 w3 w4", "zzz unknown", ""]
    vals, pos = r.hybrid_search_batch(queries, top_k=8, approx=False)
    assert vals.shape == pos.shape == (4, 8)
    for b in range(4):
        live = pos[b][pos[b] >= 0]
        assert len(live) == len(set(live.tolist()))  # dedup
        assert (np.diff(vals[b]) <= 1e-6).all()  # sorted desc
        assert (live < len(corpus)).all()
