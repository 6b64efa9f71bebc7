"""Native C++ tokenizer parity and integration tests."""

import numpy as np
import pytest

from rag_uq_tpu.core.types import Document
from rag_uq_tpu.index.sparse import BM25Index

from tests.oracles import make_synthetic_corpus

native = pytest.importorskip("rag_uq_tpu.native")

if not native.is_available():  # pragma: no cover
    pytest.skip("no C++ toolchain", allow_module_level=True)


class TestNativeTokenizer:
    def test_postings_match_python(self):
        texts = ["The quick brown Fox", "the the THE fox", "  spaced\tout\ntokens "]
        nt = native.NativeTokenizer()
        tids, docs, tfs, doc_lens, new_terms = nt.add_documents(texts, 0)
        assert doc_lens.tolist() == [4, 4, 3]
        # Vocabulary in first-appearance order, lowercased.
        assert new_terms[:4] == ["the", "quick", "brown", "fox"]
        # doc 1: the x3, fox x1
        m = docs == 1
        got = dict(zip(tids[m].tolist(), tfs[m].tolist()))
        assert got == {0: 3, 3: 1}

    def test_encode_queries(self):
        nt = native.NativeTokenizer()
        nt.add_documents(["alpha beta gamma"], 0)
        out = nt.encode_queries(["Beta unknown alpha"], max_terms=4)
        assert out.tolist() == [[1, -1, 0, -1]]

    def test_unicode_lowercase(self):
        nt = native.NativeTokenizer()
        _, _, _, _, terms = nt.add_documents(["ÉCOLE Straße"], 0)
        assert terms == ["école", "straße"]

    def test_edge_punctuation_parity(self):
        """Edge-punct strip matches the Python tokenizer byte-for-byte
        (the v2 deviation: sentence-final mentions must match clean query
        tokens; text/tokenize.py docstring)."""
        from rag_uq_tpu.text.tokenize import tokenize

        texts = [
            "The masterpiece remains Guschisshous.",
            "it's a multi-word token -- (really!) ... élève? 'quoted'",
            "1643, then: 2863000.",
        ]
        nt = native.NativeTokenizer()
        _, _, _, doc_lens, terms = nt.add_documents(texts, 0)
        py_tokens = [tokenize(t) for t in texts]
        assert doc_lens.tolist() == [len(t) for t in py_tokens]
        # First-appearance term order equals the Python stream's.
        seen: list = []
        for toks in py_tokens:
            for t in toks:
                if t not in seen:
                    seen.append(t)
        assert terms == seen
        assert "guschisshous" in terms and "guschisshous." not in terms
        assert "it's" in terms and "multi-word" in terms
        # All-punctuation tokens are dropped, not interned as empty.
        assert "" not in terms and "--" not in terms and "..." not in terms

    def test_seed_terms(self):
        nt = native.NativeTokenizer()
        nt.seed_terms(["a", "b"])
        assert nt.vocab_size == 2
        out = nt.encode_queries(["b a c"], 4)
        assert out.tolist() == [[1, 0, -1, -1]]


class TestNativeIndexParity:
    def test_scores_match_python_index(self):
        corpus = make_synthetic_corpus(np.random.default_rng(11), 40)
        docs = [Document(str(i), t) for i, t in enumerate(corpus)]
        py = BM25Index(use_native="never")
        py.add_documents(docs)
        nat = BM25Index(use_native="always")
        nat.add_documents(docs)
        queries = ["w1 w2 the", "w10", "the is a"]
        np.testing.assert_allclose(
            py.score_all_batch(queries), nat.score_all_batch(queries), rtol=1e-6
        )

    def test_incremental_native(self):
        corpus = make_synthetic_corpus(np.random.default_rng(12), 30)
        nat = BM25Index(use_native="always")
        nat.add_documents([Document(str(i), corpus[i]) for i in range(15)])
        nat.add_documents([Document(str(i), corpus[i]) for i in range(15, 30)])
        py = BM25Index(use_native="never")
        py.add_documents([Document(str(i), t) for i, t in enumerate(corpus)])
        np.testing.assert_allclose(
            py.score_all_batch(["w3 w4 the"]),
            nat.score_all_batch(["w3 w4 the"]),
            rtol=1e-6,
        )
