"""Clean-room numpy reference implementations used as test oracles.

`bm25_okapi_scores` replicates the published Okapi BM25 formula as implemented
by the `rank_bm25.BM25Okapi` package the reference depends on
(streaming_index.py:142,169): idf = ln((N-df+0.5)/(df+0.5)) with
strictly-negative idfs floored at epsilon * mean(idf), score contribution
idf * tf*(k1+1)/(tf + k1*(1-b+b*dl/avgdl)) summed per query token occurrence.
"""

from __future__ import annotations

from collections import Counter
from typing import List, Sequence

import numpy as np


def bm25_okapi_scores(
    corpus_tokens: Sequence[Sequence[str]],
    query_tokens: Sequence[str],
    k1: float = 1.5,
    b: float = 0.75,
    epsilon: float = 0.25,
) -> np.ndarray:
    n = len(corpus_tokens)
    doc_freqs = [Counter(toks) for toks in corpus_tokens]
    doc_len = np.array([len(toks) for toks in corpus_tokens], dtype=np.float64)
    avgdl = doc_len.mean()

    df: Counter = Counter()
    for freqs in doc_freqs:
        for word in freqs:
            df[word] += 1

    idf = {}
    negative = []
    idf_sum = 0.0
    for word, freq in df.items():
        val = np.log(n - freq + 0.5) - np.log(freq + 0.5)
        idf[word] = val
        idf_sum += val
        if val < 0:
            negative.append(word)
    average_idf = idf_sum / len(idf) if idf else 0.0
    for word in negative:
        idf[word] = epsilon * average_idf

    scores = np.zeros(n, dtype=np.float64)
    for q in query_tokens:
        q_freq = np.array(
            [freqs.get(q, 0) for freqs in doc_freqs], dtype=np.float64
        )
        scores += idf.get(q, 0.0) * (
            q_freq * (k1 + 1) / (q_freq + k1 * (1 - b + b * doc_len / avgdl))
        )
    return scores


def make_synthetic_corpus(rng: np.random.Generator, n_docs: int = 60) -> List[str]:
    """Small random word-soup corpus with skewed term frequencies."""
    vocab = [f"w{i}" for i in range(40)] + ["the", "is", "a", "of"]
    probs = np.ones(len(vocab))
    probs[-4:] = 15.0  # stopword-ish skew
    probs /= probs.sum()
    docs = []
    for _ in range(n_docs):
        length = int(rng.integers(5, 40))
        docs.append(" ".join(rng.choice(vocab, size=length, p=probs)))
    return docs
