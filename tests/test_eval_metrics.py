"""Metric oracles — hand-computed expectations mirroring the reference's
test_eval_protocol.py coverage, plus extra edge cases."""

import numpy as np
import pytest

from rag_uq_tpu.eval import metrics as M
from rag_uq_tpu.eval.evaluator import RAGEvaluator


class TestRetrievalMetrics:
    def test_recall_at_k(self):
        assert M.recall_at_k(["a", "b", "c", "d"], ["a", "x"], 4) == 0.5
        assert M.recall_at_k(["a", "x", "c"], ["a", "x"], 2) == 1.0
        assert M.recall_at_k(["a"], [], 1) == 0.0

    def test_precision_at_k(self):
        assert M.precision_at_k(["a", "b", "c", "d"], ["a", "b"], 4) == 0.5
        assert M.precision_at_k(["a", "b"], ["a", "b"], 2) == 1.0
        assert M.precision_at_k(["a"], ["a"], 0) == 0.0

    def test_mrr(self):
        assert M.reciprocal_rank(["a", "b"], ["a"]) == 1.0
        assert M.reciprocal_rank(["x", "y", "a"], ["a"]) == pytest.approx(1 / 3)
        assert M.reciprocal_rank(["x", "y"], ["a"]) == 0.0

    def test_ndcg_perfect(self):
        rels = {"a": 3.0, "b": 2.0, "c": 1.0}
        assert M.ndcg_at_k(["a", "b", "c"], rels, 10) == pytest.approx(1.0)

    def test_ndcg_inverted_lower(self):
        rels = {"a": 3.0, "b": 2.0, "c": 1.0}
        perfect = M.ndcg_at_k(["a", "b", "c"], rels, 10)
        inverted = M.ndcg_at_k(["c", "b", "a"], rels, 10)
        assert inverted < perfect

    def test_evaluate_retrieval_aggregation(self):
        metrics = M.evaluate_retrieval(
            retrieved_ids=[["a", "b"], ["x", "y"]],
            gold_ids=[["a"], ["y"]],
            k_values=[1, 2],
        )
        assert metrics.recall_at_k[1] == pytest.approx(0.5)
        assert metrics.recall_at_k[2] == pytest.approx(1.0)
        assert metrics.mrr == pytest.approx((1.0 + 0.5) / 2)

    def test_router_accuracy(self):
        metrics = M.evaluate_retrieval(
            [["a"]], [["a"]],
            router_decisions=[1, 0, 1, 1],
            oracle_decisions=[1, 0, 0, 1],
        )
        assert metrics.router_accuracy == pytest.approx(0.75)

    def test_router_accuracy_excludes_ties(self):
        # Oracle -1 = both arms rank gold identically: not a routing
        # decision, excluded from the denominator.
        metrics = M.evaluate_retrieval(
            [["a"]], [["a"]],
            router_decisions=[1, 0, 1, 1],
            oracle_decisions=[-1, -1, 1, 0],
        )
        assert metrics.router_accuracy == pytest.approx(0.5)
        all_ties = M.evaluate_retrieval(
            [["a"]], [["a"]],
            router_decisions=[1, 0],
            oracle_decisions=[-1, -1],
        )
        assert all_ties.router_accuracy is None


class TestGenerationMetrics:
    def test_normalization(self):
        assert M.normalize_answer("  The, Answer!  ") == "the answer"

    def test_exact_match(self):
        assert M.exact_match("Paris.", "paris") == 1.0
        assert M.exact_match("Paris", "London") == 0.0

    def test_token_f1_partial(self):
        f1 = M.token_f1("the red apple", "red apple pie")
        # common = {red, apple}; p = 2/3, r = 2/3
        assert f1 == pytest.approx(2 / 3)

    def test_token_f1_empty(self):
        assert M.token_f1("", "answer") == 0.0
        assert M.token_f1("answer", "") == 0.0

    def test_rouge_l_bounds(self):
        assert M.rouge_l("exact answer", "exact answer") == pytest.approx(1.0)
        assert M.rouge_l("zebra quantum", "apple pie") == 0.0

    def test_correctness_rule(self):
        labels = M.correctness_labels(
            ["paris", "totally wrong", "the red apple indeed"],
            ["Paris", "london", "red apple"],
        )
        assert labels == [1, 0, 1]


class TestCalibrationMetrics:
    def test_perfectly_calibrated_bins(self):
        rng = np.random.default_rng(0)
        conf = rng.uniform(0.05, 0.95, size=5000)
        correct = (rng.uniform(size=5000) < conf).astype(float)
        metrics = M.evaluate_calibration(conf, correct)
        assert metrics.ece < 0.05

    def test_overconfident_high_ece(self):
        conf = np.full(100, 0.95)
        correct = np.zeros(100)
        metrics = M.evaluate_calibration(conf, correct)
        assert metrics.ece > 0.5
        assert metrics.mce > 0.5

    def test_brier_extremes(self):
        assert M.brier_score(np.ones(10), np.ones(10)) == 0.0
        assert M.brier_score(np.ones(10), np.zeros(10)) == 1.0

    def test_bin_bookkeeping(self):
        metrics = M.evaluate_calibration([0.05, 0.95], [0, 1], 10)
        assert len(metrics.bin_counts) == 10
        assert sum(metrics.bin_counts) == 2


class TestEfficiencyMetrics:
    def test_latency_and_qps(self):
        metrics = M.evaluate_efficiency([0.1, 0.1, 0.1, 0.1])
        assert metrics.avg_latency_ms == pytest.approx(100.0)
        assert metrics.throughput_qps == pytest.approx(10.0)
        assert metrics.p50_latency_ms == pytest.approx(100.0)

    def test_component_times(self):
        metrics = M.evaluate_efficiency(
            [0.2], router_times=[0.01], retrieval_times=[0.05],
            generation_times=[0.1],
        )
        assert metrics.router_overhead_ms == pytest.approx(10.0)
        assert metrics.retrieval_latency_ms == pytest.approx(50.0)
        assert metrics.generation_latency_ms == pytest.approx(100.0)


class TestBootstrap:
    def test_ci_contains_point(self, rng):
        data = list(rng.normal(5.0, 1.0, size=200))
        point, lo, hi = M.bootstrap_metric(
            data, lambda s: float(np.mean(s)), n_bootstrap=200, rng=rng
        )
        assert lo <= point <= hi
        assert point == pytest.approx(5.0, abs=0.3)


class TestEvaluatorFacade:
    def test_full_evaluation(self, tmp_path):
        ev = RAGEvaluator(output_dir=str(tmp_path))
        results = ev.run_full_evaluation(
            retrieved_ids=[["a", "b"], ["c"]],
            gold_ids=[["a"], ["x"]],
            predictions=["paris", "wrong"],
            references=["Paris", "london"],
            confidences=[0.9, 0.2],
            latencies=[0.05, 0.07],
            router_weights=[0.3, 0.8],
        )
        assert results["summary"]["n_queries"] == 2
        assert results["generation"]["exact_match"] == pytest.approx(0.5)
        assert (tmp_path / "evaluation_results.json").exists()
        assert (tmp_path / "reliability_diagram.png").exists()
        assert (tmp_path / "routing_analysis.png").exists()
