"""UQ tests: MC sampling confidence, conformal prediction, hybrid composition.

Mirrors the reference's test coverage (tests/test_confidence.py) with the
MockLLM double and tmpdir SQLite isolation, plus on-device quantile checks.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from rag_uq_tpu.llm.mock import MockLLM
from rag_uq_tpu.uq.conformal import (
    ConformalRAG,
    conformal_p_value_device,
    conformal_threshold_device,
)
from rag_uq_tpu.uq.hybrid import HybridConfidence
from rag_uq_tpu.uq.mc import MCDropoutConfidence


@pytest.fixture
def db_path(tmp_path):
    return str(tmp_path / "cal.db")


class TestMCDropout:
    def test_parameter_ranges(self):
        mc = MCDropoutConfidence(MockLLM(), n_samples=5, seed=0)
        for _ in range(20):
            p = mc._sample_parameters()
            assert 0.5 <= p["temperature"] <= 1.2
            assert 0.8 <= p["top_p"] <= 0.95

    def test_consistent_answers_high_confidence(self):
        llm = MockLLM(["Paris is the capital."])
        mc = MCDropoutConfidence(llm, n_samples=10, seed=0)
        result = mc.get_confidence_interval("Answer.", "ctx", "capital?")
        assert len(result.answers) == 10
        assert result.consensus_answer == "Paris is the capital."
        assert result.embedding_variance == pytest.approx(0.0, abs=1e-5)
        assert result.confidence == pytest.approx(1.0, abs=1e-3)

    def test_diverse_answers_lower_confidence(self):
        consistent = MCDropoutConfidence(
            MockLLM(["same answer"]), n_samples=8, seed=0
        ).get_confidence_interval("p", "c", "q")
        diverse = MCDropoutConfidence(
            MockLLM(["alpha beta", "gamma delta", "epsilon zeta", "eta theta"]),
            n_samples=8, seed=0,
        ).get_confidence_interval("p", "c", "q")
        assert diverse.confidence < consistent.confidence
        assert diverse.consensus_answer in diverse.answers

    def test_lexical_diversity_ordering(self):
        mc = MCDropoutConfidence(MockLLM(), n_samples=2, seed=0)
        low = mc._compute_lexical_diversity(["a a a a", "a a a a"])
        high = mc._compute_lexical_diversity(["a b c d", "e f g h"])
        assert high > low

    def test_empty_answers_graceful(self):
        result = MCDropoutConfidence(
            MockLLM([""]), n_samples=3, seed=0
        ).get_confidence_interval("p", "c", "q")
        assert result.consensus_answer == ""
        assert result.confidence == 0.0
        assert result.uncertainty_score == 1.0

    def test_batched_generation_used(self):
        llm = MockLLM(["x"])
        MCDropoutConfidence(llm, n_samples=7, seed=0).get_confidence_interval(
            "p", "c", "q"
        )
        assert llm.call_count == 7  # MockLLM counts per-sample in the batch


class TestConformal:
    def test_rouge_l_extremes(self, db_path):
        conf = ConformalRAG(MockLLM(), calibration_db_path=db_path)
        assert conf.rouge_l("exact match", "exact match") == pytest.approx(1.0)
        assert conf.rouge_l("zebra", "apple") == 0.0
        assert 0 < conf.rouge_l("partial match here", "partial overlap here") < 1

    def test_calibrate_writes_scores(self, db_path):
        conf = ConformalRAG(MockLLM(["Paris."]), calibration_db_path=db_path)
        stats = conf.calibrate(["q1", "q2"], ["c1", "c2"], ["Paris.", "London"])
        assert stats["new_calibrated"] == 2
        assert len(conf.calibration_scores) == 2
        # Exact match -> nonconformity 0; mismatch -> 1.
        assert min(conf.calibration_scores) == pytest.approx(0.0)
        assert max(conf.calibration_scores) == pytest.approx(1.0)

    def test_skip_existing_resume(self, db_path):
        conf = ConformalRAG(MockLLM(["a"]), calibration_db_path=db_path)
        conf.calibrate(["q"], ["c"], ["a"])
        stats = conf.calibrate(["q"], ["c"], ["a"])
        assert stats["skipped"] == 1
        assert stats["new_calibrated"] == 0

    def test_threshold_finite_sample_quantile(self, db_path):
        conf = ConformalRAG(MockLLM(), calibration_db_path=db_path, alpha=0.1)
        scores = np.linspace(0, 1, 100)
        conf.calibration_scores = scores.tolist()
        conf._scores_device = jnp.asarray(scores.astype(np.float32))
        # q_level = ceil(101*0.9)/100 = 0.91
        expected = np.quantile(scores, 0.91)
        assert conf.get_conformal_threshold() == pytest.approx(expected, abs=1e-5)

    def test_device_p_value(self):
        scores = jnp.asarray(np.linspace(0, 1, 99).astype(np.float32))
        # estimated = 0.5 -> 50 of 99 scores >= 0.5 -> p = 51/100
        p = float(conformal_p_value_device(scores, jnp.float32(0.5)))
        assert p == pytest.approx(0.51, abs=0.011)

    def test_predict_with_coverage_invariants(self, db_path):
        llm = MockLLM(["short answer here"])
        conf = ConformalRAG(llm, calibration_db_path=db_path, alpha=0.1)
        conf.calibrate([f"q{i}" for i in range(20)], ["ctx"] * 20, ["short answer here"] * 20)
        result = conf.predict_with_coverage("q new", "some context words " * 5)
        assert 0 <= result.p_value <= 1
        assert 0 <= result.confidence <= 1
        assert isinstance(result.is_reliable, bool)
        assert result.coverage_alpha == 0.1
        assert result.metadata["calibration_size"] == 20

    def test_no_calibration_fallback(self, db_path):
        result = ConformalRAG(
            MockLLM(["x"]), calibration_db_path=db_path
        ).predict_with_coverage("q", "c")
        assert result.p_value == 0.5
        assert not result.is_reliable

    def test_stats(self, db_path):
        conf = ConformalRAG(MockLLM(["a"]), calibration_db_path=db_path)
        assert conf.get_calibration_stats() == {"empty": True}
        conf.calibrate(["q1", "q2"], ["c1", "c2"], ["a", "b"])
        stats = conf.get_calibration_stats()
        assert stats["count"] == 2
        assert "threshold" in stats and "median" in stats

    def test_coverage_guarantee_empirical(self, db_path):
        """Split conformal coverage on synthetic exchangeable scores:
        empirical coverage must be >= 1 - alpha (up to sampling noise)."""
        rng = np.random.default_rng(0)
        cal = rng.uniform(size=500).astype(np.float32)
        test = rng.uniform(size=2000)
        conf = ConformalRAG(MockLLM(), calibration_db_path=db_path, alpha=0.1)
        conf.calibration_scores = cal.tolist()
        conf._scores_device = jnp.asarray(cal)
        thresh = conf.get_conformal_threshold()
        coverage = float(np.mean(test <= thresh))
        assert coverage >= 0.9 - 0.02


class TestMCBatch:
    def test_batch_matches_per_example_semantics(self):
        class EchoLLM:
            def generate_batch(self, prompts, t, p, max_tokens=100, seed=None):
                return [f"ans {pr.count('Question')}" for pr in prompts]

        mc = MCDropoutConfidence(EchoLLM(), n_samples=4, seed=0)
        qs = ["q1?", "q2?", "q3?"]
        ctxs = ["c1", "c2", "c3"]
        batch = mc.get_confidence_batch("Answer.", ctxs, qs)
        assert len(batch) == 3
        singles = [
            MCDropoutConfidence(EchoLLM(), n_samples=4, seed=0)
            .get_confidence_interval("Answer.", c, q)
            for c, q in zip(ctxs, qs)
        ]
        for b, s in zip(batch, singles):
            assert b.consensus_answer == s.consensus_answer
            assert b.confidence == pytest.approx(s.confidence)
            assert b.uncertainty_score == pytest.approx(s.uncertainty_score)

    def test_batch_empty(self):
        mc = MCDropoutConfidence(MockLLM(), n_samples=3)
        assert mc.get_confidence_batch("Answer.", [], []) == []


class _LatentDifficultyLLM:
    """Deterministic fake: per-prompt latent difficulty controls how
    diverse the K sampled answers are. Same prompt -> same behavior, so
    calibration and test examples drawn iid share one score distribution
    (exchangeability for the mc_variance conformal mode).

    Uses a stable string hash, NOT builtin hash(): the per-process hash
    salt made the coverage property test's outcome vary by interpreter
    launch (observed: one salt produced coverage 0.687, a 9-sigma outlier
    under the intended iid sampling — the salt correlated the per-prompt
    difficulty draws). fnv1a_64 pins one realization forever."""

    WORDS = [f"word{i}" for i in range(40)]

    @staticmethod
    def _stable(p: str) -> int:
        from rag_uq_tpu.text.tokenize import fnv1a_64

        return fnv1a_64(p) % (2**32)

    def generate_batch(self, prompts, temperatures, top_ps, max_tokens=100,
                       seed=None):
        outs = []
        for i, p in enumerate(prompts):
            rng = np.random.default_rng(self._stable(p))
            difficulty = rng.uniform()
            vocab = max(1, int(difficulty * 12))
            # Each sample draws a fresh word set; more vocab => more spread.
            idx = np.random.default_rng(
                (self._stable(p) + i + (seed or 0)) % (2**32)
            ).integers(0, vocab, size=3)
            outs.append(" ".join(self.WORDS[j] for j in idx))
        return outs

    def generate(self, prompt, **kw):
        return self.generate_batch([prompt], [0.1], [0.9])[0]


class TestMCVarianceNonconformity:
    def test_rejects_unknown_mode(self, db_path):
        with pytest.raises(ValueError):
            ConformalRAG(MockLLM(), calibration_db_path=db_path,
                         nonconformity_mode="bogus")

    def test_same_score_function_both_phases(self, db_path):
        """In mc_variance mode the calibration score of an example equals
        the inference-time estimate for the same example (one function)."""
        llm = _LatentDifficultyLLM()
        conf = ConformalRAG(llm, calibration_db_path=db_path,
                            nonconformity_mode="mc_variance", n_mc_samples=4)
        q, ctx = "what is word3?", "word3 is a thing among things"
        conf.calibrate([q], [ctx], ["word3"])
        stored = conf.calibration_scores[0]
        res = conf.predict_with_coverage(q, ctx)
        est = res.metadata["estimated_nonconformity"]
        assert stored == pytest.approx(est, abs=1e-6)

    def test_coverage_holds_on_exchangeable_data(self, db_path):
        """Empirical P(p_value > alpha) ~= 1 - alpha when calibration and
        test examples are iid (the guarantee the length-ratio heuristic
        mode cannot give)."""
        llm = _LatentDifficultyLLM()
        conf = ConformalRAG(llm, calibration_db_path=db_path,
                            nonconformity_mode="mc_variance", n_mc_samples=6,
                            alpha=0.1)
        rng = np.random.default_rng(7)

        def example(i):
            words = [f"tok{int(rng.integers(0, 1000))}" for _ in range(6)]
            return f"question about {words[0]} {i}", " ".join(words)

        cal = [example(i) for i in range(60)]
        conf.calibrate([q for q, _ in cal], [c for _, c in cal],
                       ["x"] * len(cal))
        assert len(conf.calibration_scores) == 60

        test = [example(1000 + i) for i in range(150)]
        reliable = [
            conf.predict_with_coverage(q, c).is_reliable for q, c in test
        ]
        coverage = float(np.mean(reliable))
        # Exact finite-sample rate: 1 - floor(alpha*(n+1))/(n+1) = 0.9016
        # at n_cal=60; allow ~3 binomial standard deviations at n_test=150
        # (sd ~ 0.024). Sizes are capped because each predict is a separate
        # device program on the CPU test host (~0.3 s apiece).
        assert 0.82 <= coverage <= 0.975


class TestHybridConfidence:
    def test_composition(self, db_path):
        llm = MockLLM(["Paris.", "It is Paris.", "paris"])
        hybrid = HybridConfidence(
            llm, mc_samples=3, calibration_db_path=db_path
        )
        hybrid.conformal.calibrate(
            [f"q{i}" for i in range(10)], ["c"] * 10, ["Paris."] * 10
        )
        out = hybrid.estimate_uncertainty("Answer.", "Paris is the capital.",
                                          "What is the capital?")
        assert set(out) >= {
            "answer", "answer_source", "combined_confidence",
            "mc_confidence", "conformal_p_value", "is_reliable", "mc_answers",
        }
        assert out["answer_source"] in ("conformal", "mc_consensus")
        assert out["combined_confidence"] == pytest.approx(
            (out["mc_confidence"] + out["conformal_confidence"]) / 2
        )


class TestPlattScaling:
    def test_reduces_ece_on_overconfident_scores(self):
        from rag_uq_tpu.eval.metrics import evaluate_calibration
        from rag_uq_tpu.uq.scaling import apply_platt, fit_platt

        rng = np.random.default_rng(0)
        n = 400
        # Overconfident: raw confidence ~0.95 regardless; true accuracy 0.5
        # but mildly score-correlated so the logistic has signal.
        correct = rng.random(n) < 0.5
        conf = np.clip(0.9 + 0.05 * correct + 0.02 * rng.random(n), 0, 1)
        a, b = fit_platt(conf[:200], correct[:200])
        scaled = apply_platt(conf[200:], a, b)
        raw_ece = evaluate_calibration(conf[200:], correct[200:].astype(int)).ece
        new_ece = evaluate_calibration(scaled, correct[200:].astype(int)).ece
        assert new_ece < raw_ece
        assert new_ece < 0.15

    def test_one_sided_split_is_finite(self):
        from rag_uq_tpu.uq.scaling import apply_platt, fit_platt

        a, b = fit_platt([0.9, 0.8, 0.95], [True, True, True])
        out = apply_platt([0.5, 0.9], a, b)
        assert np.all(np.isfinite(out))
        assert np.all((out >= 0) & (out <= 1))
        a2, b2 = fit_platt([], [])
        assert (a2, b2) == (1.0, 0.0)

    def test_monotone(self):
        from rag_uq_tpu.uq.scaling import apply_platt, fit_platt

        rng = np.random.default_rng(1)
        conf = rng.random(300)
        correct = rng.random(300) < conf  # well-correlated
        a, b = fit_platt(conf, correct)
        xs = np.linspace(0, 1, 11)
        ys = apply_platt(xs, a, b)
        assert np.all(np.diff(ys) >= 0)  # A >= 0: higher conf -> higher p


class TestIsotonicAndLogistic:
    """Round-3 calibrators (uq/scaling.py): PAV isotonic + multi-feature
    logistic."""

    def test_isotonic_monotone_and_interpolates(self):
        from rag_uq_tpu.uq.scaling import apply_isotonic, fit_isotonic

        rng = np.random.default_rng(0)
        s = rng.uniform(0, 1, 400)
        y = rng.uniform(0, 1, 400) < (0.2 + 0.6 * s)  # monotone truth
        xs, gs = fit_isotonic(s, y)
        assert np.all(np.diff(gs) >= -1e-12)  # non-decreasing fit
        out = apply_isotonic([0.0, 0.5, 1.0], xs, gs)
        assert out[0] <= out[1] <= out[2]
        assert np.all((out >= 0) & (out <= 1))

    def test_isotonic_collapses_duplicate_knots(self):
        """Tied input scores must map through ONE fitted value, not an
        arbitrary side of a PAV block boundary (advisor r3)."""
        from rag_uq_tpu.uq.scaling import apply_isotonic, fit_isotonic

        # Score 0.5 appears with both labels so it straddles a block edge.
        s = np.array([0.1, 0.5, 0.5, 0.5, 0.5, 0.9])
        y = np.array([0.0, 0.0, 0.0, 1.0, 1.0, 1.0])
        xs, gs = fit_isotonic(s, y)
        assert len(np.unique(xs)) == len(xs), "duplicate knots survived"
        assert np.all(np.diff(gs) >= -1e-12)  # still monotone
        # The tied score maps to the weight-averaged block value (0.5 here).
        out = apply_isotonic([0.5], xs, gs)
        assert abs(out[0] - 0.5) < 1e-9

    def test_isotonic_recovers_step(self):
        from rag_uq_tpu.uq.scaling import apply_isotonic, fit_isotonic

        s = np.concatenate([np.linspace(0, 0.4, 50), np.linspace(0.6, 1, 50)])
        y = np.concatenate([np.zeros(50), np.ones(50)])
        xs, gs = fit_isotonic(s, y)
        out = apply_isotonic([0.2, 0.8], xs, gs)
        assert out[0] < 0.1 and out[1] > 0.9

    def test_logistic_uses_informative_feature(self):
        from rag_uq_tpu.uq.scaling import apply_logistic, fit_logistic

        rng = np.random.default_rng(1)
        n = 600
        # Feature 0 is noise; feature 1 drives correctness.
        x = np.stack([rng.normal(size=n), rng.normal(size=n)], axis=1)
        y = rng.uniform(size=n) < 1 / (1 + np.exp(-3 * x[:, 1]))
        w = fit_logistic(x[:400], y[:400])
        p = apply_logistic(x[400:], w)
        brier = float(np.mean((p - y[400:]) ** 2))
        # Better than the best constant predictor.
        base = float(np.mean((y[400:].mean() - y[400:]) ** 2))
        assert brier < base - 0.02
        assert abs(w[1]) > abs(w[0])  # informative feature dominates

    def test_logistic_one_sided_labels_finite(self):
        from rag_uq_tpu.uq.scaling import apply_logistic, fit_logistic

        x = np.random.default_rng(2).normal(size=(20, 3))
        w = fit_logistic(x, np.ones(20, dtype=bool))
        p = apply_logistic(x, w)
        assert np.all(np.isfinite(p)) and np.all((p > 0) & (p < 1))


class TestSampleLpFiltering:
    def test_lp_stats_exclude_blank_decodes(self):
        """Regression (round-3 review): sample_lp_mean/spread spanned all K
        raw samples while the text features (agreement_rate, answer_len_*)
        use only non-blank decodes — and a blank decode's 0.0 logprob
        placeholder reads as maximal confidence. The stats now share the
        text features' non-blank subset."""
        import pytest as _pytest

        from rag_uq_tpu.uq.mc import MCDropoutConfidence

        class ScoredBlankLLM:
            # K=4 per query: samples 1 and 3 decode to whitespace with the
            # 0.0 placeholder; the real decodes carry mean logprob -1.0.
            def generate_batch_scored(self, prompts, t, p, max_tokens=100,
                                      seed=None):
                texts, mlp, mnlp = [], [], []
                for i in range(len(prompts)):
                    if i % 4 in (1, 3):
                        texts.append("   "); mlp.append(0.0); mnlp.append(0.0)
                    else:
                        texts.append("ans"); mlp.append(-1.0); mnlp.append(-2.0)
                return texts, mlp, mnlp

            def generate_batch(self, prompts, t, p, max_tokens=100, seed=None):
                return self.generate_batch_scored(
                    prompts, t, p, max_tokens, seed
                )[0]

        mc = MCDropoutConfidence(ScoredBlankLLM(), n_samples=4, seed=0)
        r = mc.get_confidence_batch("Answer:", ["ctx"], ["q"])[0]
        assert r.metadata["sample_lp_mean"] == _pytest.approx(-1.0)
        assert r.metadata["sample_lp_spread"] == _pytest.approx(0.0)
