"""MC-Dropout-style confidence via batched stochastic generation.

Capability parity with the reference's MCDropoutConfidence
(rag_uq/confidence.py:69-272): K stochastic generations with uniformly
sampled temperature in (0.5, 1.2) and top-p in (0.8, 0.95) as the dropout
proxy, uncertainty = std of answer-embedding distances from their centroid,
consensus = answer closest to the centroid (most-common fallback), normalized
uncertainty = min(1, variance/2), plus type-token lexical diversity.

TPU-native difference: the K samples are generated in ONE batched device call
(`generate_batch`, K = batch axis) instead of K serial HTTP requests
(reference :225-231), and answer embeddings come from the in-framework
batched jit embedder instead of a torch MiniLM.
"""

from __future__ import annotations

import logging
from collections import Counter
from dataclasses import dataclass, field
from typing import Any, Dict, List, Optional, Tuple

import numpy as np

from rag_uq_tpu.embed.base import Embedder
from rag_uq_tpu.embed.hash_embed import NgramHashEmbedder

logger = logging.getLogger(__name__)


@dataclass
class ConfidenceResult:
    """Result from confidence estimation (parity: confidence.py:46-55)."""

    answers: List[str]
    consensus_answer: str
    uncertainty_score: float
    confidence: float
    embedding_variance: Optional[float] = None
    lexical_diversity: Optional[float] = None
    metadata: Dict[str, Any] = field(default_factory=dict)


class MCDropoutConfidence:
    """Monte-Carlo sampling confidence for generated answers."""

    def __init__(
        self,
        llm_client,
        n_samples: int = 10,
        embedder: Optional[Embedder] = None,
        temperature_range: Tuple[float, float] = (0.5, 1.2),
        top_p_range: Tuple[float, float] = (0.8, 0.95),
        max_tokens: int = 100,
        seed: Optional[int] = None,
    ):
        self.llm = llm_client
        self.n_samples = n_samples
        self.temperature_range = temperature_range
        self.top_p_range = top_p_range
        self.max_tokens = max_tokens
        self.encoder = embedder or NgramHashEmbedder(dim=384)
        self._rng = np.random.default_rng(seed)

    def _sample_parameters(self) -> Dict[str, float]:
        """Sample generation knobs (parity :124-129)."""
        return {
            "temperature": float(self._rng.uniform(*self.temperature_range)),
            "top_p": float(self._rng.uniform(*self.top_p_range)),
        }

    @staticmethod
    def build_prompt(prompt: str, context: str, question: str) -> str:
        """Prompt template (parity :141-147)."""
        return (
            f"{prompt}\n\nContext: {context}\n\nQuestion: {question}\n\nAnswer:"
        )

    def _compute_lexical_diversity(self, answers: List[str]) -> float:
        """Type-token ratio across answers (parity :164-175)."""
        all_tokens: List[str] = []
        for answer in answers:
            all_tokens.extend(answer.lower().split())
        if not all_tokens:
            return 1.0
        return len(set(all_tokens)) / len(all_tokens)

    def _compute_embedding_variance(
        self, answers: List[str]
    ) -> Tuple[float, np.ndarray, np.ndarray]:
        """Std of embedding distances from centroid (parity :177-202)."""
        valid = [a for a in answers if a.strip()]
        if self.encoder is None or not valid:
            return 1.0, np.array([]), np.array([])
        embeddings = np.asarray(self.encoder.encode(valid))
        centroid = embeddings.mean(axis=0)
        distances = np.linalg.norm(embeddings - centroid, axis=1)
        return float(distances.std()), centroid, embeddings

    def get_confidence_batch(
        self,
        prompt: str,
        contexts: Sequence[str],
        questions: Sequence[str],
    ) -> List["ConfidenceResult"]:
        """MC confidence for a WHOLE example batch in one device program.

        All B examples' K samples go through a single `generate_batch` of
        B*K prompts (grouped per example), versus B separate K-sample
        calls — the per-program dispatch floor dominates at evaluation
        scale on this platform. Per-example math is identical to
        `get_confidence_interval`.
        """
        n = len(questions)
        if n == 0:
            return []
        prompts, temps, tops = [], [], []
        for ctx, q in zip(contexts, questions):
            full = self.build_prompt(prompt, ctx, q)
            for _ in range(self.n_samples):
                p = self._sample_parameters()
                prompts.append(full)
                temps.append(p["temperature"])
                tops.append(p["top_p"])
        # Bound prompts per device program: generation prefill attention
        # materializes [B, heads, L, L], so 256 streams at L=1280 is ~10 GB
        # and OOMs a 16 GB chip. 64 streams (~2.5 GB worst case) keeps the
        # program large enough to amortize dispatch.
        max_prompts = max(self.n_samples, 64 - 64 % self.n_samples)
        scored = hasattr(self.llm, "generate_batch_scored")
        raw: List[str] = []
        lps: List[float] = []
        for s in range(0, len(prompts), max_prompts):
            seed = int(self._rng.integers(0, 2**31 - 1))
            if scored:
                txts, mean_lp, _ = self.llm.generate_batch_scored(
                    prompts[s : s + max_prompts],
                    temps[s : s + max_prompts],
                    tops[s : s + max_prompts],
                    max_tokens=self.max_tokens,
                    seed=seed,
                )
                raw.extend(txts)
                lps.extend(float(x) for x in mean_lp)
            else:
                raw.extend(self.llm.generate_batch(
                    prompts[s : s + max_prompts],
                    temps[s : s + max_prompts],
                    tops[s : s + max_prompts],
                    max_tokens=self.max_tokens,
                    seed=seed,
                ))
        results = []
        for i in range(n):
            group = raw[i * self.n_samples : (i + 1) * self.n_samples]
            keep = [j for j, a in enumerate(group) if a and a.strip()]
            answers = [group[j].strip() for j in keep]
            r = self._result_from_answers(answers)
            if scored:
                # Sequence-likelihood disagreement across the K stochastic
                # samples (raw-distribution per-token mean logprobs): low
                # mean or high spread flags decodes the model itself finds
                # unlikely — a calibration feature the answer TEXTS can't
                # expose (two different-but-plausible spans look alike to
                # embedding variance). Restricted to the same non-blank
                # subset the text features use (agreement_rate, answer_len_*)
                # so every feature row shares one denominator; a blank
                # decode's 0.0 placeholder would otherwise read as maximal
                # confidence.
                ex = np.asarray(
                    [lps[i * self.n_samples + j] for j in keep]
                )
                r.metadata["sample_lp_mean"] = (
                    float(ex.mean()) if ex.size else -10.0
                )
                r.metadata["sample_lp_spread"] = (
                    float(ex.std()) if ex.size else 0.0
                )
            results.append(r)
        return results

    def _result_from_answers(self, answers: List[str]) -> "ConfidenceResult":
        """Shared scoring tail: answers -> ConfidenceResult."""
        if not answers:
            return ConfidenceResult(
                answers=[],
                consensus_answer="",
                uncertainty_score=1.0,
                confidence=0.0,
                metadata={"error": "No valid answers generated"},
            )
        lexical_diversity = self._compute_lexical_diversity(answers)
        variance, centroid, embeddings = self._compute_embedding_variance(answers)
        if len(embeddings) > 0:
            distances = np.linalg.norm(embeddings - centroid, axis=1)
            consensus = answers[int(np.argmin(distances))]
        else:
            consensus = Counter(answers).most_common(1)[0][0]
        normalized_uncertainty = min(1.0, variance / 2.0)  # heuristic (parity :258)
        # Side signals for multi-feature calibration (uq/scaling.fit_logistic;
        # VERDICT r2 next #5): the near-binary embedding variance alone caps
        # what post-hoc scaling can recover.
        norm = lambda a: " ".join(a.lower().split())
        n_consensus = norm(consensus)
        agreement_rate = (
            sum(1 for a in answers if norm(a) == n_consensus) / len(answers)
        )
        lens = np.asarray([len(a.split()) for a in answers], dtype=np.float64)
        return ConfidenceResult(
            answers=answers,
            consensus_answer=consensus,
            uncertainty_score=normalized_uncertainty,
            confidence=1.0 - normalized_uncertainty,
            embedding_variance=variance,
            lexical_diversity=lexical_diversity,
            metadata={
                "n_samples": len(answers),
                "temperature_range": self.temperature_range,
                "top_p_range": self.top_p_range,
                "agreement_rate": float(agreement_rate),
                "answer_len_mean": float(lens.mean()),
                "answer_len_spread": float(lens.std()),
            },
        )

    def get_confidence_interval(
        self,
        prompt: str,
        context: str,
        question: str,
        model: Optional[str] = None,  # kept for reference API compatibility
    ) -> ConfidenceResult:
        """MC confidence estimate (parity :204-272)."""
        full_prompt = self.build_prompt(prompt, context, question)
        params = [self._sample_parameters() for _ in range(self.n_samples)]
        raw = self.llm.generate_batch(
            [full_prompt] * self.n_samples,
            [p["temperature"] for p in params],
            [p["top_p"] for p in params],
            max_tokens=self.max_tokens,
            seed=int(self._rng.integers(0, 2**31 - 1)),
        )
        answers = [a.strip() for a in raw if a and a.strip()]
        return self._result_from_answers(answers)
