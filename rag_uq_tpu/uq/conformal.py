"""Split conformal prediction with SQLite-persisted calibration.

Capability parity with the reference's ConformalRAG
(rag_uq/confidence.py:275-580): nonconformity = 1 - ROUGE-L(pred, truth);
SQLite table `calibration_scores` with a unique md5 query hash for
resumable calibration; threshold = quantile of calibration scores at the
finite-sample-corrected level ceil((n+1)(1-alpha))/n; inference-time
heuristic nonconformity from the answer/context length ratio
1 - min(1, 4r(1-r)); conformal p-value (rank+1)/(n+1); is_reliable iff
p-value > alpha.

TPU-native difference: the calibration score vector is kept as a device
array and both the threshold quantile and the p-value rank are computed on
device (jnp), so they compose with jit-compiled evaluation loops.
"""

from __future__ import annotations

import hashlib
import logging
import sqlite3
from dataclasses import dataclass, field
from pathlib import Path
from typing import Any, Dict, List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from rag_uq_tpu.eval.metrics import rouge_l as _rouge_l

logger = logging.getLogger(__name__)


@dataclass
class ConformalResult:
    """Result from conformal prediction (parity: confidence.py:58-66)."""

    prediction: str
    confidence: float
    p_value: float
    is_reliable: bool
    coverage_alpha: float
    metadata: Dict[str, Any] = field(default_factory=dict)


@jax.jit
def conformal_threshold_device(scores: jax.Array, alpha: jax.Array) -> jax.Array:
    """(1-alpha) quantile with finite-sample correction (parity :478-493)."""
    n = scores.shape[0]
    q_level = jnp.minimum(jnp.ceil((n + 1) * (1.0 - alpha)) / n, 1.0)
    return jnp.quantile(scores, q_level)


@jax.jit
def conformal_p_value_device(scores: jax.Array, estimated: jax.Array) -> jax.Array:
    """p = (#{s >= estimated} + 1) / (n + 1) (parity :541-544)."""
    n = scores.shape[0]
    rank = jnp.sum(scores >= estimated)
    return (rank + 1.0) / (n + 1.0)


class ConformalRAG:
    """Conformal predictor with frequentist coverage guarantee P >= 1 - alpha."""

    def __init__(
        self,
        llm_client,
        calibration_db_path: str = "data/calibration_scores.db",
        alpha: float = 0.1,
        nonconformity_mode: str = "length_ratio",
        mc=None,
        n_mc_samples: int = 8,
    ):
        """`nonconformity_mode` selects the score function:

        - "length_ratio" (default, reference parity): calibration scores
          are 1 - ROUGE-L against the truth; inference estimates
          nonconformity with the answer/context length-ratio heuristic
          (confidence.py:533-539). NOTE the two are DIFFERENT functions, so
          the conformal guarantee is heuristic — kept as the behavioral
          parity contract.
        - "mc_variance": nonconformity = the MC-sampling uncertainty score
          (uq/mc.py embedding-variance disagreement), computed by the SAME
          function at calibration and inference with no truth needed — the
          scores are exchangeable, so P(p_value > alpha) = 1 - alpha holds
          by the split-conformal argument (tested on synthetic exchangeable
          data). `mc` supplies the estimator (an MCDropoutConfidence);
          built from the llm_client with `n_mc_samples` when omitted.
        """
        if nonconformity_mode not in ("length_ratio", "mc_variance"):
            raise ValueError(f"unknown nonconformity_mode {nonconformity_mode!r}")
        self.llm = llm_client
        self.alpha = alpha
        self.nonconformity_mode = nonconformity_mode
        self._mc = mc
        self._n_mc_samples = n_mc_samples
        self.db_path = Path(calibration_db_path)
        self.calibration_scores: List[float] = []
        self._scores_device: Optional[jax.Array] = None
        self._init_database()
        self._load_calibration()

    # Instruction line fed to MCDropoutConfidence.build_prompt so the MC
    # samples see the same template as _build_prompt.
    _MC_INSTRUCTION = (
        "Answer the following question based on the provided context.\n"
        "Be concise and precise."
    )

    def _mc_score(self, question: str, context: str):
        """(uncertainty score, consensus answer) from MC sampling.

        The sampler is seeded from the example's query hash, so the score
        is a deterministic function of the example — calibration rows are
        reproducible across resumes and equal the inference-time estimate
        for the same (question, context). (A user-supplied `mc` estimator
        keeps its own randomness instead.)
        """
        if self._mc is not None:
            res = self._mc.get_confidence_interval(
                self._MC_INSTRUCTION, context, question
            )
        else:
            from rag_uq_tpu.uq.mc import MCDropoutConfidence

            seed = int(self._compute_query_hash(question, context)[:8], 16)
            res = MCDropoutConfidence(
                self.llm, n_samples=self._n_mc_samples, seed=seed
            ).get_confidence_interval(self._MC_INSTRUCTION, context, question)
        return float(res.uncertainty_score), res.consensus_answer

    # -- storage -----------------------------------------------------------------

    def _init_database(self) -> None:
        self.db_path.parent.mkdir(parents=True, exist_ok=True)
        with sqlite3.connect(self.db_path) as conn:
            conn.execute(
                """
                CREATE TABLE IF NOT EXISTS calibration_scores (
                    id INTEGER PRIMARY KEY AUTOINCREMENT,
                    query_hash TEXT UNIQUE,
                    question TEXT,
                    predicted_answer TEXT,
                    true_answer TEXT,
                    nonconformity_score REAL,
                    rouge_l REAL,
                    created_at TIMESTAMP DEFAULT CURRENT_TIMESTAMP
                )
                """
            )
            conn.execute(
                "CREATE INDEX IF NOT EXISTS idx_query_hash"
                " ON calibration_scores(query_hash)"
            )

    def _load_calibration(self) -> None:
        with sqlite3.connect(self.db_path) as conn:
            cursor = conn.execute(
                "SELECT nonconformity_score FROM calibration_scores ORDER BY id"
            )
            self.calibration_scores = [row[0] for row in cursor.fetchall()]
        self._scores_device = (
            jnp.asarray(np.asarray(self.calibration_scores, dtype=np.float32))
            if self.calibration_scores
            else None
        )
        logger.info("Loaded %d calibration scores", len(self.calibration_scores))

    @staticmethod
    def _compute_query_hash(question: str, context: str) -> str:
        return hashlib.md5(f"{question}|||{context}".encode()).hexdigest()

    # -- scoring -----------------------------------------------------------------

    def rouge_l(self, prediction: str, reference: str) -> float:
        return _rouge_l(prediction, reference)

    @staticmethod
    def _build_prompt(context: str, question: str) -> str:
        return (
            "Answer the following question based on the provided context.\n"
            "Be concise and precise.\n\n"
            f"Context: {context}\n\nQuestion: {question}\n\nAnswer:"
        )

    def _generate(self, context: str, question: str) -> str:
        """Greedy-ish generation at T=0.1 (parity :378-403)."""
        prompt = self._build_prompt(context, question)
        try:
            return self.llm.generate(
                prompt, temperature=0.1, top_p=0.9, max_tokens=100
            ).strip()
        except Exception as e:  # graceful degradation (parity :401-403)
            logger.error("Generation failed: %s", e)
            return ""

    def calibrate(
        self,
        questions: Sequence[str],
        contexts: Sequence[str],
        true_answers: Sequence[str],
        model: Optional[str] = None,
        skip_existing: bool = True,
    ) -> Dict[str, Any]:
        """Build the calibration set (resumable via query-hash dedup, :405-476)."""
        # Resolve which examples still need generation (hash-dedup resume).
        pending = []
        skipped = 0
        with sqlite3.connect(self.db_path) as conn:
            for q, ctx, true in zip(questions, contexts, true_answers):
                query_hash = self._compute_query_hash(q, ctx)
                if skip_existing:
                    row = conn.execute(
                        "SELECT 1 FROM calibration_scores WHERE query_hash = ?",
                        (query_hash,),
                    ).fetchone()
                    if row:
                        skipped += 1
                        continue
                pending.append((query_hash, q, ctx, true))

        # Generate in device batches when the client supports it (one XLA
        # program per chunk instead of the reference's per-example HTTP call,
        # confidence.py:432-465); fall back to per-example generate.
        new_scores: List[float] = []
        batch_size = 32
        for start in range(0, len(pending), batch_size):
            chunk = pending[start : start + batch_size]
            if self.nonconformity_mode == "mc_variance":
                # Same score function as inference (no truth needed):
                # exchangeable scores => valid split-conformal p-values.
                if self._mc is not None and hasattr(
                    self._mc, "get_confidence_batch"
                ):
                    # One B*K-sample device program for the whole chunk.
                    results = self._mc.get_confidence_batch(
                        self._MC_INSTRUCTION,
                        [ctx for _, _, ctx, _ in chunk],
                        [q for _, q, _, _ in chunk],
                    )
                    uncertainties = [
                        float(r.uncertainty_score) for r in results
                    ]
                    preds = [r.consensus_answer for r in results]
                else:
                    scored = [
                        self._mc_score(q, ctx) for _, q, ctx, _ in chunk
                    ]
                    uncertainties = [u for u, _ in scored]
                    preds = [p for _, p in scored]
            else:
                uncertainties = None
                prompts = [self._build_prompt(ctx, q) for _, q, ctx, _ in chunk]
                if hasattr(self.llm, "generate_batch"):
                    try:
                        preds = self.llm.generate_batch(
                            prompts,
                            [0.1] * len(prompts),
                            [0.9] * len(prompts),
                            max_tokens=100,
                        )
                    except Exception as e:
                        logger.error("Batched generation failed: %s", e)
                        preds = [""] * len(prompts)
                else:
                    preds = [self._generate(ctx, q) for _, q, ctx, _ in chunk]
            preds = [p.strip() for p in preds]

            with sqlite3.connect(self.db_path) as conn:
                for i, ((query_hash, q, ctx, true), pred) in enumerate(
                    zip(chunk, preds)
                ):
                    rouge = self.rouge_l(pred, true)
                    nonconformity = (
                        uncertainties[i] if uncertainties is not None
                        else 1.0 - rouge
                    )
                    conn.execute(
                        """
                        INSERT OR REPLACE INTO calibration_scores
                        (query_hash, question, predicted_answer, true_answer,
                         nonconformity_score, rouge_l)
                        VALUES (?, ?, ?, ?, ?, ?)
                        """,
                        (query_hash, q, pred, true, nonconformity, rouge),
                    )
                    new_scores.append(nonconformity)
            if new_scores and len(new_scores) % 50 < batch_size:
                logger.info(
                    "Calibrated %d/%d examples", len(new_scores), len(pending)
                )

        self._load_calibration()
        scores = np.asarray(self.calibration_scores)
        return {
            "total_calibrated": len(self.calibration_scores),
            "new_calibrated": len(new_scores),
            "skipped": skipped,
            "mean_nonconformity": float(scores.mean()) if scores.size else 0,
            "std_nonconformity": float(scores.std()) if scores.size else 0,
        }

    # -- inference ---------------------------------------------------------------

    def get_conformal_threshold(self) -> float:
        if self._scores_device is None:
            logger.warning("No calibration scores available")
            return 1.0
        return float(
            conformal_threshold_device(self._scores_device, jnp.float32(self.alpha))
        )

    @staticmethod
    def estimate_nonconformity(prediction: str, context: str) -> float:
        """Length-ratio heuristic 1 - min(1, 4r(1-r)) (parity :533-539)."""
        pred_tokens = len(prediction.split())
        context_tokens = len(context.split())
        r = pred_tokens / (context_tokens + 1)
        return 1.0 - min(1.0, 4 * r * (1 - r))

    def predict_with_coverage(
        self, question: str, context: str, model: Optional[str] = None
    ) -> ConformalResult:
        """Prediction + conformal reliability (parity :495-561)."""
        if self.nonconformity_mode == "mc_variance":
            estimated, pred = self._mc_score(question, context)
        else:
            pred = self._generate(context, question)
            estimated = None

        if self._scores_device is None:
            return ConformalResult(
                prediction=pred,
                confidence=0.5,
                p_value=0.5,
                is_reliable=False,
                coverage_alpha=self.alpha,
                metadata={"warning": "No calibration data available"},
            )

        threshold = self.get_conformal_threshold()
        if estimated is None:
            estimated = self.estimate_nonconformity(pred, context)
        p_value = float(
            conformal_p_value_device(self._scores_device, jnp.float32(estimated))
        )
        return ConformalResult(
            prediction=pred,
            confidence=1.0 - estimated,
            p_value=p_value,
            is_reliable=p_value > self.alpha,
            coverage_alpha=self.alpha,
            metadata={
                "threshold": threshold,
                "estimated_nonconformity": estimated,
                "calibration_size": len(self.calibration_scores),
            },
        )

    def get_calibration_stats(self) -> Dict[str, Any]:
        """Summary statistics (parity :563-580)."""
        if not self.calibration_scores:
            return {"empty": True}
        scores = np.asarray(self.calibration_scores)
        return {
            "count": len(scores),
            "mean": float(scores.mean()),
            "std": float(scores.std()),
            "min": float(scores.min()),
            "max": float(scores.max()),
            "median": float(np.median(scores)),
            "q25": float(np.percentile(scores, 25)),
            "q75": float(np.percentile(scores, 75)),
            "threshold": self.get_conformal_threshold(),
            "alpha": self.alpha,
        }
