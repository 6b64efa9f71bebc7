"""Post-hoc confidence calibration: Platt scaling.

The raw UQ confidences (MC disagreement, conformal estimates) are
*rankings* of reliability, not calibrated probabilities — a small
near-deterministic extractor emits ~0.97 confidence whether or not it is
right, so ECE against empirical accuracy is large even when coverage
holds. Platt scaling (Platt 1999) fits a 2-parameter logistic
p(correct | s) = sigmoid(A*s + B) on a labeled calibration split and maps
test-time confidences through it. This is a capability the reference does
not have (its eval protocol reports ECE on raw confidences and leaves the
<0.05 target aspirational, wiki/Evaluation-Protocol.md:59-63); the raw
metrics remain reported alongside.

Implementation notes: Newton's method on the 2-d problem with Platt's
prior-smoothed targets t+ = (N+ + 1)/(N+ + 2), t- = 1/(N- + 2), which keep
the fit finite when the calibration split is small or one-sided (all
correct / all wrong) — exactly the regimes a 100-example split hits.
"""

from __future__ import annotations

from typing import Sequence, Tuple

import numpy as np


def _sigmoid(z: np.ndarray) -> np.ndarray:
    out = np.empty_like(z)
    pos = z >= 0
    out[pos] = 1.0 / (1.0 + np.exp(-z[pos]))
    ez = np.exp(z[~pos])
    out[~pos] = ez / (1.0 + ez)
    return out


def fit_platt(
    scores: Sequence[float],
    correct: Sequence[bool],
    max_iter: int = 100,
    tol: float = 1e-9,
) -> Tuple[float, float]:
    """Fit (A, B) of p = sigmoid(A*s + B) by Newton's method.

    `scores` are raw confidences (any monotone reliability score),
    `correct` the boolean outcomes on the calibration split.
    """
    s = np.asarray(scores, dtype=np.float64)
    y = np.asarray(correct, dtype=np.float64)
    if s.size == 0:
        return 1.0, 0.0
    n_pos = float(y.sum())
    n_neg = float(y.size - n_pos)
    # Platt's smoothed targets: never exactly 0/1, so the loss has a
    # finite minimum even for a one-sided split.
    t = np.where(y > 0.5, (n_pos + 1.0) / (n_pos + 2.0), 1.0 / (n_neg + 2.0))

    a, b = 0.0, float(np.log((n_pos + 1.0) / (n_neg + 1.0)))
    for _ in range(max_iter):
        p = _sigmoid(a * s + b)
        w = np.maximum(p * (1.0 - p), 1e-12)
        g = p - t  # dLoss/dz per example
        grad = np.array([np.sum(g * s), np.sum(g)])
        h11 = np.sum(w * s * s)
        h12 = np.sum(w * s)
        h22 = np.sum(w)
        hess = np.array([[h11, h12], [h12, h22]])
        hess += 1e-9 * np.eye(2)
        try:
            step = np.linalg.solve(hess, grad)
        except np.linalg.LinAlgError:  # pragma: no cover - ridge prevents it
            break
        a -= float(step[0])
        b -= float(step[1])
        if float(np.abs(step).max()) < tol:
            break
    return float(a), float(b)


def apply_platt(
    scores: Sequence[float], a: float, b: float
) -> np.ndarray:
    """Map raw confidences through the fitted logistic."""
    s = np.asarray(scores, dtype=np.float64)
    return _sigmoid(a * s + b)
