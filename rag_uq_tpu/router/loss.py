"""Differentiable ApproxNDCG listwise ranking loss (Qin et al., TOIS 2010).

Parity with the reference's ApproxNDCGLoss (rag_uq/router.py:235-329):
soft ranks 1 + sum_j sigmoid((s_j - s_i)/tau) - 0.5, DCG gains 2^rel - 1,
discounts log2(1 + rank), NDCG = DCG / (IDCG + 1e-10), loss = -mean NDCG.

One deliberate fix: the reference implements padding masks by filling scores
with -inf (router.py:273-276), which makes masked-vs-masked pairwise
differences NaN and propagates NaN into the loss (verified against torch).
Here masked items are excluded from the pairwise sums and contribute zero
gain, so masked losses are finite; unmasked inputs produce identical values.
"""

from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp


@partial(jax.jit, static_argnames=())
def approx_ndcg_loss(
    predicted_scores: jax.Array,  # [B, P]
    relevance_labels: jax.Array,  # [B, P], >= 0
    mask: Optional[jax.Array] = None,  # [B, P] bool, True = real item
    temperature: float = 1.0,
) -> jax.Array:
    """Scalar loss = negative mean ApproxNDCG."""
    scores = predicted_scores.astype(jnp.float32)
    rels = relevance_labels.astype(jnp.float32)
    if mask is None:
        valid = jnp.ones_like(scores, dtype=bool)
    else:
        valid = mask.astype(bool)
        rels = jnp.where(valid, rels, 0.0)

    # Soft ranks over valid pairs only.
    diff = scores[..., None, :] - scores[..., :, None]  # [B, P(i), P(j)] = s_j - s_i
    pair_valid = valid[..., None, :] & valid[..., :, None]
    probs = jnp.where(pair_valid, jax.nn.sigmoid(diff / temperature), 0.0)
    approx_ranks = 1.0 + jnp.sum(probs, axis=-1) - 0.5
    approx_ranks = jnp.where(valid, approx_ranks, 1.0)  # benign rank for padding

    gains = jnp.power(2.0, rels) - 1.0
    dcg = jnp.sum(
        jnp.where(valid, gains / jnp.log2(1.0 + approx_ranks), 0.0), axis=-1
    )

    # Ideal DCG: relevances sorted descending at integer ranks 1..P.
    sorted_rels = -jnp.sort(-rels, axis=-1)
    ideal_ranks = jnp.arange(1, rels.shape[-1] + 1, dtype=jnp.float32)
    idcg = jnp.sum(
        (jnp.power(2.0, sorted_rels) - 1.0) / jnp.log2(1.0 + ideal_ranks), axis=-1
    )
    ndcg = dcg / (idcg + 1e-10)
    return -jnp.mean(ndcg)


class ApproxNDCGLoss:
    """Callable wrapper mirroring the reference's class surface."""

    def __init__(self, temperature: float = 1.0):
        self.temperature = temperature

    def __call__(
        self,
        predicted_scores: jax.Array,
        relevance_labels: jax.Array,
        mask: Optional[jax.Array] = None,
    ) -> jax.Array:
        return approx_ndcg_loss(
            jnp.asarray(predicted_scores),
            jnp.asarray(relevance_labels),
            None if mask is None else jnp.asarray(mask),
            self.temperature,
        )

    # torch-style alias
    forward = __call__
