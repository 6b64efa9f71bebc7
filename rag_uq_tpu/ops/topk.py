"""Streaming exact cosine top-k over an HBM-resident embedding matrix.

TPU-native replacement for the reference's ChromaDB/HNSW dense search
(streaming_index.py:338-370): exact brute-force cosine over [N, D] done as a
block-streamed matmul (MXU) with a running per-query top-k merge, so the
[B, N] score matrix is never materialized in HBM. A Pallas fused kernel for
the same contract lives in rag_uq_tpu.ops.pallas_topk; this XLA version is the
correctness oracle and CPU-test fallback.
"""

from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp


@partial(jax.jit, static_argnames=("k", "block"))
def cosine_topk(
    emb: jax.Array,  # [cap, D] storage-dtype, L2-normalized rows
    queries: jax.Array,  # [B, D] float32, L2-normalized
    size: jax.Array,  # scalar int32: live rows (rest are masked out)
    k: int,
    block: int = 8192,
) -> Tuple[jax.Array, jax.Array]:
    """Exact top-k cosine scores and row indices.

    Returns (scores [B, k] float32, indices [B, k] int32); dead slots (fewer
    than k live rows) have score -inf and index -1. Deterministic tie-break:
    lowest row index wins, identical to a single global `jax.lax.top_k`.
    """
    cap, dim = emb.shape
    bsz = queries.shape[0]
    if cap % block != 0:
        raise ValueError(f"capacity {cap} must be a multiple of block {block}")
    if k > block:
        raise ValueError(f"k={k} must be <= block={block}")

    q = queries.astype(emb.dtype)
    n_blocks = cap // block
    col = jnp.arange(block, dtype=jnp.int32)

    if n_blocks == 1:
        scores = jnp.dot(q, emb.T, preferred_element_type=jnp.float32)
        scores = jnp.where(col[None, :] < size, scores, -jnp.inf)
        vals, idx = jax.lax.top_k(scores, k)
        idx = jnp.where(jnp.isneginf(vals), -1, idx)
        return vals, idx.astype(jnp.int32)

    emb_blocks = emb.reshape(n_blocks, block, dim)

    def step(carry, inp):
        best_v, best_i = carry
        blk_idx, blk = inp
        scores = jnp.dot(q, blk.T, preferred_element_type=jnp.float32)
        base = blk_idx * block
        valid = (base + col) < size
        scores = jnp.where(valid[None, :], scores, -jnp.inf)
        v, i = jax.lax.top_k(scores, k)
        i = i + base
        # Merge with the running top-k. The running buffer (earlier blocks)
        # is concatenated first so lowest-index tie-breaking is preserved.
        cat_v = jnp.concatenate([best_v, v], axis=-1)
        cat_i = jnp.concatenate([best_i, i], axis=-1)
        nv, sel = jax.lax.top_k(cat_v, k)
        ni = jnp.take_along_axis(cat_i, sel, axis=-1)
        return (nv, ni), None

    init = (
        jnp.full((bsz, k), -jnp.inf, dtype=jnp.float32),
        jnp.full((bsz, k), -1, dtype=jnp.int32),
    )
    (vals, idx), _ = jax.lax.scan(
        step, init, (jnp.arange(n_blocks, dtype=jnp.int32), emb_blocks)
    )
    idx = jnp.where(jnp.isneginf(vals), -1, idx)
    return vals, idx


@partial(jax.jit, static_argnames=("k", "approx", "recall_target"))
def cosine_topk_single(
    emb: jax.Array,
    queries: jax.Array,
    size: jax.Array,
    k: int,
    approx: bool = False,
    recall_target: float = 0.95,
) -> Tuple[jax.Array, jax.Array]:
    """Single-shot top-k: one [B, cap] matmul then (approx_)top_k.

    Fastest path when the [B, cap] f32 intermediate fits in HBM (cap*B*4
    bytes); `approx=True` uses the TPU PartialReduce-based approx_max_k
    (defaults to 0.95 per-op recall) for the candidate pool — appropriate
    when results feed a downstream merge/rescore.
    """
    cap = emb.shape[0]
    col = jnp.arange(cap, dtype=jnp.int32)
    scores = jnp.dot(
        queries.astype(emb.dtype), emb.T, preferred_element_type=jnp.float32
    )
    scores = jnp.where(col[None, :] < size, scores, -jnp.inf)
    if approx:
        vals, idx = jax.lax.approx_max_k(scores, k, recall_target=recall_target)
    else:
        vals, idx = jax.lax.top_k(scores, k)
    idx = jnp.where(jnp.isneginf(vals), -1, idx)
    return vals, idx.astype(jnp.int32)


@partial(jax.jit, static_argnames=("k",))
def merge_topk(
    vals_a: jax.Array,
    idx_a: jax.Array,
    vals_b: jax.Array,
    idx_b: jax.Array,
    k: int,
) -> Tuple[jax.Array, jax.Array]:
    """Merge two per-query top-k result sets into one (used for shard merge)."""
    cat_v = jnp.concatenate([vals_a, vals_b], axis=-1)
    cat_i = jnp.concatenate([idx_a, idx_b], axis=-1)
    nv, sel = jax.lax.top_k(cat_v, k)
    ni = jnp.take_along_axis(cat_i, sel, axis=-1)
    return nv, ni


def gather_scores(
    emb: jax.Array, queries: jax.Array, positions: jax.Array
) -> jax.Array:
    """Cosine scores for specific rows: queries [B, D], positions [B, P].

    Invalid positions (< 0) return score 0.0 (the reference's missing-score
    convention, streaming_index.py:498-499).
    """
    safe = jnp.maximum(positions, 0)
    rows = emb[safe]  # [B, P, D]
    scores = jnp.einsum(
        "bd,bpd->bp", queries.astype(emb.dtype), rows,
        preferred_element_type=jnp.float32,
    )
    return jnp.where(positions >= 0, scores, 0.0)
