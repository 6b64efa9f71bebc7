"""Pallas TPU kernel: fused cosine matmul + exact running top-k.

The flagship retrieval kernel (SURVEY.md §7 hard part 1): streams the
[cap, D] corpus matrix through VMEM block by block, computes each block's
cosine scores against the resident query batch on the MXU, and maintains an
exact per-query top-K in VMEM scratch — so the [B, cap] score matrix never
exists in HBM and no separate top-k pass re-reads it. A cheap per-block
threshold test (is any score above the current per-query K-th best?) skips
the K-pass merge for blocks that cannot contribute, which is almost all of
them once the running top-K warms up.

Exactness: results are identical (values, indices, tie-breaks) to
`jax.lax.top_k` over the full matmul — the XLA oracle in ops/topk.py — and
unlike `approx_max_k` there is no recall loss. Tie-break: lowest row index.

`interpret=True` runs the kernel on CPU for tests.
"""

from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_NEG_INF = float("-inf")


def _kernel(size_ref, q_ref, emb_ref, vals_ref, idx_ref,
            run_vals, run_idx, pool_vals, pool_idx):
    i = pl.program_id(1)  # corpus-block index (innermost)
    n_blocks = pl.num_programs(1)
    bsz, k = run_vals.shape
    block_n = emb_ref.shape[0]
    pool_w = k + block_n

    @pl.when(i == 0)
    def _():
        run_vals[:] = jnp.full((bsz, k), _NEG_INF, dtype=jnp.float32)
        run_idx[:] = jnp.full((bsz, k), -1, dtype=jnp.int32)

    # Block scores on the MXU.
    scores = jax.lax.dot_general(
        q_ref[:], emb_ref[:],
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # [B, block_n]
    base = i * block_n
    col = jax.lax.broadcasted_iota(jnp.int32, (bsz, block_n), 1)
    valid = (base + col) < size_ref[0, 0]
    scores = jnp.where(valid, scores, _NEG_INF)

    # Skip the merge when no score beats any query's current K-th best.
    theta = jnp.min(run_vals[:], axis=1)  # [B]
    any_candidate = jnp.any(scores > theta[:, None])

    @pl.when(any_candidate)
    def _():
        pool_vals[:, :k] = run_vals[:]
        pool_idx[:, :k] = run_idx[:]
        pool_vals[:, k:] = scores
        pool_idx[:, k:] = base + col
        pool_col = jax.lax.broadcasted_iota(jnp.int32, (bsz, pool_w), 1)
        out_col = jax.lax.broadcasted_iota(jnp.int32, (bsz, k), 1)
        big = jnp.int32(pool_w)

        # K-pass extraction. Results are carried as values and written with
        # lane masks (Mosaic forbids stores at dynamic lane offsets).
        def extract(j, carry):
            acc_vals, acc_idx = carry
            pv = pool_vals[:]
            mx = jnp.max(pv, axis=1)
            # First-max column (lowest index wins ties == lax.top_k order).
            amx = jnp.min(
                jnp.where(pv == mx[:, None], pool_col, big), axis=1
            )
            sel = pool_col == amx[:, None]
            chosen_idx = jnp.sum(jnp.where(sel, pool_idx[:], 0), axis=1)
            slot = out_col == j
            acc_vals = jnp.where(slot, mx[:, None], acc_vals)
            acc_idx = jnp.where(slot, chosen_idx[:, None], acc_idx)
            pool_vals[:] = jnp.where(sel, _NEG_INF, pv)
            return acc_vals, acc_idx

        vals0 = jnp.full((bsz, k), _NEG_INF, dtype=jnp.float32)
        idx0 = jnp.full((bsz, k), -1, dtype=jnp.int32)
        new_vals, new_idx = jax.lax.fori_loop(0, k, extract, (vals0, idx0))
        run_vals[:] = new_vals
        run_idx[:] = new_idx

    @pl.when(i == n_blocks - 1)
    def _():
        rv = run_vals[:]
        vals_ref[:] = rv
        idx_ref[:] = jnp.where(rv == _NEG_INF, -1, run_idx[:])


@partial(jax.jit, static_argnames=("k", "block", "q_block", "interpret"))
def pallas_cosine_topk(
    emb: jax.Array,  # [cap, D], L2-normalized rows (any float dtype)
    queries: jax.Array,  # [B, D]
    size: jax.Array,  # scalar int32 live-row count
    k: int,
    block: int = 1024,
    q_block: int = 256,
    interpret: bool = False,
) -> Tuple[jax.Array, jax.Array]:
    """Exact top-k cosine scores/indices; contract matches ops.topk.cosine_topk.

    Grid is (query blocks, corpus blocks) with corpus innermost so the
    running top-K scratch lives across one query block's full corpus sweep.
    q_block bounds VMEM (the pool scratch is [q_block, k + block] f32+i32).
    """
    cap, dim = emb.shape
    bsz = queries.shape[0]
    if cap % block != 0:
        raise ValueError(f"capacity {cap} must be a multiple of block {block}")
    bq = min(q_block, bsz)
    if bsz % bq != 0:
        raise ValueError(f"batch {bsz} must be a multiple of q_block {bq}")
    n_blocks = cap // block
    nq = bsz // bq
    q = queries.astype(emb.dtype)
    size_arr = jnp.asarray(size, dtype=jnp.int32).reshape(1, 1)

    vals, idx = pl.pallas_call(
        _kernel,
        grid=(nq, n_blocks),
        in_specs=[
            pl.BlockSpec((1, 1), lambda iq, i: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((bq, dim), lambda iq, i: (iq, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((block, dim), lambda iq, i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((bq, k), lambda iq, i: (iq, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((bq, k), lambda iq, i: (iq, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((bsz, k), jnp.float32),
            jax.ShapeDtypeStruct((bsz, k), jnp.int32),
        ],
        scratch_shapes=[
            pltpu.VMEM((bq, k), jnp.float32),
            pltpu.VMEM((bq, k), jnp.int32),
            pltpu.VMEM((bq, k + block), jnp.float32),
            pltpu.VMEM((bq, k + block), jnp.int32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * bsz * cap * dim,
            bytes_accessed=nq * cap * dim * emb.dtype.itemsize
            + bsz * dim * emb.dtype.itemsize
            + 2 * bsz * k * 4,
            transcendentals=0,
        ),
        interpret=interpret,
    )(size_arr, q, emb)
    return vals, idx
