"""Pallas TPU kernel: fused cosine matmul + exact running top-k.

The flagship retrieval kernel (SURVEY.md §7 hard part 1): streams the
[cap, D] corpus matrix through VMEM block by block, computes each block's
cosine scores against the resident query batch on the MXU, and maintains an
exact per-query top-K in VMEM scratch — so the [B, cap] score matrix never
exists in HBM and no separate top-k pass re-reads it.

Merge design (round 2; round 1's K-pass extraction ran k sequential
max-extract passes per improving block and was outrun by approx_max_k):
the running top-K is kept SORTED descending, and each block's candidates
are folded in with an INSERTION loop — a `lax.while_loop` that, per
iteration, takes every query's best remaining block score, computes its
rank in the running top-K with one [B, k] comparison, and shift-inserts it
with two lane-select passes. Iterations are data-dependent: exactly the
number of block candidates that actually enter some query's top-K (for a
random stream, E[entries/query/block] = k·ln(n)/n_blocks ≈ 3 at the bench
shape — versus the unconditional k = 50 passes of the old merge). A cheap
per-block threshold predicate still skips blocks with no candidate at all.

Exactness: results are identical (values, indices, tie-breaks) to
`jax.lax.top_k` over the full matmul — the XLA oracle in ops/topk.py — and
unlike `approx_max_k` there is no recall loss. Tie-break: lowest row index
(equal values insert AFTER existing entries, which always carry lower row
indices in an ascending block stream).

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


def _kernel(size_ref, q_ref, emb_ref, vals_ref, idx_ref, run_vals, run_idx):
    i = pl.program_id(1)  # corpus-block index (innermost)
    n_blocks = pl.num_programs(1)
    bsz, k = run_vals.shape
    block_n = emb_ref.shape[0]

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

    out_col = jax.lax.broadcasted_iota(jnp.int32, (bsz, k), 1)
    big = jnp.int32(block_n)

    # Skip the whole merge when no score beats any query's current K-th
    # best (run_vals is sorted descending, so column k-1 is the threshold).
    any_candidate = jnp.any(scores > run_vals[:, k - 1][:, None])

    @pl.when(any_candidate)
    def _():
        def cond(state):
            s, it = state
            return jnp.logical_and(
                jnp.any(s > run_vals[:, k - 1][:, None]), it < block_n
            )

        def body(state):
            s, it = state
            rv = run_vals[:]
            ri = run_idx[:]
            # Every query's best remaining block score; first-max column
            # (lowest row index wins ties, matching lax.top_k order).
            mx = jnp.max(s, axis=1)
            amx = jnp.min(jnp.where(s == mx[:, None], col, big), axis=1)
            chosen = col == amx[:, None]
            cidx = base + amx  # global row index of the candidate
            s = jnp.where(chosen, _NEG_INF, s)

            improve = mx > rv[:, k - 1]
            # Rank = #entries >= the candidate: equal-valued entries were
            # inserted earlier from lower row indices (ascending block
            # stream + lowest-column-first extraction), so the candidate
            # goes AFTER them — matching lax.top_k's lowest-index tie order.
            rank = jnp.sum((rv >= mx[:, None]).astype(jnp.int32), axis=1)
            # Shift-right by one lane (static slices; column 0 of the
            # shifted arrays is never selected — rank 0 takes `at`).
            shifted_v = jnp.concatenate([rv[:, :1], rv[:, :-1]], axis=1)
            shifted_i = jnp.concatenate([ri[:, :1], ri[:, :-1]], axis=1)
            at = out_col == rank[:, None]
            after = out_col > rank[:, None]
            new_v = jnp.where(at, mx[:, None], jnp.where(after, shifted_v, rv))
            new_i = jnp.where(at, cidx[:, None], jnp.where(after, shifted_i, ri))
            run_vals[:] = jnp.where(improve[:, None], new_v, rv)
            run_idx[:] = jnp.where(improve[:, None], new_i, ri)
            return s, it + 1

        jax.lax.while_loop(cond, body, (scores, jnp.int32(0)))

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
    q_block bounds VMEM (block scores are [q_block, block] f32).
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
