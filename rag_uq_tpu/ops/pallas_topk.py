"""Pallas TPU kernel: fused cosine matmul + exact running top-k.

The flagship retrieval kernel (SURVEY.md §7 hard part 1): streams the
[cap, D] corpus matrix through VMEM block by block, computes each block's
cosine scores against the resident query batch on the MXU, and maintains an
exact per-query top-K in VMEM scratch — so the [B, cap] score matrix never
exists in HBM and no separate top-k pass re-reads it.

Merge design (round 2; round 1's K-pass extraction ran k sequential
max-extract passes per improving block and was outrun by approx_max_k):
the running top-K is kept SORTED descending, and each block's candidates
are folded in with a FAN-WAY INSERTION loop — a `lax.while_loop` that, per
iteration, extracts every query's top-`fan` remaining block scores and
rank-inserts all of them at once via closed-form merged positions
(pos_j = #{rv >= mx_j} + j) realized with static shifts + lane selects.
Iterations are data-dependent — ceil(candidates-that-enter / fan) — and
the serial iteration count, not the per-pass VPU width, is what the
while_loop's overhead charges for (measured: column-sub-chunking the
passes made it SLOWER; fan=4 beat fan=1 by 1.2×). The mutable candidate
pool lives in a VMEM scratch rather than the loop carry (carrying a
[bq, block] f32 costs a double-buffered copy per iteration; scratch took
7.3 ms -> 5.4 ms). A cheap per-block threshold predicate still skips
blocks with no candidate at all.

Measured at [B=1024, cap=131k, D=768, k=50] bf16 on a v5e chip:
5.4 ms vs 30.8 ms for the exact XLA matmul+`lax.top_k` (5.7x, bit
-identical) and 2.4 ms for `approx_max_k` at recall 0.977 — the exact
point on the speed/recall Pareto frontier (see docs/kernels.md).

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


def _kernel(size_ref, q_ref, emb_ref, vals_ref, idx_ref, run_vals, run_idx,
            s_ref, *, fan):
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
        # The mutable candidate pool lives in VMEM scratch, NOT in the
        # while_loop carry: a [bq, block] f32 carry would be copied (and
        # double-buffered by Mosaic) every iteration.
        s_ref[:] = scores

        def cond(state):
            go, it = state
            return jnp.logical_and(go, it < block_n)

        def body(state):
            _, it = state
            s = s_ref[:]
            rv = run_vals[:]
            ri = run_idx[:]
            # Extract every query's top-`fan` remaining block scores,
            # descending; first-max column on ties (lowest row index wins,
            # matching lax.top_k order).
            mxs, cidxs = [], []
            for _ in range(fan):
                mx = jnp.max(s, axis=1)
                amx = jnp.min(jnp.where(s == mx[:, None], col, big), axis=1)
                s = jnp.where(col == amx[:, None], _NEG_INF, s)
                mxs.append(mx)
                cidxs.append(base + amx)

            # Merged position of candidate j among (rv ∪ mxs): the count of
            # rv entries >= it, plus one for each earlier (>=-valued)
            # candidate. `>=` puts equal-valued rv entries (inserted earlier
            # from lower row indices in the ascending block stream) BEFORE
            # the candidate — matching lax.top_k's lowest-index tie order;
            # equal candidates keep extraction (ascending-column) order via
            # the +j term. pos_j >= k means "does not enter" and every
            # select below self-guards on that, so no improve mask is
            # needed — non-entering iterations are identity updates.
            poss = [
                jnp.sum((rv >= mx[:, None]).astype(jnp.int32), axis=1) + j
                for j, mx in enumerate(mxs)
            ]
            # Lane p of the merged top-K holds rv[p - m(p)] where m(p) is
            # the number of candidates landing strictly before p; realize
            # the gather as selects over the static right-shifts of rv.
            m = poss[0][:, None] < out_col
            shift = (m.astype(jnp.int32))
            for pos in poss[1:]:
                shift = shift + (pos[:, None] < out_col).astype(jnp.int32)
            new_v, new_i = rv, ri
            for c in range(1, fan + 1):
                sh_v = jnp.concatenate([rv[:, :c], rv[:, :-c]], axis=1)
                sh_i = jnp.concatenate([ri[:, :c], ri[:, :-c]], axis=1)
                sel = shift == c
                new_v = jnp.where(sel, sh_v, new_v)
                new_i = jnp.where(sel, sh_i, new_i)
            for mx, cidx, pos in zip(mxs, cidxs, poss):
                at = out_col == pos[:, None]
                new_v = jnp.where(at, mx[:, None], new_v)
                new_i = jnp.where(at, cidx[:, None], new_i)
            run_vals[:] = new_v
            run_idx[:] = new_i
            s_ref[:] = s
            go = jnp.any(s > new_v[:, k - 1][:, None])
            return go, it + 1

        jax.lax.while_loop(cond, body, (jnp.bool_(True), jnp.int32(0)))

    @pl.when(i == n_blocks - 1)
    def _():
        rv = run_vals[:]
        vals_ref[:] = rv
        idx_ref[:] = jnp.where(rv == _NEG_INF, -1, run_idx[:])


@partial(jax.jit,
         static_argnames=("k", "block", "q_block", "fan", "interpret"))
def pallas_cosine_topk(
    emb: jax.Array,  # [cap, D], L2-normalized rows (any float dtype)
    queries: jax.Array,  # [B, D]
    size: jax.Array,  # scalar int32 live-row count
    k: int,
    block: int = 1024,
    q_block: int = 256,
    fan: int = 4,
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

    if fan < 1 or fan > k:
        raise ValueError(f"fan {fan} must be in [1, k={k}]")
    vals, idx = pl.pallas_call(
        partial(_kernel, fan=fan),
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
            pltpu.VMEM((bq, block), jnp.float32),
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
