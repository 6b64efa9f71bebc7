"""Per-stage device-time breakdown of the fused hybrid query (bench shape).

VERDICT r2 weak #2: the single-chip bench does 2048 queries in ~69.5 ms per
batch while the dense matmul alone is ~2 ms — nothing published said where
the other ~67 ms goes. This harness builds the EXACT bench corpus/state
(bench.py constants and seeds) and times each stage of the fused program as
its own compiled program, plus the full program at several batch sizes, so
docs/kernels.md can carry a measured breakdown instead of a guess.

Methodology notes (CLAUDE.md platform gotchas): `block_until_ready` is a
no-op barrier on the relayed TPU, so every timing transfers ONE scalar
derived from the output; programs that would otherwise be DCE'd reduce
their result to a scalar on device. Stage timings are separate XLA programs
— the fused program may overlap/fuse differently — so the breakdown is an
attribution guide, not an exact partition; the full-program row is the
ground truth.

Run: python -m rag_uq_tpu.cli.profile_fused  -> runs/profile/fused_breakdown.json
"""

from __future__ import annotations

import argparse
import json
import logging
import time
from pathlib import Path
from typing import Callable, Dict, Optional, Sequence

import numpy as np

logger = logging.getLogger(__name__)


def _sync_scalar(out) -> float:
    """Force execution with a single-scalar transfer (relay-safe barrier)."""
    import jax

    leaves = jax.tree_util.tree_leaves(out)
    x = leaves[0]
    return float(np.asarray(x.ravel()[0] if hasattr(x, "ravel") else x))


def time_program(fn: Callable, *args, reps: int = 5, warmup: int = 2) -> float:
    """Mean wall-clock seconds per call (scalar-transfer synchronized)."""
    for _ in range(warmup):
        _sync_scalar(fn(*args))
    t0 = time.time()
    for _ in range(reps):
        out = fn(*args)
    _sync_scalar(out)
    return (time.time() - t0) / reps


def run_profile(
    n_docs: int = 100_000,
    dim: int = 768,
    vocab: int = 30_000,
    doc_len: int = 40,
    batch: int = 2048,
    pool: int = 50,
    k: int = 10,
    block: int = 16_384,
    outdir: str = "runs/profile",
    reps: int = 5,
    impact_dtype: Optional[str] = None,
) -> Dict:
    import jax
    import jax.numpy as jnp

    from rag_uq_tpu.core.types import Document
    from rag_uq_tpu.index.sparse import BM25Index
    from rag_uq_tpu.ops import bm25 as bm25_ops
    from rag_uq_tpu.ops.topk import cosine_topk_single
    from rag_uq_tpu.retrieval.fused import (
        build_index_state,
        encode_for_fused,
        fuse_pools_select,
        make_fused_hybrid_query,
    )
    from rag_uq_tpu.router.model import RetrievalRouter

    # -- bench.py corpus, bit-identical construction --------------------------------
    rng = np.random.default_rng(0)
    ranks = np.arange(1, vocab + 1, dtype=np.float64)
    probs = (1.0 / ranks) / (1.0 / ranks).sum()
    docs = rng.choice(vocab, size=(n_docs, doc_len), p=probs)
    texts = [" ".join(map(str, row)) for row in docs]

    if impact_dtype:
        from rag_uq_tpu.core.config import BM25Config

        bm25 = BM25Index(BM25Config(impact_dtype=impact_dtype))
    else:
        bm25 = BM25Index()
    bm25.add_documents([Document(str(i), t) for i, t in enumerate(texts)])
    beam = bm25._sync()["beam"]

    cap = ((n_docs + block - 1) // block) * block
    key = jax.random.PRNGKey(0)
    emb = jax.random.normal(key, (cap, dim), dtype=jnp.float32)
    emb = emb / jnp.linalg.norm(emb, axis=1, keepdims=True)
    emb = emb.astype(jnp.bfloat16)

    class _DenseShim:
        _emb = emb

        def __len__(self):
            return n_docs

    state = build_index_state(_DenseShim(), bm25)
    tcap = state["impact"].shape[0]
    results: Dict = {
        "n_docs": n_docs,
        "batch": batch,
        "pool": pool,
        "cap": cap,
        "tcap": tcap,
        "beam": beam,
        "impact_dtype": str(state["impact"].dtype),
        "reps": reps,
    }
    logger.info("state: tcap=%d beam=%d cap=%d", tcap, beam, cap)

    def make_batch(seed: int, bsz: int):
        r = np.random.default_rng(seed)
        src = r.integers(0, n_docs, size=bsz)
        qk = jax.random.PRNGKey(seed)
        noise = jax.random.normal(qk, (bsz, dim), dtype=jnp.float32) * 0.7
        q = emb[src].astype(jnp.float32) + noise
        q = q / jnp.linalg.norm(q, axis=1, keepdims=True)
        terms = docs[src][:, :: doc_len // 6][:, :6]
        qtexts = [" ".join(map(str, row)) for row in terms]
        return q, encode_for_fused(bm25, qtexts)

    q, qterms = make_batch(12345, batch)
    qtids = qterms["qtids_base"]

    router = RetrievalRouter()
    router_vars = {"params": router.params, "stats": router.stats}

    stages: Dict[str, float] = {}

    # -- full fused program (ground truth), bench configuration ---------------------
    fused = make_fused_hybrid_query(
        router_module=router.module, k=k, pool=pool, block=block, beam=beam,
        dense_mode="single_approx", sparse_mode="scatter",
    )
    stages["full_fused_scatter"] = time_program(
        lambda: fused(state, q, qterms, router_vars), reps=reps
    )

    # -- dense stages ----------------------------------------------------------------
    @jax.jit
    def dense_matmul_reduce(emb_, q_):
        scores = jnp.dot(
            q_.astype(emb_.dtype), emb_.T, preferred_element_type=jnp.float32
        )
        return jnp.sum(scores)

    stages["dense_matmul_only"] = time_program(
        dense_matmul_reduce, emb, q, reps=reps
    )

    @jax.jit
    def dense_pool_fn(emb_, q_):
        return cosine_topk_single(emb_, q_, jnp.int32(n_docs), pool, approx=True)

    stages["dense_matmul_plus_approxmaxk"] = time_program(
        dense_pool_fn, emb, q, reps=reps
    )

    # -- BM25 stages -----------------------------------------------------------------
    @jax.jit
    def onehot_only(term_row, qtids_):
        valid = qtids_ >= 0
        rows = jnp.where(valid, term_row[jnp.where(valid, qtids_, 0)], -1)
        onehot = jnp.sum(jax.nn.one_hot(rows, tcap, dtype=jnp.bfloat16), axis=1)
        return jnp.sum(onehot)

    stages["bm25_onehot_build"] = time_program(
        onehot_only, state["term_row"], qtids, reps=reps
    )

    @jax.jit
    def high_matmul(term_row, impact, impact_scale, qtids_):
        valid = qtids_ >= 0
        rows = jnp.where(valid, term_row[jnp.where(valid, qtids_, 0)], -1)
        dt = jnp.bfloat16 if impact.dtype == jnp.int8 else impact.dtype
        onehot = jnp.sum(jax.nn.one_hot(rows, tcap, dtype=dt), axis=1)
        onehot = onehot * impact_scale.astype(dt)[None, :]
        high = jnp.dot(
            onehot, impact.astype(dt), preferred_element_type=jnp.float32
        )
        return jnp.sum(high)

    stages["bm25_high_tier_matmul"] = time_program(
        high_matmul, state["term_row"], state["impact"], state["impact_scale"],
        qtids, reps=reps,
    )

    @jax.jit
    def scatter_only(low_ranges, post_packed, qtids_):
        # Low-tier slices scattered into a ZERO matrix (isolates slice+scatter
        # from the high-tier matmul).
        pcap = post_packed.shape[1]
        nq = qtids_.shape[0]
        valid = qtids_ >= 0
        safe = jnp.where(valid, qtids_, 0)
        start = jnp.where(valid, low_ranges[0, safe], 0)
        end = jnp.where(valid, low_ranges[1, safe], 0)
        safe_start = jnp.minimum(start, max(pcap - beam, 0))
        sl = jax.vmap(jax.vmap(
            lambda s: jax.lax.dynamic_slice(post_packed, (0, s), (2, beam))
        ))(safe_start)
        docs_ = sl[:, :, 0, :]
        w = jax.lax.bitcast_convert_type(sl[:, :, 1, :], jnp.float32)
        off = jnp.arange(beam, dtype=jnp.int32)[None, None, :]
        pos = safe_start[:, :, None] + off
        ok = (pos >= start[:, :, None]) & (pos < end[:, :, None])
        docs_ = jnp.where(ok, docs_, 0).reshape(nq, -1)
        w = jnp.where(ok, w, 0.0).reshape(nq, -1)
        zeros = jnp.zeros((nq, cap), dtype=jnp.float32)
        b_ix = jnp.arange(nq, dtype=jnp.int32)[:, None]
        return jnp.sum(zeros.at[b_ix, docs_].add(w))

    stages["bm25_low_slices_plus_scatter"] = time_program(
        scatter_only, state["low_ranges"], state["post_packed"], qtids,
        reps=reps,
    )

    @jax.jit
    def slices_only(low_ranges, post_packed, qtids_):
        # Low-tier dynamic slices + masking WITHOUT the scatter: isolates
        # gather cost from scatter cost.
        pcap = post_packed.shape[1]
        valid = qtids_ >= 0
        safe = jnp.where(valid, qtids_, 0)
        start = jnp.where(valid, low_ranges[0, safe], 0)
        end = jnp.where(valid, low_ranges[1, safe], 0)
        safe_start = jnp.minimum(start, max(pcap - beam, 0))
        sl = jax.vmap(jax.vmap(
            lambda s: jax.lax.dynamic_slice(post_packed, (0, s), (2, beam))
        ))(safe_start)
        w = jax.lax.bitcast_convert_type(sl[:, :, 1, :], jnp.float32)
        off = jnp.arange(beam, dtype=jnp.int32)[None, None, :]
        pos = safe_start[:, :, None] + off
        ok = (pos >= start[:, :, None]) & (pos < end[:, :, None])
        return jnp.sum(jnp.where(ok, w, 0.0))

    stages["bm25_low_slices_only"] = time_program(
        slices_only, state["low_ranges"], state["post_packed"], qtids,
        reps=reps,
    )

    # Scatter of PRECOMPUTED (docs, w) into zeros: isolates raw scatter cost.
    kp0 = jax.random.PRNGKey(3)
    pre_docs = jax.random.randint(
        kp0, (batch, 32 * beam), 0, cap, dtype=jnp.int32
    )
    pre_w = jax.random.uniform(kp0, (batch, 32 * beam), dtype=jnp.float32)

    @jax.jit
    def scatter_pre(d_, w_):
        zeros = jnp.zeros((batch, cap), dtype=jnp.float32)
        b_ix = jnp.arange(batch, dtype=jnp.int32)[:, None]
        return jnp.sum(zeros.at[b_ix, d_].add(w_))

    stages["bm25_scatter_precomputed_only"] = time_program(
        scatter_pre, pre_docs, pre_w, reps=reps
    )

    @jax.jit
    def bm25_full(low_ranges, post_packed, term_row, impact, impact_scale,
                  qtids_):
        return bm25_ops.topk_lowscatter(
            low_ranges, post_packed, term_row, impact, qtids_, pool,
            beam=beam, approx=True, impact_scale=impact_scale,
        )

    stages["bm25_scatter_full"] = time_program(
        bm25_full, state["low_ranges"], state["post_packed"],
        state["term_row"], state["impact"], state["impact_scale"], qtids,
        reps=reps,
    )

    # Active-term compaction (round 3): host-computed batch-active rows.
    qterms_c = encode_for_fused(bm25, [
        " ".join(map(str, docs[int(i)][:: doc_len // 6][:6]))
        for i in np.random.default_rng(12345).integers(0, n_docs, size=batch)
    ], active_compaction=True)
    results["active_rows_bucket"] = int(qterms_c["active_rows"].shape[0])

    @jax.jit
    def high_compact(term_row, impact, impact_scale, qtids_, act, rc):
        sub = impact[act]
        dt = jnp.bfloat16 if impact.dtype == jnp.int8 else impact.dtype
        onehot = jnp.sum(
            jax.nn.one_hot(rc, act.shape[0], dtype=dt), axis=1
        )
        onehot = onehot * impact_scale[act].astype(dt)[None, :]
        return jnp.sum(jnp.dot(onehot, sub.astype(dt),
                               preferred_element_type=jnp.float32))

    stages["bm25_high_tier_matmul_compact"] = time_program(
        high_compact, state["term_row"], state["impact"],
        state["impact_scale"], qterms_c["qtids_base"],
        qterms_c["active_rows"], qterms_c["rows_compact"], reps=reps,
    )

    @jax.jit
    def bm25_full_compact(low_ranges, post_packed, term_row, impact,
                          impact_scale, qtids_, act, rc):
        return bm25_ops.topk_lowscatter(
            low_ranges, post_packed, term_row, impact, qtids_, pool,
            beam=beam, approx=True, impact_scale=impact_scale,
            active_rows=act, rows_compact=rc,
        )

    stages["bm25_scatter_full_compact"] = time_program(
        bm25_full_compact, state["low_ranges"], state["post_packed"],
        state["term_row"], state["impact"], state["impact_scale"],
        qterms_c["qtids_base"], qterms_c["active_rows"],
        qterms_c["rows_compact"], reps=reps,
    )

    # Padded low-tier blocks (round 3): one row gather replaces B*Lq
    # dynamic slices.
    dev = bm25._sync()
    if "low_blocks" in dev:
        results["low_blocks_shape"] = list(dev["low_blocks"].shape)

        @jax.jit
        def low_blocks_gather_scatter(low_blocks, low_row, qtids_):
            valid = qtids_ >= 0
            safe = jnp.where(valid, qtids_, 0)
            pad_row = low_blocks.shape[0] - 1
            brows = jnp.where(valid, low_row[safe], pad_row)
            sl = low_blocks[brows]
            nq = qtids_.shape[0]
            docs_ = sl[:, :, 0, :].reshape(nq, -1)
            w = jax.lax.bitcast_convert_type(
                sl[:, :, 1, :], jnp.float32
            ).reshape(nq, -1)
            zeros = jnp.zeros((nq, cap), dtype=jnp.float32)
            b_ix = jnp.arange(nq, dtype=jnp.int32)[:, None]
            return jnp.sum(zeros.at[b_ix, docs_].add(w))

        stages["bm25_low_blocks_plus_scatter"] = time_program(
            low_blocks_gather_scatter, dev["low_blocks"], dev["low_row"],
            qtids, reps=reps,
        )

        @jax.jit
        def bm25_full_blocks_compact(low_ranges, post_packed, term_row,
                                     impact, impact_scale, qtids_, act, rc,
                                     lb, lr):
            return bm25_ops.topk_lowscatter(
                low_ranges, post_packed, term_row, impact, qtids_, pool,
                beam=beam, approx=True, impact_scale=impact_scale,
                active_rows=act, rows_compact=rc,
                low_blocks=lb, low_row=lr,
            )

        stages["bm25_scatter_full_blocks_compact"] = time_program(
            bm25_full_blocks_compact, state["low_ranges"],
            state["post_packed"], state["term_row"], state["impact"],
            state["impact_scale"], qterms_c["qtids_base"],
            qterms_c["active_rows"], qterms_c["rows_compact"],
            dev["low_blocks"], dev["low_row"], reps=reps,
        )

    fused_c = make_fused_hybrid_query(
        router_module=router.module, k=k, pool=pool, block=block, beam=beam,
        dense_mode="single_approx", sparse_mode="scatter",
    )
    state_b = dict(state)
    if "low_blocks" in dev:
        state_b["low_blocks"] = dev["low_blocks"]
        state_b["low_row"] = dev["low_row"]
    qc_full = dict(qterms_c)
    stages["full_fused_scatter_compact_blocks"] = time_program(
        lambda: fused_c(state_b, q, qc_full, router_vars), reps=reps
    )
    results["qps_at_batch_compact_blocks"] = round(
        batch / stages["full_fused_scatter_compact_blocks"], 1
    )

    # approx_max_k in isolation over a [B, cap] matrix.
    totals = jax.random.normal(jax.random.PRNGKey(1), (batch, cap),
                               dtype=jnp.float32)

    @jax.jit
    def amk(t):
        v, i = jax.lax.approx_max_k(t, pool)
        return jnp.sum(v)

    stages["approx_max_k_over_BN"] = time_program(amk, totals, reps=reps)

    # -- fusion tail -----------------------------------------------------------------
    kp = jax.random.PRNGKey(2)
    bvals = jax.random.uniform(kp, (batch, pool), dtype=jnp.float32)
    dvals = jax.random.uniform(kp, (batch, pool), dtype=jnp.float32)
    bidx = jax.random.randint(kp, (batch, pool), 0, n_docs, dtype=jnp.int32)
    didx = jax.random.randint(kp, (batch, pool), 0, n_docs, dtype=jnp.int32)

    @jax.jit
    def tail(bv, bi, dv, di, rv):
        return fuse_pools_select(
            bv, bi, dv, di, k, router_module=router.module, router_vars=rv
        )

    stages["union_merge_router_topk_tail"] = time_program(
        tail, bvals, bidx, dvals, didx, router_vars, reps=reps
    )

    # -- batch scaling of the full program -------------------------------------------
    scaling = {}
    for bsz in (256, 512, 1024, 2048):
        qb, qtb = make_batch(777, bsz)
        scaling[str(bsz)] = round(time_program(
            lambda: fused(state, qb, qtb, router_vars), reps=reps
        ) * 1000, 2)
    results["full_fused_ms_by_batch"] = scaling

    results["stages_ms"] = {
        name: round(s * 1000, 2) for name, s in stages.items()
    }
    results["qps_at_batch"] = round(batch / stages["full_fused_scatter"], 1)

    out = Path(outdir)
    out.mkdir(parents=True, exist_ok=True)
    with open(out / "fused_breakdown.json", "w") as f:
        json.dump(results, f, indent=2)
    logger.info("breakdown: %s", json.dumps(results, indent=2))
    return results


def main(argv: Optional[Sequence[str]] = None) -> None:
    parser = argparse.ArgumentParser(
        description="Fused hybrid query per-stage profile (real TPU)"
    )
    parser.add_argument("--batch", type=int, default=2048)
    parser.add_argument("--reps", type=int, default=5)
    parser.add_argument("--outdir", default="runs/profile")
    parser.add_argument("--impact-dtype", default=None,
                        help="override BM25Config.impact_dtype (e.g. int8) "
                        "to probe the high-tier matmul's bandwidth scaling")
    args = parser.parse_args(argv)
    logging.basicConfig(level=logging.INFO)
    print(json.dumps(run_profile(
        batch=args.batch, reps=args.reps, outdir=args.outdir,
        impact_dtype=args.impact_dtype,
    ), indent=2))


if __name__ == "__main__":
    main()
