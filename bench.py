"""Benchmark: fused hybrid query throughput on one TPU chip.

Headline metric (BASELINE.json north star): hybrid queries/sec/chip over a
100k-passage corpus at recall@10 parity, target >= 10,000 QPS/chip. The
benchmark builds a wikipedia_100k-shaped synthetic corpus (zipfian vocab,
~40-token passages), an HBM-resident 768-d dense matrix, and an on-device
BM25 CSR index; queries derive from source passages so retrieval quality is
measurable (dense recall sanity + fast-vs-exact BM25 agreement are printed to
stderr). The timed region is the full fused hybrid program: dense cosine
top-pool (one MXU matmul + top-k) + exact two-tier BM25 top-pool + union
merge (reference missing-score-0 semantics) + learned router gating + final
top-10.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"} where
vs_baseline is value / 10_000 (the north-star target).
"""

from __future__ import annotations

import json
import sys
import time

import numpy as np

N_DOCS = 100_000
DIM = 768
VOCAB = 30_000
DOC_LEN = 40
BATCH = 2048
N_BATCHES = 10
K = 10
POOL = 50
BLOCK = 16_384


def log(*args):
    print(*args, file=sys.stderr, flush=True)


def build_corpus(rng: np.random.Generator):
    """Zipfian synthetic corpus: term ids per doc (no Python string round-trip
    for speed; BM25Index gets real texts, built below)."""
    # Zipf-ish distribution over the vocab.
    ranks = np.arange(1, VOCAB + 1, dtype=np.float64)
    probs = 1.0 / ranks
    probs /= probs.sum()
    docs = rng.choice(VOCAB, size=(N_DOCS, DOC_LEN), p=probs)
    return docs


def _device_probe(
    attempt_timeout_s: float = 150.0, budget_s: float = 1200.0
) -> bool:
    """Check the TPU answers at all (the relayed platform can wedge; a
    hanging benchmark is worse for the driver than a failure line).

    Probes in a fresh SUBPROCESS per attempt — a hung axon backend init
    cannot be retried in-process (the plugin's init lock stays held) — and
    retries across `budget_s` (env BENCH_PROBE_BUDGET_S overrides) so a
    transient relay outage at capture time doesn't instantly record 0.0
    (round-3 BENCH was lost to exactly that)."""
    import os
    import subprocess

    budget_s = float(os.environ.get("BENCH_PROBE_BUDGET_S", budget_s))
    deadline = time.time() + budget_s
    attempt = 0
    while True:
        attempt += 1
        try:
            proc = subprocess.run(
                [sys.executable, "-c",
                 "import jax, jax.numpy as jnp; "
                 "x = jnp.ones((8, 8)); print(float(jnp.dot(x, x)[0, 0]))"],
                capture_output=True, timeout=attempt_timeout_s,
            )
            if proc.returncode == 0:
                if attempt > 1:
                    log(f"device probe ok on attempt {attempt}")
                return True
            log(f"device probe attempt {attempt} failed: "
                f"{proc.stderr.decode(errors='replace')[-200:]}")
        except subprocess.TimeoutExpired:
            log(f"device probe attempt {attempt} timed out "
                f"({attempt_timeout_s:.0f}s)")
        remaining = deadline - time.time()
        if remaining <= 0:
            log("device probe budget exhausted; TPU unavailable")
            return False
        wait = min(120.0, remaining)
        log(f"retrying probe in {wait:.0f}s ({remaining:.0f}s budget left)")
        time.sleep(wait)


def main() -> None:
    if not _device_probe():
        print(json.dumps({
            "metric": "hybrid_qps_per_chip_wiki100k",
            "value": 0.0,
            "unit": "queries/sec",
            "vs_baseline": 0.0,
            "error": "device unavailable (probe retries exhausted)",
        }))
        return

    import jax
    import jax.numpy as jnp

    from rag_uq_tpu.core.types import Document
    from rag_uq_tpu.index.sparse import BM25Index
    from rag_uq_tpu.retrieval.fused import (
        build_index_state,
        encode_for_fused,
        make_fused_hybrid_query,
    )
    from rag_uq_tpu.router.model import RetrievalRouter

    rng = np.random.default_rng(0)
    t0 = time.time()
    docs = build_corpus(rng)
    texts = [" ".join(map(str, row)) for row in docs]
    log(f"corpus built in {time.time()-t0:.1f}s")

    t0 = time.time()
    bm25 = BM25Index()
    bm25.add_documents([Document(str(i), t) for i, t in enumerate(texts)])
    beam = bm25._sync()["beam"]
    log(f"bm25 index built in {time.time()-t0:.1f}s "
        f"({bm25._n_postings} postings, vocab {len(bm25.vocab)}, beam {beam})")

    # Dense matrix: random normalized doc vectors on device; queries are
    # noisy copies of source docs so recall is measurable.
    t0 = time.time()
    cap = ((N_DOCS + BLOCK - 1) // BLOCK) * BLOCK
    key = jax.random.PRNGKey(0)
    emb = jax.random.normal(key, (cap, DIM), dtype=jnp.float32)
    emb = emb / jnp.linalg.norm(emb, axis=1, keepdims=True)
    emb = emb.astype(jnp.bfloat16)
    jax.block_until_ready(emb)
    log(f"dense matrix [{cap},{DIM}] bf16 built in {time.time()-t0:.1f}s")

    class _DenseShim:
        _emb = emb

        def __len__(self):
            return N_DOCS

    state = build_index_state(_DenseShim(), bm25)

    router = RetrievalRouter()
    router_vars = {"params": router.params, "stats": router.stats}
    fused = make_fused_hybrid_query(
        router_module=router.module, k=K, pool=POOL, block=BLOCK, beam=beam,
        dense_mode="single_approx", sparse_mode="scatter",
    )

    # Query batches: dense side = source doc vector + noise; sparse side =
    # 6 terms sampled from the source doc. BM25 high-tier active-term
    # compaction is on (round 3: the one-hot matmul over all 8192 impact
    # rows was 28.7 ms of the 74.6 ms batch; the batch-active submatrix
    # does the same math 3.5x faster — docs/kernels.md).
    def make_batch(seed: int):
        r = np.random.default_rng(seed)
        src = r.integers(0, N_DOCS, size=BATCH)
        qk = jax.random.PRNGKey(seed)
        noise = jax.random.normal(qk, (BATCH, DIM), dtype=jnp.float32) * 0.7
        q = emb[src].astype(jnp.float32) + noise
        q = q / jnp.linalg.norm(q, axis=1, keepdims=True)
        terms = docs[src][:, :: DOC_LEN // 6][:, :6]
        qtexts = [" ".join(map(str, row)) for row in terms]
        qterms = encode_for_fused(bm25, qtexts, active_compaction=True)
        return src, q, qterms

    def pad_active(batches):
        """Pad every batch's active_rows to the max pow2 bucket so all timed
        batches share ONE compiled program (no mid-loop recompile)."""
        cap_b = max(int(b[2]["active_rows"].shape[0]) for b in batches)
        for _, _, qt in batches:
            a = np.asarray(qt["active_rows"])
            if a.shape[0] < cap_b:
                qt["active_rows"] = jnp.asarray(
                    np.pad(a, (0, cap_b - a.shape[0]))
                )
        return batches

    # Build warmup + timed batches together and pad the active-rows bucket
    # jointly, so the warmup compiles the exact program the timed loop runs.
    all_batches = pad_active(
        [make_batch(12345)] + [make_batch(s) for s in range(N_BATCHES)]
    )
    (src, q, qterms), batches = all_batches[0], all_batches[1:]

    # Warmup / compile.
    t0 = time.time()
    vals, pos = fused(state, q, qterms, router_vars)
    np.asarray(vals)
    log(f"compile+first batch in {time.time()-t0:.1f}s "
        f"(active bucket {qterms['active_rows'].shape[0]})")

    # Quality sanity: dense-noisy-copy recall@10 of the source doc.
    hit = (np.asarray(pos) == src[:, None]).any(axis=1).mean()
    log(f"source-doc recall@{K} (hybrid): {hit:.3f}")

    # Fast-vs-exact BM25 agreement on a small slice (quality guard for the
    # impact-pruned sparse path).
    from rag_uq_tpu.ops import bm25 as bm25_ops
    import jax.numpy as _jnp
    sub = qterms["qtids"][:64]
    ex_scores = bm25_ops.score_all(
        state["indptr"], state["post_doc"], state["post_w"], sub,
        state["emb"].shape[0], 1 << 17,
    )
    ev, ei = bm25_ops.topk_from_scores(ex_scores, K)
    fv, fi = bm25_ops.topk_lowscatter(
        state["low_ranges"], state["post_packed"],
        state["term_row"], state["impact"],
        sub, K, beam=beam, approx=True,
        impact_scale=state["impact_scale"],
    )
    ev, ei, fi = np.asarray(ev), np.asarray(ei), np.asarray(fi)
    overlap = np.mean([
        len(set(ei[i][ei[i] >= 0]) & set(fi[i][fi[i] >= 0]))
        / max((ei[i] >= 0).sum(), 1)
        for i in range(ei.shape[0])
    ])
    log(f"bm25 fast-vs-exact top-{K} agreement: {overlap:.3f}")

    # (Batches were pre-built above, outside the timed loop: host work is
    # excluded — the metric is device query throughput; host tokenization +
    # the compaction's np.unique are benchmarked separately below.)
    jax.block_until_ready([b[1] for b in batches])

    t0 = time.time()
    outs = []
    for _, q, qterms_b in batches:
        outs.append(fused(state, q, qterms_b, router_vars))
    # Device executes programs in order, so forcing a host transfer of the
    # final output synchronizes the whole loop (block_until_ready is not a
    # reliable barrier on relayed platforms).
    np.asarray(outs[-1][0])
    dt = time.time() - t0
    qps = BATCH * N_BATCHES / dt
    log(f"timed: {N_BATCHES} batches x {BATCH} queries in {dt:.3f}s")

    # Host-side query prep throughput (tokenize+hash+active compaction),
    # for context.
    t0 = time.time()
    _ = encode_for_fused(
        bm25, [" ".join(map(str, docs[i][:6])) for i in range(2000)],
        active_compaction=True,
    )
    host_qps = 2000 / (time.time() - t0)
    log(f"host query-encode throughput: {host_qps:.0f} q/s")

    # Quality context: the throughput corpus is synthetic (token-id
    # passages), so retrieval QUALITY is substantiated by the checked-in
    # measured artifacts rather than the in-bench sanity numbers; quote
    # them alongside the throughput headline.
    quality = {
        "in_bench_source_doc_recall@10": round(float(hit), 3),
        "in_bench_bm25_fast_vs_exact_agreement": round(float(overlap), 3),
    }
    try:
        with open("runs/encoder/encoder_results.json") as f:
            enc = json.load(f)
        quality["semantic_dense_recall@10_trained_encoder"] = enc[
            "dense_recall@10"]["trained_encoder"]
    except Exception:
        pass
    try:
        with open("runs/parity/e2e_parity.json") as f:
            par = json.load(f)
        h = par["retrieval"]["hybrid"]
        quality["e2e_hybrid_mrr_ours_vs_reference"] = [
            round(h["ours_trained_encoder"]["mrr"], 3),
            round(h["reference"]["mrr"], 3),
        ]
    except Exception:
        pass

    print(json.dumps({
        "metric": "hybrid_qps_per_chip_wiki100k",
        "value": round(qps, 1),
        "unit": "queries/sec",
        "vs_baseline": round(qps / 10_000.0, 4),
        "quality": quality,
    }))


if __name__ == "__main__":
    main()
