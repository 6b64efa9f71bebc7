"""Serving-layer benchmark: closed-loop clients against QueryService.

Measures what `cli/serve.py` actually delivers — tail latency and
throughput through the micro-batching worker — as opposed to `bench.py`,
which times the raw fused device program. The reference has no serving
layer at all (its deployment is docker-compose around Ollama/ChromaDB,
reference docker-compose.yml:24-56), so these numbers are recorded as
framework capability, not parity.

Protocol: build a synthetic corpus at --n-docs, start a QueryService
(scatter-mode BM25 pool, the serving default), then run closed-loop client
threads for --seconds at each --concurrency level: every client submits
one random single-query search (k=10) and blocks for its result. Reported
per level: achieved QPS, latency p50/p95/p99, and the mean device batch
size the micro-batcher formed.

Writes one JSON artifact (default runs/serving_bench.json) and prints it.
"""

from __future__ import annotations

import argparse
import json
import logging
import threading
import time
from pathlib import Path
from typing import List

import numpy as np

logger = logging.getLogger(__name__)


def _build_corpus(n_docs: int, seed: int = 0):
    """Synthetic token-id passages (same shape trick as bench.py)."""
    from rag_uq_tpu.core.types import Document

    rng = np.random.default_rng(seed)
    vocab = [f"w{i}" for i in range(30_000)]
    probs = 1.0 / np.arange(1, len(vocab) + 1) ** 1.07
    probs /= probs.sum()
    docs = []
    for d in range(n_docs):
        n_tok = int(rng.integers(40, 120))
        toks = rng.choice(len(vocab), size=n_tok, p=probs)
        docs.append(
            Document(id=f"doc{d}", text=" ".join(vocab[t] for t in toks))
        )
    return docs


def _percentiles(lat_ms: List[float]):
    a = np.asarray(lat_ms)
    return {
        "p50_ms": round(float(np.percentile(a, 50)), 2),
        "p95_ms": round(float(np.percentile(a, 95)), 2),
        "p99_ms": round(float(np.percentile(a, 99)), 2),
        "mean_ms": round(float(a.mean()), 2),
    }


def run_level(service, queries: List[str], concurrency: int,
              seconds: float, seed: int = 0):
    """Closed-loop clients; returns latency/QPS stats for one level."""
    stop = time.time() + seconds
    lats: List[List[float]] = [[] for _ in range(concurrency)]
    errors = [0] * concurrency

    def client(ci: int):
        rng = np.random.default_rng(seed + ci)
        while time.time() < stop:
            q = queries[int(rng.integers(0, len(queries)))]
            t0 = time.time()
            try:
                service.search([q], k=10)
            except Exception:
                errors[ci] += 1
                continue
            lats[ci].append((time.time() - t0) * 1000.0)

    service.reset_stats()
    threads = [threading.Thread(target=client, args=(i,))
               for i in range(concurrency)]
    t0 = time.time()
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    wall = time.time() - t0
    stats = service.reset_stats()
    flat = [x for row in lats for x in row]
    out = {
        "concurrency": concurrency,
        "requests": len(flat),
        "errors": sum(errors),
        "qps": round(len(flat) / wall, 1),
        **_percentiles(flat),
    }
    if stats["batches"]:
        # Device-vs-relay split: mean synchronous device-call time per batch
        # (dominated by relay RTT on this platform), mean formed batch, and
        # the mean per-request queue wait (submit -> device dispatch) —
        # together with the artifact-level relay_rtt_floor_ms these
        # decompose client latency into queue + relay + device.
        out["device_batches"] = stats["batches"]
        out["mean_batch_size"] = round(stats["queries"] / stats["batches"], 1)
        out["mean_call_ms"] = round(
            1000.0 * stats["call_seconds"] / stats["batches"], 1
        )
        out["call_concurrency"] = round(stats["call_seconds"] / wall, 2)
        if stats["queries"]:
            out["mean_queue_wait_ms"] = round(
                1000.0 * stats.get("queue_wait_seconds", 0.0)
                / stats["queries"], 1
            )
    return out


def measure_relay_rtt(n: int = 20) -> dict:
    """Floor of one synchronous device round trip: time transferring a
    single scalar from an already-materialized device array, n times. On
    the relayed platform this is almost pure relay RTT (device work ~0);
    it is the irreducible per-call latency every serving request pays."""
    import jax.numpy as jnp

    x = jnp.arange(8.0)
    float(np.asarray(x[0]))  # materialize + first-transfer warmup
    ts = []
    for _ in range(n):
        t0 = time.time()
        float(np.asarray(x[0]))
        ts.append((time.time() - t0) * 1000.0)
    a = np.asarray(ts)
    return {
        "relay_rtt_floor_ms_p50": round(float(np.percentile(a, 50)), 1),
        "relay_rtt_floor_ms_mean": round(float(a.mean()), 1),
        "n_probes": n,
    }


def main(argv=None) -> None:
    parser = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    parser.add_argument("--n-docs", type=int, default=20_000)
    parser.add_argument("--seconds", type=float, default=15.0)
    parser.add_argument("--concurrency", type=int, nargs="+",
                        default=[1, 8, 32, 128])
    parser.add_argument("--out", default="runs/serving_bench.json")
    parser.add_argument("--tick-ms", type=float, default=2.0)
    parser.add_argument("--dispatch-workers", type=int, default=4,
                        help="in-flight device programs; on the relayed "
                        "TPU each sync call is ~70-80 ms of RTT around "
                        "~5-10 ms of device time, so closed-loop QPS "
                        "scales with workers until device time saturates")
    args = parser.parse_args(argv)
    logging.basicConfig(level=logging.INFO)

    from rag_uq_tpu.cli.serve import QueryService
    from rag_uq_tpu.retrieval.hybrid import HybridRetriever

    t0 = time.time()
    docs = _build_corpus(args.n_docs)
    retriever = HybridRetriever()
    retriever.add_documents(docs)
    build_s = time.time() - t0
    logger.info("indexed %d docs in %.1fs", args.n_docs, build_s)

    # Queries: random 5-term samples from real documents, so the BM25 side
    # has matching postings.
    rng = np.random.default_rng(1)
    queries = []
    for _ in range(2048):
        toks = docs[int(rng.integers(0, len(docs)))].text.split()
        s = int(rng.integers(0, max(1, len(toks) - 5)))
        queries.append(" ".join(toks[s:s + 5]))

    # Warm every pow2 batch bucket the micro-batcher can form, so level
    # p99s measure steady-state serving, not first-compile of a bucket
    # (each distinct program is a ~60-90 s remote compile on the relayed
    # TPU and shows up as a multi-second p99 spike otherwise).
    t0 = time.time()
    b = 1
    while b <= 256:
        retriever.hybrid_search_batch(queries[:b], top_k=10,
                                      sparse_mode="scatter")
        b *= 2
    logger.info("bucket warmup in %.1fs", time.time() - t0)

    rtt = measure_relay_rtt()
    logger.info("relay RTT floor: %s", rtt)

    service = QueryService(retriever, tick_ms=args.tick_ms,
                           dispatch_workers=args.dispatch_workers)
    try:
        service.search(queries[:8], k=10)  # worker-path warmup
        levels = [
            run_level(service, queries, c, args.seconds)
            for c in args.concurrency
        ]
    finally:
        service.close()

    result = {
        "n_docs": args.n_docs,
        "index_build_seconds": round(build_s, 1),
        "tick_ms": args.tick_ms,
        "dispatch_workers": args.dispatch_workers,
        "seconds_per_level": args.seconds,
        **rtt,
        "levels": levels,
    }
    out = Path(args.out)
    out.parent.mkdir(parents=True, exist_ok=True)
    out.write_text(json.dumps(result, indent=2))
    print(json.dumps(result))


if __name__ == "__main__":
    main()
