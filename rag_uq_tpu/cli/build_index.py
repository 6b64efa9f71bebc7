"""Index-build CLI.

Capability parity with the reference's builder
(data/preprocessing/build_chroma_index.py): streams a corpus JSONL into the
hybrid index with checkpoint/resume (:28-76) and verifies with sample
queries reporting index sizes and top hits (:79-127).
"""

from __future__ import annotations

import argparse
import logging
from typing import Optional, Sequence

from rag_uq_tpu.core.config import Config
from rag_uq_tpu.index.build import StreamingIndex
from rag_uq_tpu.retrieval.hybrid import HybridRetriever

logger = logging.getLogger(__name__)


def build_index_from_jsonl(
    corpus_path: str,
    checkpoint_path: str = "./data/index_checkpoint.json",
    bm25_persist_path: Optional[str] = "./data/bm25_index.json",
    dense_persist_directory: Optional[str] = "./data/dense_index",
    batch_size: int = 100,
    resume: bool = True,
    config: Optional[Config] = None,
) -> HybridRetriever:
    cfg = config or Config()
    retriever = HybridRetriever(
        bm25_persist_path=bm25_persist_path,
        dense_persist_directory=dense_persist_directory,
        bm25_config=cfg.bm25,
        dense_config=cfg.dense,
        embedder_config=cfg.embedder,
    )
    # Stream without per-batch persistence (O(N^2) disk writes otherwise);
    # the line-offset checkpoint still lands after every batch, and the
    # index is saved once at the end.
    retriever.bm25_index.autosave = False
    indexer = StreamingIndex(retriever, checkpoint_path=checkpoint_path,
                             batch_size=batch_size)
    total = 0
    for n in indexer.stream_from_jsonl(corpus_path, resume=resume):
        total += n
    logger.info("Indexed %d new documents (total %d)", total, len(retriever))
    if bm25_persist_path and total:
        retriever.bm25_index.save()
    if dense_persist_directory:
        retriever.dense_index.save(dense_persist_directory)
    return retriever


def verify_index(
    retriever: HybridRetriever,
    sample_queries: Optional[Sequence[str]] = None,
) -> dict:
    """Run sample queries and report sizes and top hits (parity :79-127)."""
    queries = list(sample_queries or [
        "what is machine learning",
        "capital city of a country",
        "history of science",
    ])
    report = {
        "total_documents": len(retriever),
        "bm25_documents": len(retriever.bm25_index),
        "dense_documents": len(retriever.dense_index),
        "queries": {},
    }
    for q in queries:
        hits = retriever.hybrid_search(q, top_k=3)
        report["queries"][q] = [
            {"doc_id": r.doc_id, "hybrid_score": r.hybrid_score} for r in hits
        ]
    return report


def main(argv: Optional[Sequence[str]] = None) -> None:
    parser = argparse.ArgumentParser(description="Build the hybrid index")
    parser.add_argument("--corpus", required=True, help="corpus JSONL path")
    parser.add_argument("--checkpoint", default="./data/index_checkpoint.json")
    parser.add_argument("--bm25-path", default="./data/bm25_index.json")
    parser.add_argument("--dense-dir", default="./data/dense_index")
    parser.add_argument("--batch-size", type=int, default=100)
    parser.add_argument("--no-resume", action="store_true")
    parser.add_argument("--verify", action="store_true")
    args = parser.parse_args(argv)

    logging.basicConfig(level=logging.INFO)
    retriever = build_index_from_jsonl(
        args.corpus,
        checkpoint_path=args.checkpoint,
        bm25_persist_path=args.bm25_path,
        dense_persist_directory=args.dense_dir,
        batch_size=args.batch_size,
        resume=not args.no_resume,
    )
    if args.verify:
        import json

        print(json.dumps(verify_index(retriever), indent=2))


if __name__ == "__main__":
    main()
