"""Full experiment pipeline runner.

Capability parity with the reference's 6-step shell pipeline
(scripts/run_experiment.sh:17-33): corpus prep -> QA prep -> index build ->
router training -> conformal calibration -> evaluation, with a --quick mode
using the reference's reduced scales (100 articles / 500 NQ / 100 cal /
50 test / 10 epochs vs. 1000/3000/500/200/50). Implemented as one Python
entry point so a single process reuses the device indices across stages.
"""

from __future__ import annotations

import argparse
import json
import logging
from pathlib import Path
from typing import Optional, Sequence

from rag_uq_tpu.core.config import TrainConfig
from rag_uq_tpu.data.loaders import (
    create_synthetic_nq,
    load_qa_jsonl,
    write_jsonl,
)
from rag_uq_tpu.llm.mock import MockLLM

logger = logging.getLogger(__name__)


def run_pipeline(
    workdir: str = "runs/pipeline",
    quick: bool = False,
    corpus_path: Optional[str] = None,
    nq_path: Optional[str] = None,
    llm=None,
    seed: int = 0,
) -> dict:
    scales = (
        {"articles": 100, "nq": 500, "cal": 100, "test": 50, "epochs": 10}
        if quick
        else {"articles": 1000, "nq": 3000, "cal": 500, "test": 200, "epochs": 50}
    )
    work = Path(workdir)
    work.mkdir(parents=True, exist_ok=True)
    llm = llm or MockLLM(
        ["Paris.", "George Orwell wrote it.", "In 1949.", "It is a concept."]
    )

    # Step 1-2: corpus + QA data (synthetic when no real data is supplied —
    # this environment has no network; real corpora plug in via --corpus).
    if nq_path is None:
        nq_path = str(work / "nq.jsonl")
        create_synthetic_nq(nq_path, scales["nq"], seed=seed)
    if corpus_path is None:
        corpus_path = str(work / "corpus.jsonl")
        samples = load_qa_jsonl(nq_path)
        seen = {}
        for i, s in enumerate(samples):
            ctx = s.get("context", "")
            if ctx and ctx not in seen:
                seen[ctx] = {"id": f"doc_{len(seen)}", "text": ctx}
        write_jsonl(corpus_path, list(seen.values()))

    # Step 3: index build (streaming, checkpointed).
    from rag_uq_tpu.cli.build_index import build_index_from_jsonl, verify_index

    retriever = build_index_from_jsonl(
        corpus_path,
        checkpoint_path=str(work / "index_checkpoint.json"),
        bm25_persist_path=None,
        dense_persist_directory=None,
    )
    index_report = verify_index(retriever)

    # Step 4: router training on retrieval scores + pseudo-labels.
    from rag_uq_tpu.cli.train_router import prepare_training_data, train_router

    samples = load_qa_jsonl(nq_path)
    n_train = min(len(samples), scales["nq"])
    split = int(0.9 * n_train)
    train = prepare_training_data(retriever, samples[:split])
    val = prepare_training_data(retriever, samples[split:n_train])
    train_cfg = TrainConfig(
        num_epochs=scales["epochs"], checkpoint_dir=str(work / "router")
    )
    router_results = train_router(
        train, val, train_config=train_cfg, output_dir=str(work / "router")
    )

    # Step 5: conformal calibration.
    from rag_uq_tpu.cli.calibrate import run_calibration

    cal_results = run_calibration(
        nq_path,
        llm_client=llm,
        n_calibration=scales["cal"],
        db_path=str(work / "calibration.db"),
        output_path=str(work / "calibration_results.json"),
    )

    # Step 6: evaluation with the trained router + real UQ.
    from rag_uq_tpu.cli.evaluate import run_evaluation
    from rag_uq_tpu.router.model import RetrievalRouter
    from rag_uq_tpu.router.train import RouterTrainer
    from rag_uq_tpu.uq.conformal import ConformalRAG

    router = RetrievalRouter()
    RouterTrainer(router).load_checkpoint(str(work / "router/final_router.msgpack"))
    conformal = ConformalRAG(llm, calibration_db_path=str(work / "calibration.db"))
    test_samples = samples[scales["cal"] : scales["cal"] + scales["test"]]
    eval_results = run_evaluation(
        retriever,
        test_samples,
        llm=llm,
        router=router,
        conformal=conformal,
        output_dir=str(work / "results"),
    )

    summary = {
        "scales": scales,
        "index": {k: index_report[k] for k in
                  ("total_documents", "bm25_documents", "dense_documents")},
        "router": router_results,
        "calibration": {k: cal_results[k] for k in
                        ("total_calibrated", "mean_nonconformity")},
        "evaluation": eval_results["summary"],
    }
    with open(work / "pipeline_summary.json", "w") as f:
        json.dump(summary, f, indent=2)
    logger.info("Pipeline complete: %s", work / "pipeline_summary.json")
    return summary


def main(argv: Optional[Sequence[str]] = None) -> None:
    parser = argparse.ArgumentParser(description="Run the full experiment pipeline")
    parser.add_argument("--workdir", default="runs/pipeline")
    parser.add_argument("--quick", action="store_true")
    parser.add_argument("--corpus", default=None)
    parser.add_argument("--nq-path", default=None)
    args = parser.parse_args(argv)
    logging.basicConfig(level=logging.INFO)
    summary = run_pipeline(
        workdir=args.workdir, quick=args.quick,
        corpus_path=args.corpus, nq_path=args.nq_path,
    )
    print(json.dumps(summary, indent=2, default=str))


if __name__ == "__main__":
    main()
