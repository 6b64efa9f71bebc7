"""End-to-end evaluation experiment CLI.

Capability parity with the reference's experiment
(experiments/run_evaluation.py): held-out test split (:40-64), per-query
retrieve -> optional router rerank -> top-3 context -> generate (:157-212),
full metric suite + plots + summary JSON (:215-261), and the ablation study
(:264-305) — with two reference fidelity gaps fixed rather than copied:

1. Confidence comes from the real UQ stack (HybridConfidence-style MC or
   conformal confidence) instead of the reference's placeholder
   min(1, len(pred)/10) (:194-196).
2. The ablation arms (bm25-only / dense-only / fixed hybrid / learned
   router) are implemented, not stubbed TODOs (:279-292).

Retrieval metrics use pseudo-gold ids: docs containing any gold answer
substring (the reference leaves gold_ids empty, :202, so its retrieval
metrics silently read 0 — ours measure something real).
"""

from __future__ import annotations

import argparse
import json
import logging
import time
from pathlib import Path
from typing import Dict, List, Optional, Sequence

import numpy as np

from rag_uq_tpu.data.loaders import load_qa_jsonl
from rag_uq_tpu.eval.evaluator import RAGEvaluator
from rag_uq_tpu.llm.mock import MockLLM
from rag_uq_tpu.retrieval.hybrid import HybridRetriever
from rag_uq_tpu.router.model import RetrievalRouter
from rag_uq_tpu.uq.conformal import ConformalRAG
from rag_uq_tpu.uq.mc import MCDropoutConfidence

logger = logging.getLogger(__name__)


def generate_answer(llm, question: str, context: str, max_tokens: int = 100) -> str:
    """Greedy-ish answer generation, T=0.1 (parity :67-92)."""
    prompt = (
        "Answer the question based on the context. Be concise.\n\n"
        f"Context: {context}\n\nQuestion: {question}\n\nAnswer:"
    )
    return llm.generate(prompt, temperature=0.1, top_p=0.9, max_tokens=max_tokens)


def _pseudo_gold_ids(retriever: HybridRetriever, answers: List[str]) -> List[str]:
    """Docs whose text contains any gold answer (substring, lowercased)."""
    gold = []
    store = retriever.documents
    lowered = [a.lower() for a in answers if a]
    for pos in range(len(store)):
        text = store.texts[pos].lower()
        if any(a in text for a in lowered):
            gold.append(store.ids[pos])
    return gold


def run_evaluation(
    retriever: HybridRetriever,
    samples: Sequence[dict],
    llm=None,
    router: Optional[RetrievalRouter] = None,
    conformal: Optional[ConformalRAG] = None,
    mc_samples: int = 0,
    top_k: int = 10,
    context_passages: int = 3,
    max_context_chars: int = 2000,
    output_dir: str = "results",
    save: bool = True,
) -> Dict:
    """Per-query loop + full metric suite."""
    llm = llm or MockLLM()
    evaluator = RAGEvaluator(output_dir=output_dir)
    mc = (
        MCDropoutConfidence(llm, n_samples=mc_samples, seed=0)
        if mc_samples > 0
        else None
    )

    retrieved_ids: List[List[str]] = []
    gold_ids: List[List[str]] = []
    predictions: List[str] = []
    references: List[str] = []
    confidences: List[float] = []
    latencies: List[float] = []
    router_weights: List[float] = []
    retrieval_times: List[float] = []
    generation_times: List[float] = []

    for sample in samples:
        question = sample["question"]
        answers = sample.get("answers") or [sample.get("answer", "")]
        t_start = time.time()

        t_r = time.time()
        bm25, dense, ids, texts = retriever.get_scores_for_router(
            question, num_passages=top_k
        )
        if router is not None:
            router.eval()
            weights = np.asarray(
                router.forward(
                    np.asarray([bm25]), np.asarray([dense]), update_stats=False
                )
            )[0]
            hybrid = weights * np.asarray(dense) + (1 - weights) * np.asarray(bm25)
            order = np.argsort(-hybrid)
            ids = [ids[i] for i in order]
            texts = [texts[i] for i in order]
            router_weights.append(float(weights.mean()))
        retrieval_times.append(time.time() - t_r)

        context = " ".join(t for t in texts[:context_passages] if t)
        context = context[:max_context_chars]

        t_g = time.time()
        pred = generate_answer(llm, question, context)
        generation_times.append(time.time() - t_g)

        # Real UQ confidence instead of the reference's length placeholder.
        if mc is not None:
            conf = mc.get_confidence_interval(
                "Answer the question.", context, question
            ).confidence
        elif conformal is not None:
            conf = conformal.predict_with_coverage(question, context).confidence
        else:
            conf = 1.0 - ConformalRAG.estimate_nonconformity(pred, context)

        latencies.append(time.time() - t_start)
        retrieved_ids.append([i for i in ids if i])
        gold_ids.append(_pseudo_gold_ids(retriever, answers))
        predictions.append(pred)
        references.append(answers[0] if answers else "")
        confidences.append(conf)

    results = evaluator.run_full_evaluation(
        retrieved_ids=retrieved_ids,
        gold_ids=gold_ids,
        predictions=predictions,
        references=references,
        confidences=confidences,
        latencies=latencies,
        router_weights=router_weights or None,
        save_results=save,
    )
    eff = evaluator.evaluate_efficiency(
        latencies, retrieval_times=retrieval_times, generation_times=generation_times
    )
    results["efficiency"] = eff.to_dict()
    if save:
        with open(Path(output_dir) / "evaluation_results.json", "w") as f:
            json.dump(results, f, indent=2)
    return results


def run_ablation_study(
    retriever: HybridRetriever,
    samples: Sequence[dict],
    llm=None,
    router: Optional[RetrievalRouter] = None,
    top_k: int = 10,
    output_dir: str = "results/ablation",
) -> Dict[str, Dict]:
    """Four retrieval arms (implemented, unlike the reference's TODO stub):
    bm25-only, dense-only, fixed-weight hybrid, learned router."""
    llm = llm or MockLLM()
    evaluator = RAGEvaluator(output_dir=output_dir)
    arms: Dict[str, Dict] = {}

    # Gold ids depend only on (corpus, answers): compute once, reuse per arm
    # (the substring scan over the corpus is the expensive part).
    gold = [
        _pseudo_gold_ids(
            retriever, sample.get("answers") or [sample.get("answer", "")]
        )
        for sample in samples
    ]

    def eval_arm(name: str, retrieve_fn) -> None:
        retrieved = [retrieve_fn(sample["question"]) for sample in samples]
        metrics = evaluator.evaluate_retrieval(retrieved, gold)
        arms[name] = metrics.to_dict()

    eval_arm(
        "bm25_only",
        lambda q: [d for d, _ in retriever.bm25_search(q, top_k)],
    )
    eval_arm(
        "dense_only",
        lambda q: [d for d, _ in retriever.dense_search(q, top_k)],
    )
    eval_arm(
        "fixed_hybrid",
        lambda q: [r.doc_id for r in retriever.hybrid_search(q, top_k)],
    )
    if router is not None:
        def routed(q: str) -> List[str]:
            bm25, dense, ids, _ = retriever.get_scores_for_router(q, top_k)
            router.eval()
            w = np.asarray(
                router.forward(np.asarray([bm25]), np.asarray([dense]),
                               update_stats=False)
            )[0]
            hybrid = w * np.asarray(dense) + (1 - w) * np.asarray(bm25)
            return [ids[i] for i in np.argsort(-hybrid) if ids[i]]

        eval_arm("learned_router", routed)

    Path(output_dir).mkdir(parents=True, exist_ok=True)
    with open(Path(output_dir) / "ablation_results.json", "w") as f:
        json.dump(arms, f, indent=2)
    return arms


def main(argv: Optional[Sequence[str]] = None) -> None:
    parser = argparse.ArgumentParser(description="End-to-end RAG evaluation")
    parser.add_argument("--nq-path", default="data/preprocessed/nq_dev_3000.jsonl")
    parser.add_argument("--skip", type=int, default=500,
                        help="test split starts after this many samples")
    parser.add_argument("--n-test", type=int, default=200)
    parser.add_argument("--router-checkpoint", default=None)
    parser.add_argument("--mc-samples", type=int, default=0)
    parser.add_argument("--bm25-path", default="./data/bm25_index.json")
    parser.add_argument("--dense-dir", default="./data/dense_index")
    parser.add_argument("--output-dir", default="results")
    parser.add_argument("--ablation", action="store_true")
    args = parser.parse_args(argv)

    logging.basicConfig(level=logging.INFO)
    all_samples = load_qa_jsonl(args.nq_path)
    samples = all_samples[args.skip : args.skip + args.n_test]

    retriever = HybridRetriever(
        bm25_persist_path=args.bm25_path,
        dense_persist_directory=args.dense_dir,
    )
    router = None
    if args.router_checkpoint:
        from rag_uq_tpu.router.train import RouterTrainer

        router = RetrievalRouter()
        RouterTrainer(router).load_checkpoint(args.router_checkpoint)

    results = run_evaluation(
        retriever, samples, router=router,
        mc_samples=args.mc_samples, output_dir=args.output_dir,
    )
    print(json.dumps(results["summary"], indent=2))
    if args.ablation:
        print(json.dumps(
            run_ablation_study(retriever, samples, router=router,
                               output_dir=str(Path(args.output_dir) / "ablation")),
            indent=2,
        ))


if __name__ == "__main__":
    main()
