"""pool7 vs reference3: the keep/drop attribution table (VERDICT r4 next #6).

The r4 handwritten probe measured the pool7 feature set NEUTRAL out-of-family
(MRR 0.9416 vs the ref3 control's 0.9421 on identical training arrays,
results/handwritten_router_r4_probe.json). Its claimed value — scale-invariant
rare-term-needle detection via within-pool z-scores and top1-top2 gaps
(router/model.py:10-21) — must show up on the synthetic mixed-register test
split at scale, or the feature set gets dropped.

This script runs the 6-arm ablation on a finished pipeline run's synthetic
test split TWICE — once with the deployed pool7 gate, once with the
router_reference3/ control trained on the same arrays — and emits ONE table:

  {split: {pool7: {mrr, recall@10, router_accuracy}, ref3: {...}}, decision}

plus the handwritten split under both gates when <workdir>/handwritten_qa.jsonl
exists. Decision rule (recorded in the artifact): keep pool7 only if it beats
ref3 by > 0.005 MRR or > 0.05 router accuracy on ANY split; otherwise the
repo's evidence discipline says carry the 3-feature reference gate.

Usage: python scripts/pool7_attribution.py [workdir]
"""
import json
import sys
import time
from pathlib import Path

WORK = Path(sys.argv[1] if len(sys.argv) > 1 else "runs/demo_full_r4")

from rag_uq_tpu.core.config import Config, EmbedderConfig
from rag_uq_tpu.data.loaders import load_qa_jsonl

summary = json.loads((WORK / "pipeline_summary.json").read_text())
scales = summary["scales"]
n_cal, n_test = int(scales["cal"]), int(scales["test"])
test = load_qa_jsonl(str(WORK / "nq.jsonl"),
                     limit=int(scales["nq"]))[n_cal : n_cal + n_test]
print(f"{len(test)} synthetic test questions", flush=True)

from rag_uq_tpu.cli.build_index import build_index_from_jsonl

t0 = time.time()
retriever = build_index_from_jsonl(
    str(WORK / "corpus.jsonl"),
    checkpoint_path="/tmp/pool7_attr_index_checkpoint.json",
    bm25_persist_path=None,
    dense_persist_directory=None,
    config=Config(embedder=EmbedderConfig(
        kind="encoder", checkpoint_path=str(WORK / "encoder/encoder.msgpack"))),
    resume=False,
)
print(f"index: {len(retriever)} docs in {time.time()-t0:.0f}s", flush=True)

from rag_uq_tpu.cli.evaluate import run_ablation_study
from rag_uq_tpu.router.model import RetrievalRouter
from rag_uq_tpu.router.train import RouterTrainer


def load_router(subdir: str) -> RetrievalRouter:
    r = RetrievalRouter()
    RouterTrainer(r).load_checkpoint(str(WORK / subdir / "final_router.msgpack"))
    return r


def arm_row(arms: dict) -> dict:
    lr = arms["learned_router"]
    return {
        "mrr": lr["mrr"],
        "recall_at_10": (lr.get("recall@k") or {}).get("10"),
        "router_accuracy": lr.get("router_accuracy"),
        "oracle_mrr": arms["oracle_router"]["mrr"],
        "best_fixed_mrr": max(arms[a]["mrr"] for a in
                              ("bm25_only", "dense_only", "fixed_hybrid",
                               "fixed_hybrid_balanced")),
        "headroom": arms.get("headroom"),
    }


table: dict = {}
splits: list = [("synthetic_test", test)]
hw_path = WORK / "handwritten_qa.jsonl"
if hw_path.exists():
    splits.append(("handwritten", load_qa_jsonl(str(hw_path))))

for split_name, samples in splits:
    table[split_name] = {}
    for gate_name, subdir in (("pool7", "router"),
                              ("ref3", "router_reference3")):
        t0 = time.time()
        arms = run_ablation_study(
            retriever, samples, router=load_router(subdir),
            output_dir=str(WORK / "results" / f"attr_{split_name}_{gate_name}"),
        )
        table[split_name][gate_name] = arm_row(arms)
        print(f"{split_name}/{gate_name}: mrr="
              f"{table[split_name][gate_name]['mrr']:.4f} "
              f"({time.time()-t0:.0f}s)", flush=True)

# Decision rule recorded with the evidence.
keep = False
for split_name in table:
    p7, r3 = table[split_name]["pool7"], table[split_name]["ref3"]
    if p7["mrr"] - r3["mrr"] > 0.005:
        keep = True
    pa, ra = p7.get("router_accuracy"), r3.get("router_accuracy")
    if isinstance(pa, (int, float)) and isinstance(ra, (int, float)) \
            and pa - ra > 0.05:
        keep = True
table["decision"] = {
    "keep_pool7": keep,
    "rule": "keep iff pool7 beats ref3 by >0.005 MRR or >0.05 router "
            "accuracy on any split",
}
out = WORK / "results" / "pool7_attribution.json"
out.parent.mkdir(parents=True, exist_ok=True)
out.write_text(json.dumps(table, indent=2))
print(json.dumps(table, indent=2))
