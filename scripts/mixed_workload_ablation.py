"""Mixed-workload ablation: a split where per-query routing demonstrably wins.

VERDICT r4 next #7: on every single-distribution split some FIXED arm ties
the oracle (synthetic mix: dense_only within 0.024 MRR of oracle; handwritten:
bm25_only equals it), so the learned gate's router_capture is ~0 by
construction — no per-query decision is needed when one tower dominates the
whole workload. This script builds the workload where the decomposition says
the best arms are OPPOSITE per query family and interleaves them 50/50:

- paraphrase half: the run's synthetic test-split SEMANTIC rows (alias
  questions; the alias appears in no article, so BM25's gold MRR is ~0 and
  the dense tower must carry the query),
- needle half: the hand-written out-of-family set (entity-name needles;
  measured bm25_only MRR 0.956 vs dense_only 0.351).

Because synth_wiki worlds are article-deterministic across question styles
(verified: v1/v2 same seed -> byte-identical articles), the handwritten
gold_doc_ids authored against the r3 corpus are valid on any same-seed run.

Writes <workdir>/results/mixed_workload/ablation_results.json with the
standard 6-arm + headroom block (cli/evaluate.py run_ablation_study).
*Done* bar from the verdict: oracle - best_fixed >= 0.05 MRR and
router_capture >= 0.5. Reference motivation for the gate: the reference's
router exists to pick per-query between towers (reference rag_uq/router.py:44-68)
but its ablation never measures a workload needing it.

Usage: python scripts/mixed_workload_ablation.py [workdir] [hw_jsonl]
"""
import json
import sys
from pathlib import Path

WORK = Path(sys.argv[1] if len(sys.argv) > 1 else "runs/demo_full_r4")
HW = Path(sys.argv[2] if len(sys.argv) > 2
          else "runs/demo_full_r3/handwritten_qa.jsonl")

from rag_uq_tpu.core.config import Config, EmbedderConfig
from rag_uq_tpu.data.loaders import load_qa_jsonl

summary = json.loads((WORK / "pipeline_summary.json").read_text())
scales = summary["scales"]
n_cal, n_test = int(scales["cal"]), int(scales["test"])
test = load_qa_jsonl(str(WORK / "nq.jsonl"),
                     limit=int(scales["nq"]))[n_cal : n_cal + n_test]
hw = load_qa_jsonl(str(HW))

semantic = [s for s in test
            if (s.get("metadata") or {}).get("slice") == "semantic"]
# Balance the halves so neither family's fixed-arm favorite dominates the
# aggregate by count alone.
n_half = min(len(semantic), len(hw))
mixed = semantic[:n_half] + hw[:n_half]
print(f"mixed workload: {n_half} semantic + {n_half} handwritten "
      f"(of {len(semantic)}/{len(hw)} available)", flush=True)

from rag_uq_tpu.cli.build_index import build_index_from_jsonl

retriever = build_index_from_jsonl(
    str(WORK / "corpus.jsonl"),
    checkpoint_path="/tmp/mixed_ablation_index_checkpoint.json",
    bm25_persist_path=None,
    dense_persist_directory=None,
    config=Config(embedder=EmbedderConfig(
        kind="encoder", checkpoint_path=str(WORK / "encoder/encoder.msgpack"))),
    resume=False,
)
n_corpus = sum(1 for line in open(WORK / "corpus.jsonl") if line.strip())
assert len(retriever) == n_corpus, "index/corpus size mismatch"
print(f"index: {len(retriever)} docs", flush=True)

from rag_uq_tpu.cli.evaluate import run_ablation_study
from rag_uq_tpu.router.model import RetrievalRouter
from rag_uq_tpu.router.train import RouterTrainer

router = RetrievalRouter()
RouterTrainer(router).load_checkpoint(str(WORK / "router/final_router.msgpack"))

arms = run_ablation_study(
    retriever, mixed, router=router,
    output_dir=str(WORK / "results/mixed_workload"),
)
for name in ("bm25_only", "dense_only", "fixed_hybrid",
             "fixed_hybrid_balanced", "learned_router", "oracle_router"):
    m = arms.get(name)
    if m:
        r10 = (m.get("recall@k") or {}).get("10")
        print(f"{name}: mrr={m['mrr']:.4f} recall@10={r10}")
print("headroom:", json.dumps(arms.get("headroom"), indent=2))
