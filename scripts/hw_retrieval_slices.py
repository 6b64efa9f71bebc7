"""Per-slice retrieval metrics for the hand-written out-of-family split.

VERDICT r3 next #3 asks for per-slice (hw_trained / hw_novel / hw_inverse)
EM/F1/MRR/recall@10. The full eval (scripts/eval_handwritten_r3.py) reports
per-slice EM/F1 via run_evaluation's by_slice block; this companion runs
ONLY the retrieval pass (seconds, not the generation-dominated hour) under
the same deployed protocol (balanced candidate pool + trained router
rerank) and reports per-slice MRR / recall@{1,5,10} against the authored
gold_doc_ids. Writes <workdir>/results/handwritten_retrieval_slices.json.

CPU-safe: forces the CPU backend when the axon TPU is unreachable is the
caller's job (wrap with jax.config.update('jax_platforms','cpu')).
"""
import json
import sys
import time
from collections import defaultdict
from pathlib import Path

import numpy as np

WORK = Path(sys.argv[1] if len(sys.argv) > 1 else "runs/demo_full_r3")

from rag_uq_tpu.core.config import Config, EmbedderConfig
from rag_uq_tpu.data.loaders import load_qa_jsonl

samples = load_qa_jsonl(str(WORK / "handwritten_qa.jsonl"))
print(f"{len(samples)} handwritten questions", flush=True)

from rag_uq_tpu.cli.build_index import build_index_from_jsonl

t0 = time.time()
retriever = build_index_from_jsonl(
    str(WORK / "corpus.jsonl"),
    checkpoint_path="/tmp/hw_slices_index_checkpoint.json",
    bm25_persist_path=None,
    dense_persist_directory=None,
    config=Config(embedder=EmbedderConfig(
        kind="encoder", checkpoint_path=str(WORK / "encoder/encoder.msgpack"))),
    resume=False,
)
print(f"index rebuilt in {time.time()-t0:.1f}s", flush=True)

from rag_uq_tpu.cli.evaluate import _router_order, _router_pool_width
from rag_uq_tpu.eval import metrics as M
from rag_uq_tpu.router.model import RetrievalRouter
from rag_uq_tpu.router.train import RouterTrainer

router = RetrievalRouter()
RouterTrainer(router).load_checkpoint(str(WORK / "router/final_router.msgpack"))

questions = [s["question"] for s in samples]
gold = [list(s.get("gold_doc_ids") or []) for s in samples]
slices = [(s.get("metadata") or {}).get("slice") or "?" for s in samples]

pool_p = _router_pool_width(router, 10)
ret_ids = []
for s in range(0, len(questions), 128):
    chunk = questions[s : s + 128]
    b, d, c_ids, _ = retriever.get_scores_for_router_batch(
        chunk, num_passages=pool_p, pool_order="balanced"
    )
    _, order = _router_order(router, b, d)
    ret_ids.extend([row[j] for j in order[i]] for i, row in enumerate(c_ids))

out = {"n": len(samples), "by_slice": {}, "overall": {}}
groups = defaultdict(list)
for i, sl in enumerate(slices):
    groups[sl].append(i)
for name, idx in [("overall", list(range(len(samples)))), *sorted(groups.items())]:
    r = M.evaluate_retrieval(
        [ret_ids[i] for i in idx], [gold[i] for i in idx],
        k_values=(1, 5, 10),
    )
    row = {"n": len(idx), "mrr": round(r.mrr, 4),
           **{f"recall@{k}": round(v, 4) for k, v in r.recall_at_k.items()}}
    if name == "overall":
        out["overall"] = row
    else:
        out["by_slice"][name] = row
    print(name, row, flush=True)

path = WORK / "results/handwritten_retrieval_slices.json"
path.parent.mkdir(parents=True, exist_ok=True)
path.write_text(json.dumps(out, indent=2))
print("wrote", path)
