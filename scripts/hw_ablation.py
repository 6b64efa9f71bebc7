"""Retrieval-arm ablation over the HAND-WRITTEN out-of-family split.

Motivation (r4): with the v2 tokenizer, bare BM25 ranks the gold first on
inverse-direction handwritten questions (probe: art_4040 at 7.47 vs 2.84
runner-up), yet the deployed balanced-pool + learned-router protocol scored
hw_inverse recall@10 = 0.0 — the router, trained on the synthetic families,
misroutes out-of-family inverse questions to the dense tower. This script
runs the same 6-arm ablation as the pipeline (bm25 / dense / fixed /
fixed_balanced / learned_router / oracle_router) against the authored
gold_doc_ids, per slice, making that misrouting a measured number instead
of a hypothesis. Writes <workdir>/results/handwritten_ablation/.
"""
import json
import sys
import time
from pathlib import Path

WORK = Path(sys.argv[1] if len(sys.argv) > 1 else "runs/demo_full_r3")

from rag_uq_tpu.core.config import Config, EmbedderConfig
from rag_uq_tpu.data.loaders import load_qa_jsonl

samples = load_qa_jsonl(str(WORK / "handwritten_qa.jsonl"))
print(f"{len(samples)} handwritten questions", flush=True)

from rag_uq_tpu.cli.build_index import build_index_from_jsonl

t0 = time.time()
retriever = build_index_from_jsonl(
    str(WORK / "corpus.jsonl"),
    checkpoint_path="/tmp/hw_ablation_index_checkpoint.json",
    bm25_persist_path=None,
    dense_persist_directory=None,
    config=Config(embedder=EmbedderConfig(
        kind="encoder", checkpoint_path=str(WORK / "encoder/encoder.msgpack"))),
    resume=False,
)
print(f"index rebuilt in {time.time()-t0:.1f}s", flush=True)

from rag_uq_tpu.cli.evaluate import run_ablation_study
from rag_uq_tpu.router.model import RetrievalRouter
from rag_uq_tpu.router.train import RouterTrainer

router = RetrievalRouter()
RouterTrainer(router).load_checkpoint(str(WORK / "router/final_router.msgpack"))

t0 = time.time()
arms = run_ablation_study(
    retriever, samples, router=router,
    output_dir=str(WORK / "results/handwritten_ablation"),
)
print(f"ablation in {time.time()-t0:.1f}s", flush=True)
for name, m in arms.items():
    if not isinstance(m, dict):
        continue
    print(name, json.dumps({k: round(v, 4) for k, v in m.items()
                            if isinstance(v, (int, float))}))
    for sl, sm in (m.get("by_slice") or {}).items():
        print(f"  {sl}: {json.dumps(sm)}")
