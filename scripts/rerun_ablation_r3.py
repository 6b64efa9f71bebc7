"""Re-run ONLY the ablation study of a completed demo_full_r3 pipeline run.

Round-3 review fixed the ablation protocol: `fixed_hybrid` now scores the
reference's fused-pool head verbatim (streaming_index.py:510-521) instead
of the head of the router's balanced candidate pool — the two arms now
compare the full deployed policies. This script regenerates
results/ablation/ablation_results.json under the corrected protocol,
reusing the run's trained artifacts.

CPU-runnable (tiny encoder, 5k passages): pass --cpu to force the CPU
backend (useful while the TPU is wedged); numbers are identical either way
(the device programs are deterministic), only slower.
"""
import argparse
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

parser = argparse.ArgumentParser()
parser.add_argument("workdir", nargs="?", default="runs/demo_full_r3")
parser.add_argument("--cpu", action="store_true")
args = parser.parse_args()

if args.cpu:
    import jax

    jax.config.update("jax_platforms", "cpu")

import numpy as np

WORK = Path(args.workdir)
SCALES = {"nq": 3000, "cal": 500, "test": 200}

from rag_uq_tpu.core.config import Config, EmbedderConfig
from rag_uq_tpu.data.loaders import load_qa_jsonl

samples = load_qa_jsonl(str(WORK / "nq.jsonl"), limit=SCALES["nq"])
test_samples = samples[SCALES["cal"] : SCALES["cal"] + SCALES["test"]]

from rag_uq_tpu.cli.build_index import build_index_from_jsonl

t0 = time.time()
retriever = build_index_from_jsonl(
    str(WORK / "corpus.jsonl"),
    checkpoint_path="/tmp/rerun_ablation_index_checkpoint.json",
    resume=False,
    bm25_persist_path=None,
    dense_persist_directory=None,
    config=Config(embedder=EmbedderConfig(
        kind="encoder", checkpoint_path=str(WORK / "encoder/encoder.msgpack"))),
)
n_corpus = sum(1 for line in open(WORK / "corpus.jsonl") if line.strip())
assert len(retriever) == n_corpus, (
    f"index holds {len(retriever)} docs, corpus has {n_corpus}"
)
print(f"index rebuilt in {time.time()-t0:.1f}s", flush=True)

from rag_uq_tpu.cli.evaluate import run_ablation_study
from rag_uq_tpu.router.model import RetrievalRouter
from rag_uq_tpu.router.train import RouterTrainer

router = RetrievalRouter()
RouterTrainer(router).load_checkpoint(str(WORK / "router/final_router.msgpack"))

t0 = time.time()
arms = run_ablation_study(
    retriever, test_samples, router=router,
    output_dir=str(WORK / "results/ablation"),
)
print(f"ablation in {time.time()-t0:.1f}s", flush=True)
for name, a in arms.items():
    line = {k: round(v, 4) for k, v in a.items()
            if isinstance(v, (int, float))}
    print(name, json.dumps(line))
    for sl, d in (a.get("by_slice") or {}).items():
        print(f"  {sl}: r@1={d.get('recall_at_1')} mrr={d.get('mrr')}"
              f" n={d.get('n')}")
