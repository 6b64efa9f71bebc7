"""Re-run ONLY the evaluation stage of a completed pipeline run (r4 flavor).

Generalizes scripts/rerun_eval_r3.py: reads the run's scales from its own
pipeline_summary.json, reloads every trained artifact (encoder, TinyLM,
router, conformal DB) from the workdir, and re-executes
cli.evaluate.run_evaluation with an overridable context policy — the
head-to-head that converts the r4 extraction-gap decomposition
(runs/demo_full_r3/results/extraction_decomposition.json: concat
distractors cost ~0.23 EM) into a measured pipeline number.

Usage:
  python scripts/rerun_eval_r4.py [workdir] [--context-policy per_passage]
      [--out-subdir results_per_passage] [--lm-checkpoint path.msgpack]
      [--n-test N] [--mc-samples K]
"""
import argparse
import json
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, "/root/repo")

ap = argparse.ArgumentParser()
ap.add_argument("workdir", nargs="?", default="runs/demo_full_r4")
ap.add_argument("--context-policy", default="concat",
                choices=("concat", "per_passage"))
ap.add_argument("--out-subdir", default=None,
                help="results subdir under workdir (default: results_<policy>)")
ap.add_argument("--lm-checkpoint", default="models/tiny_lm/tiny_lm.msgpack")
ap.add_argument("--router-checkpoint", default=None,
                help="router checkpoint (default: <workdir>/router/"
                     "final_router.msgpack); e.g. the r5 recipe-v2 retrain")
ap.add_argument("--encoder-checkpoint", default=None,
                help="encoder checkpoint (default: <workdir>/encoder/"
                     "encoder.msgpack); e.g. the r5 honest retrain "
                     "<workdir>/encoder_honest/encoder.msgpack")
ap.add_argument("--n-test", type=int, default=None,
                help="override the run's test-split size (head of the split)")
ap.add_argument("--mc-samples", type=int, default=8)
ap.add_argument("--context-passages", type=int, default=3,
                help="contexts per query: 3 = reference concat protocol "
                     "(/root/reference/experiments/run_evaluation.py:189), "
                     "1 = the serving default (/answer top-1 evidence-backed "
                     "context, cli/serve.py)")
args = ap.parse_args()

WORK = Path(args.workdir)
SEED = 0
out_dir = WORK / (args.out_subdir or f"results_{args.context_policy}")

summary = json.loads((WORK / "pipeline_summary.json").read_text())
scales = summary["scales"]
n_cal, n_test = int(scales["cal"]), int(scales["test"])
if args.n_test:
    n_test = min(n_test, args.n_test)

from rag_uq_tpu.core.config import Config, EmbedderConfig
from rag_uq_tpu.data.loaders import load_qa_jsonl

samples = load_qa_jsonl(str(WORK / "nq.jsonl"), limit=int(scales["nq"]))
cal_samples = samples[:n_cal]
test_samples = samples[n_cal : n_cal + n_test]

# Index rebuild with the run's trained encoder. resume=False is load-bearing
# (a stale /tmp checkpoint otherwise yields an EMPTY index).
from rag_uq_tpu.cli.build_index import build_index_from_jsonl

t0 = time.time()
retriever = build_index_from_jsonl(
    str(WORK / "corpus.jsonl"),
    checkpoint_path="/tmp/rerun_eval_r4_index_checkpoint.json",
    resume=False,
    bm25_persist_path=None,
    dense_persist_directory=None,
    config=Config(embedder=EmbedderConfig(
        kind="encoder",
        checkpoint_path=args.encoder_checkpoint
        or str(WORK / "encoder/encoder.msgpack"))),
)
print(f"index rebuilt in {time.time()-t0:.1f}s", flush=True)

n_corpus = sum(1 for line in open(WORK / "corpus.jsonl") if line.strip())
assert len(retriever) == n_corpus, (
    f"index holds {len(retriever)} docs, corpus has {n_corpus} — "
    "stale checkpoint or failed build; refusing to evaluate"
)
vals, pos = retriever.hybrid_search_batch(
    [test_samples[0]["question"]], top_k=5
)
assert (np.asarray(pos) >= 0).any(), "probe query returned no hits"
print(f"index sanity ok: {len(retriever)} docs", flush=True)

# TinyLM extractor, zero-shot from the checkpoint the pipeline used.
from flax import serialization
from rag_uq_tpu.llm.tiny_lm import TinyLMConfig
from rag_uq_tpu.llm.train import LMTrainConfig, TinyLMTrainer

lm_ckpt = args.lm_checkpoint
with open(lm_ckpt + ".json") as f:
    ckpt_meta = json.load(f)
model_cfg = TinyLMConfig(**ckpt_meta["model_config"])
lm_trainer = TinyLMTrainer(
    model_cfg,
    LMTrainConfig(seq_len=model_cfg.max_prompt_len, batch_size=32,
                  total_steps=1, warmup_steps=1, seed=SEED),
)
with open(lm_ckpt, "rb") as f:
    lm_trainer.params = serialization.from_bytes(lm_trainer.params, f.read())
llm = lm_trainer.export_sampler(seed=SEED)

from rag_uq_tpu.cli.evaluate import run_evaluation
from rag_uq_tpu.router.model import RetrievalRouter
from rag_uq_tpu.router.train import RouterTrainer
from rag_uq_tpu.uq.conformal import ConformalRAG
from rag_uq_tpu.uq.mc import MCDropoutConfidence

router = RetrievalRouter()
RouterTrainer(router).load_checkpoint(
    args.router_checkpoint or str(WORK / "router/final_router.msgpack"))
eval_mc = MCDropoutConfidence(llm, n_samples=args.mc_samples, seed=0)
conformal = ConformalRAG(llm, calibration_db_path=str(WORK / "calibration.db"),
                         nonconformity_mode="mc_variance", mc=eval_mc)

t0 = time.time()
eval_results = run_evaluation(
    retriever, test_samples, llm=llm, router=router, conformal=conformal,
    mc_samples=args.mc_samples, calibration_samples=cal_samples,
    output_dir=str(out_dir),
    context_policy=args.context_policy,
    context_passages=args.context_passages,
)
print(f"evaluation ({args.context_policy}) in {time.time()-t0:.1f}s",
      flush=True)
print(json.dumps(eval_results["summary"], indent=1))
cs = eval_results.get("confidence_scaling", {})
print("scaling:", json.dumps({k: v for k, v in cs.items()
                              if k != "candidates"}))
