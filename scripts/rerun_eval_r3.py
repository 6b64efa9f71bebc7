"""Re-run ONLY the evaluation stage of a completed demo_full_r3 pipeline run.

Reloads every trained artifact (encoder checkpoint, TinyLM extractor,
router checkpoint, conformal calibration DB) from the run directory and
re-executes cli.evaluate.run_evaluation — used to iterate on the
confidence-calibration feature set (VERDICT r2 next #5) without paying
the ~25 min of training stages again.
"""
import json
import sys
import time
from pathlib import Path

import numpy as np

WORK = Path(sys.argv[1] if len(sys.argv) > 1 else "runs/demo_full_r3")
SCALES = {"nq": 3000, "cal": 500, "test": 200}
SEED = 0

from rag_uq_tpu.core.config import Config, EmbedderConfig
from rag_uq_tpu.data.loaders import load_qa_jsonl

samples = load_qa_jsonl(str(WORK / "nq.jsonl"), limit=SCALES["nq"])
cal_samples = samples[: SCALES["cal"]]
test_samples = samples[SCALES["cal"] : SCALES["cal"] + SCALES["test"]]

# Index rebuild with the run's trained encoder (fresh checkpoint path so the
# run's own index_checkpoint.json is untouched). resume=False is load-bearing:
# a stale /tmp checkpoint from a previous rerun otherwise makes the build a
# no-op, producing an EMPTY index and all-zero retrieval metrics.
from rag_uq_tpu.cli.build_index import build_index_from_jsonl

t0 = time.time()
retriever = build_index_from_jsonl(
    str(WORK / "corpus.jsonl"),
    checkpoint_path="/tmp/rerun_eval_index_checkpoint.json",
    resume=False,
    bm25_persist_path=None,
    dense_persist_directory=None,
    config=Config(embedder=EmbedderConfig(
        kind="encoder", checkpoint_path=str(WORK / "encoder/encoder.msgpack"))),
)
print(f"index rebuilt in {time.time()-t0:.1f}s", flush=True)

# Guard: a resumed/failed build produces an empty or partial index and —
# downstream — an all-zero-recall artifact that silently overwrites the
# good one. Fail fast instead.
n_corpus = sum(1 for line in open(WORK / "corpus.jsonl") if line.strip())
assert len(retriever) == n_corpus, (
    f"index holds {len(retriever)} docs, corpus has {n_corpus} — "
    "stale checkpoint or failed build; refusing to evaluate"
)
probe_q = samples[SCALES["cal"]]["question"]
vals, pos = retriever.hybrid_search_batch([probe_q], top_k=5)
assert (np.asarray(pos) >= 0).any(), "probe query returned no hits"
print(f"index sanity ok: {len(retriever)} docs, probe query has hits", flush=True)

# TinyLM extractor, zero-shot from the pretrained checkpoint (as the
# pipeline uses it).
from flax import serialization
from rag_uq_tpu.llm.tiny_lm import TinyLMConfig
from rag_uq_tpu.llm.train import LMTrainConfig, TinyLMTrainer

lm_ckpt = "models/tiny_lm/tiny_lm.msgpack"
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

# Router + conformal from the run's artifacts.
from rag_uq_tpu.cli.evaluate import run_evaluation
from rag_uq_tpu.router.model import RetrievalRouter
from rag_uq_tpu.router.train import RouterTrainer
from rag_uq_tpu.uq.conformal import ConformalRAG
from rag_uq_tpu.uq.mc import MCDropoutConfidence

router = RetrievalRouter()
RouterTrainer(router).load_checkpoint(str(WORK / "router/final_router.msgpack"))
eval_mc = MCDropoutConfidence(llm, n_samples=8, seed=0)
conformal = ConformalRAG(llm, calibration_db_path=str(WORK / "calibration.db"),
                         nonconformity_mode="mc_variance", mc=eval_mc)

t0 = time.time()
eval_results = run_evaluation(
    retriever, test_samples, llm=llm, router=router, conformal=conformal,
    mc_samples=8, calibration_samples=cal_samples,
    output_dir=str(WORK / "results"),
)
print(f"evaluation in {time.time()-t0:.1f}s", flush=True)
print(json.dumps(eval_results["summary"], indent=1))
print(json.dumps(eval_results["calibration"], indent=1)[:600])
cs = eval_results.get("confidence_scaling", {})
print("scaling:", json.dumps({k: v for k, v in cs.items() if k != "candidates"}))
for name, c in (cs.get("candidates") or {}).items():
    print(f"  {name}: holdout_brier={c.get('holdout_brier')}")

# Refresh the summary's evaluation block so pipeline_summary.json stays
# consistent with results/evaluation_results.json.
summ_path = WORK / "pipeline_summary.json"
summary = json.loads(summ_path.read_text())
summary["evaluation"] = eval_results["summary"]
summ_path.write_text(json.dumps(summary, indent=2))
print("pipeline_summary.json evaluation block refreshed")
