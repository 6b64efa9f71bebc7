"""Evaluate the pipeline on the HAND-WRITTEN out-of-family question set.

VERDICT r2 missing #2: every quality number rides on synth_wiki's template
family; nothing bounds the template-overfit gap. This split bounds it from
inside the container: 60 questions over `runs/demo_full_r3/corpus.jsonl`
articles, authored free-form by a human-style process (varied registers:
clipped search queries, colloquialisms, passives, typos, indirect
references), deliberately avoiding every article/question template phrasing
in data/synth_wiki.py. Three sub-slices:

- hw_trained: free-form paraphrases of TRAINED attribute directions
- hw_novel:   attributes no training question ever asked (landmark, genre,
              color, death year) — the extractor has seen the facts only as
              article sentences
- hw_inverse: answer = the entity name (work -> creator direction)

Reuses the demo_full_r3 run's trained artifacts (encoder index, router,
TinyLM). Writes results/handwritten_eval.json in the run dir.
"""
import json
import os
import sys
import time
from pathlib import Path

import numpy as np

WORK = Path(sys.argv[1] if len(sys.argv) > 1 else "runs/demo_full_r3")
SEED = 0

from rag_uq_tpu.core.config import Config, EmbedderConfig
from rag_uq_tpu.data.loaders import load_qa_jsonl

samples = load_qa_jsonl(str(WORK / "handwritten_qa.jsonl"))
print(f"{len(samples)} handwritten questions", flush=True)

from rag_uq_tpu.cli.build_index import build_index_from_jsonl

t0 = time.time()
retriever = build_index_from_jsonl(
    str(WORK / "corpus.jsonl"),
    checkpoint_path="/tmp/hw_eval_index_checkpoint.json",
    bm25_persist_path=None,
    dense_persist_directory=None,
    config=Config(embedder=EmbedderConfig(
        kind="encoder",
        # HW_ENC overrides the encoder checkpoint (e.g. the register-
        # augmented retrain, runs/demo_full_r4/encoder_augmented/).
        checkpoint_path=os.environ.get(
            "HW_ENC", str(WORK / "encoder/encoder.msgpack")))),
    resume=False,
)
n_corpus = sum(1 for line in open(WORK / "corpus.jsonl") if line.strip())
assert len(retriever) == n_corpus, "index/corpus size mismatch"
print(f"index rebuilt in {time.time()-t0:.1f}s", flush=True)

from flax import serialization
from rag_uq_tpu.llm.tiny_lm import TinyLMConfig
from rag_uq_tpu.llm.train import LMTrainConfig, TinyLMTrainer

lm_ckpt = os.environ.get("HW_LM", "models/tiny_lm/tiny_lm.msgpack")
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

router = RetrievalRouter()
# HW_ROUTER overrides the router checkpoint (e.g. the r4 retraining-probe
# gate, runs/demo_full_r3/router_r4probe_ref3/final_router.msgpack);
# HW_OUT overrides the results subdirectory so reruns don't clobber the
# "before" artifact.
router_ckpt = os.environ.get(
    "HW_ROUTER", str(WORK / "router/final_router.msgpack"))
RouterTrainer(router).load_checkpoint(router_ckpt)
OUT_SUB = os.environ.get("HW_OUT", "handwritten")

t0 = time.time()
# HW_MC=0 skips the MC-dropout pass (8x the generation cost): this split's
# quoted numbers are EM/F1/MRR/recall, not calibration, and on the 1-core
# CPU host (TPU outage fallback) MC dominates the multi-hour wall-clock.
results = run_evaluation(
    retriever, samples, llm=llm, router=router,
    mc_samples=int(os.environ.get("HW_MC", "8")),
    output_dir=str(WORK / "results" / OUT_SUB),
    # HW_POLICY=per_passage: one generation row per retrieved passage with
    # logprob selection (cli/evaluate.py context_policy) instead of the
    # reference's concat protocol.
    context_policy=os.environ.get("HW_POLICY", "concat"),
    # HW_CTX=1: the serving default (/answer top-1 evidence-backed context,
    # cli/serve.py) instead of the reference's top-3 concat protocol
    # (/root/reference/experiments/run_evaluation.py:189). Lets the eval
    # measure what a deployed user actually gets.
    context_passages=int(os.environ.get("HW_CTX", "3")),
)
print(f"evaluation in {time.time()-t0:.1f}s", flush=True)
out = {
    "n": len(samples),
    "retrieval": results["retrieval"],
    "generation": results["generation"],
}
path = WORK / f"results/{OUT_SUB}_eval.json"
path.write_text(json.dumps(out, indent=2))
print(json.dumps(out["generation"], indent=2))
print("wrote", path)
