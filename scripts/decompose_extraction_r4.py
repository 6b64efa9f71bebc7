"""Decompose the standalone-0.875 -> pipeline-0.49 extraction gap (r4).

VERDICT r3 next #4: the extractor's standalone hard-distractor EM is 0.875
but pipeline EM is 0.49 at retrieval recall@1 0.70 / recall@10 0.80 — where
does the ~0.2 go? This script measures the decomposition on the SAME 200
test queries the pipeline evaluated (nq.jsonl[cal:cal+test]), holding the
generator fixed and varying exactly one stage per condition:

  gold_ctx     context = the gold article text(s)      (extraction ceiling)
  gold_first   gold article first + 2 top retrieved distractors
               (the standalone hard-distractor protocol's shape)
  top1         top-1 retrieved passage only             (no concat effects)
  top3         pipeline protocol verbatim (router, top-3 concat, 2000 chars)

plus conditioning: EM | gold article in top-3 context vs not, per-slice
(lexical / semantic / lookup) and per-attribute register, and the
conjunctive-lookup share. Writes runs/demo_full_r3/results/extraction_decomposition.json.
"""
import json
import sys
import time
from collections import defaultdict
from pathlib import Path

import numpy as np

WORK = Path(sys.argv[1] if len(sys.argv) > 1 else "runs/demo_full_r3")
SEED = 0
CAL, TEST = 500, 200

from rag_uq_tpu.core.config import Config, EmbedderConfig
from rag_uq_tpu.data.loaders import load_qa_jsonl

samples = load_qa_jsonl(str(WORK / "nq.jsonl"))[CAL : CAL + TEST]
print(f"{len(samples)} test questions", flush=True)

from rag_uq_tpu.cli.build_index import build_index_from_jsonl

t0 = time.time()
retriever = build_index_from_jsonl(
    str(WORK / "corpus.jsonl"),
    checkpoint_path="/tmp/decomp_index_checkpoint.json",
    bm25_persist_path=None,
    dense_persist_directory=None,
    config=Config(embedder=EmbedderConfig(
        kind="encoder", checkpoint_path=str(WORK / "encoder/encoder.msgpack"))),
    resume=False,
)
print(f"index rebuilt in {time.time()-t0:.1f}s", flush=True)

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

from rag_uq_tpu.cli.evaluate import _router_order, _router_pool_width
from rag_uq_tpu.eval import metrics as M
from rag_uq_tpu.router.model import RetrievalRouter
from rag_uq_tpu.router.train import RouterTrainer

router = RetrievalRouter()
RouterTrainer(router).load_checkpoint(str(WORK / "router/final_router.msgpack"))

store = retriever.documents
pos_by_id = {store.ids[p]: p for p in range(len(store))}
questions = [s["question"] for s in samples]
answers = [s.get("answers") or [s.get("answer", "")] for s in samples]
gold_ids = [list(s.get("gold_doc_ids") or []) for s in samples]

# -- one batched retrieval pass (pipeline protocol: balanced pool + router) --
t0 = time.time()
pool_p = _router_pool_width(router, 10)
ret_ids = []
ret_texts = []
for s in range(0, len(questions), 128):
    chunk = questions[s : s + 128]
    b, d, c_ids, c_texts = retriever.get_scores_for_router_batch(
        chunk, num_passages=pool_p, pool_order="balanced"
    )
    w, order = _router_order(router, b, d)
    ret_ids.extend([row[j] for j in order[i]] for i, row in enumerate(c_ids))
    ret_texts.extend(
        [row[j] for j in order[i]] for i, row in enumerate(c_texts)
    )
print(f"retrieval in {time.time()-t0:.1f}s", flush=True)

def gen(contexts, tag=""):
    preds = []
    for s in range(0, len(contexts), 64):
        chunk_q = questions[s : s + 64]
        chunk_c = contexts[s : s + 64]
        from rag_uq_tpu.cli.evaluate import build_qa_prompt

        prompts = [build_qa_prompt(q, c) for q, c in zip(chunk_q, chunk_c)]
        preds.extend(llm.generate_batch(
            prompts, [0.1] * len(prompts), [0.9] * len(prompts), max_tokens=100
        ))
        print(f"[{time.strftime('%H:%M:%S')}] {tag} gen {s}/{len(contexts)}",
              flush=True)
    return preds

def em_of(preds, idx=None):
    idx = idx if idx is not None else range(len(preds))
    vals = [
        M.exact_match(preds[i], M.best_reference(preds[i], answers[i]))
        for i in idx
    ]
    return float(np.mean(vals)) if vals else None

# -- conditions ----------------------------------------------------------------
conds = {}
gold_texts = [
    " ".join(store.texts[pos_by_id[g]] for g in gset if g in pos_by_id)
    for gset in gold_ids
]
conds["gold_ctx"] = [t[:2000] for t in gold_texts]
conds["gold_first"] = [
    " ".join([gold_texts[i]] + [
        t for t, did in zip(ret_texts[i], ret_ids[i])
        if t and did not in gold_ids[i]
    ][:2])[:2000]
    for i in range(len(samples))
]
conds["top1"] = [
    " ".join(t for t in ret_texts[i][:1] if t)[:2000]
    for i in range(len(samples))
]
conds["top3"] = [
    " ".join(t for t in ret_texts[i][:3] if t)[:2000]
    for i in range(len(samples))
]

out = {"n": len(samples), "conditions": {}}
preds_by_cond = {}
path = WORK / "results/extraction_decomposition.json"
path.parent.mkdir(parents=True, exist_ok=True)
# Condition order = information density (a timeout-killed partial run still
# answers the headline question): extraction ceiling first, then the
# pipeline condition (needed for the conditioned analysis), then the
# single-variable probes. The partial JSON is rewritten after every
# condition; "partial": true is cleared only by the final full write.
for name in ("gold_ctx", "top3", "top1", "gold_first"):
    t0 = time.time()
    preds = gen(conds[name], tag=name)
    preds_by_cond[name] = preds
    out["conditions"][name] = {
        "exact_match": em_of(preds),
        "gen_s": round(time.time() - t0, 1),
    }
    print(name, out["conditions"][name], flush=True)
    out["partial"] = True
    path.write_text(json.dumps(out, indent=2))
del out["partial"]

# -- conditioning / slices ------------------------------------------------------
gold_in_top3 = [
    any(g in ret_ids[i][:3] for g in gold_ids[i]) for i in range(len(samples))
]
hit = [i for i, v in enumerate(gold_in_top3) if v]
miss = [i for i, v in enumerate(gold_in_top3) if not v]
out["top3_conditioned"] = {
    "gold_in_top3_rate": float(np.mean(gold_in_top3)),
    "em_given_gold_in_top3": em_of(preds_by_cond["top3"], hit),
    "em_given_gold_missing": em_of(preds_by_cond["top3"], miss),
}

for key in ("slice", "attribute"):
    groups = defaultdict(list)
    for i, s in enumerate(samples):
        groups[(s.get("metadata") or {}).get(key) or "?"].append(i)
    out[f"by_{key}"] = {
        k: {
            "n": len(idx),
            "top3_em": em_of(preds_by_cond["top3"], idx),
            "gold_ctx_em": em_of(preds_by_cond["gold_ctx"], idx),
            "gold_in_top3_rate": float(
                np.mean([gold_in_top3[i] for i in idx])
            ),
        }
        for k, idx in sorted(groups.items())
    }

path.write_text(json.dumps(out, indent=2))
print(json.dumps(out["conditions"], indent=2))
print(json.dumps(out["top3_conditioned"], indent=2))
print("wrote", path)
