"""Label-vs-gate diagnosis for the v2 router's lookup misrouting (round 5).

The v2 gate sends lookup queries to dense (mean gate 0.78) although dense
lookup MRR is 0.162 vs bm25 0.794 (results/ablation_v2). The decision BCE
target is derived from PSEUDO-label reciprocal rank per tower
(router/train.py::_label_rr, parity with reference router.py:520-561's
answer-overlap labels): if lookup answers are common strings that appear in
many passages, the dense tower gets spurious "relevant" hits and the label
vote teaches the gate the wrong arm.

This script quantifies that per family on the balanced fit pool:
  - label_vote: which tower the decision target picks (rr_d > rr_b on
    pseudo-labels) — what training SAYS
  - gold_vote: which tower ranks the GOLD passage higher (ids) — the truth
  - noise: fraction of queries whose best pseudo-relevant passage in the
    dense ranking is NOT gold
  - the trained v2 gate's mean per family

Usage: python scripts/router_gate_diag_r5.py [workdir]
Writes results/router_gate_diag.json.
"""
import json
import sys
import time
from collections import Counter, defaultdict
from pathlib import Path

import numpy as np

import jax

jax.config.update("jax_platforms", "cpu")
try:
    jax.extend.backend.clear_backends()
except Exception:
    pass

WORK = Path(sys.argv[1] if len(sys.argv) > 1 else "runs/demo_full_r4")
SEED = 0
NQ_CAP = 3000
CAL, TEST = 500, 1000
BALANCE_TARGET = 400
PER_FAMILY = 250

from rag_uq_tpu.core.config import Config, EmbedderConfig
from rag_uq_tpu.data.loaders import load_qa_jsonl
from rag_uq_tpu.router.labels import aligned_pseudo_labels

rows = load_qa_jsonl(str(WORK / "nq.jsonl"))
samples = rows[:NQ_CAP]
fit_rows = samples[CAL + TEST :]
extra_pool = rows[NQ_CAP:]


def fam(row):
    return (row.get("metadata") or {}).get("slice", "unk")


fit_fams = Counter(fam(r) for r in fit_rows)
extras = []
for family in ("inverse", "lookup"):
    need = max(0, BALANCE_TARGET - fit_fams[family])
    extras.extend([r for r in extra_pool if fam(r) == family][:need])
balanced = list(fit_rows) + extras

POOL = sys.argv[2] if len(sys.argv) > 2 else "fit"
source = balanced if POOL == "fit" else samples[CAL : CAL + TEST]
by_family = defaultdict(list)
for r in source:
    if len(by_family[fam(r)]) < PER_FAMILY:
        by_family[fam(r)].append(r)

from rag_uq_tpu.cli.build_index import build_index_from_jsonl

t0 = time.time()
retriever = build_index_from_jsonl(
    str(WORK / "corpus.jsonl"),
    checkpoint_path="/tmp/router_diag_index_checkpoint.json",
    bm25_persist_path=None,
    dense_persist_directory=None,
    config=Config(embedder=EmbedderConfig(
        kind="encoder", checkpoint_path=str(WORK / "encoder/encoder.msgpack"))),
    resume=False,
)
print(f"index rebuilt in {time.time()-t0:.1f}s", flush=True)

from rag_uq_tpu.router.model import RetrievalRouter
from rag_uq_tpu.router.train import RouterTrainer

router = RetrievalRouter()
RouterTrainer(router).load_checkpoint(
    str(WORK / "router_v2/final_router.msgpack"))
router.eval()


def tower_rr(scores, hit_mask):
    """Reciprocal rank of the first hit under one tower's scores
    (rank = 1 + #{strictly greater}), vectorized over the pool axis."""
    ranks = 1.0 + np.sum(scores[:, None, :] > scores[:, :, None], axis=-1)
    rr = np.where(hit_mask, 1.0 / ranks, 0.0)
    return rr.max(axis=-1)


out = {"per_family": {}, "protocol": {
    "pool": f"{POOL} pool, <=250 queries/family",
    "label_rule": "aligned_pseudo_labels >= 0.5 (the decision-BCE rule)",
}}
for family, fsamples in sorted(by_family.items()):
    qs = [s["question"] for s in fsamples]
    bm25, dense, ids, texts = retriever.get_scores_for_router_batch(
        qs, num_passages=20, pool_order="balanced")
    bm25 = np.asarray(bm25, np.float32)
    dense = np.asarray(dense, np.float32)
    n = len(fsamples)

    rel = np.zeros((n, 20), np.float32)
    gold_mask = np.zeros((n, 20), bool)
    for i, s in enumerate(fsamples):
        answers = s.get("answers") or [s.get("answer", "")]
        for ans in answers:
            rel[i] = np.maximum(rel[i], aligned_pseudo_labels(texts[i], ans))
        gold = set(s.get("gold_doc_ids") or [])
        gold_mask[i] = [pid in gold for pid in ids[i]]

    hit = rel >= 0.5
    rr_b_lab, rr_d_lab = tower_rr(bm25, hit), tower_rr(dense, hit)
    rr_b_gold, rr_d_gold = tower_rr(bm25, gold_mask), tower_rr(dense, gold_mask)

    lab_decisive = np.abs(rr_d_lab - rr_b_lab) > 1e-9
    gold_decisive = np.abs(rr_d_gold - rr_b_gold) > 1e-9
    lab_vote = rr_d_lab > rr_b_lab
    gold_vote = rr_d_gold > rr_b_gold

    # Noise: the dense tower's best pseudo-relevant passage is not gold.
    dense_order = np.argsort(-dense, axis=-1)
    noise = []
    for i in range(n):
        rel_sorted = hit[i][dense_order[i]]
        if rel_sorted.any():
            first = dense_order[i][int(np.argmax(rel_sorted))]
            noise.append(not gold_mask[i][first])
    w = np.asarray(router.forward(bm25, dense, update_stats=False))

    both = lab_decisive & gold_decisive
    out["per_family"][family] = {
        "n": n,
        "label_vote_dense_frac": round(
            float(lab_vote[lab_decisive].mean()) if lab_decisive.any() else -1, 3),
        "gold_vote_dense_frac": round(
            float(gold_vote[gold_decisive].mean()) if gold_decisive.any() else -1, 3),
        "label_gold_agreement": round(
            float((lab_vote[both] == gold_vote[both]).mean()) if both.any() else -1, 3),
        "decisive_frac_label": round(float(lab_decisive.mean()), 3),
        "decisive_frac_gold": round(float(gold_decisive.mean()), 3),
        "dense_first_hit_not_gold_frac": round(
            float(np.mean(noise)) if noise else -1, 3),
        "gold_in_pool_frac": round(float(gold_mask.any(axis=-1).mean()), 3),
        "trained_gate_mean": round(float(w.mean()), 4),
    }
    print(family, json.dumps(out["per_family"][family]), flush=True)

path = WORK / f"results/router_gate_diag_{POOL}.json"
path.write_text(json.dumps(out, indent=2))
print("wrote", path)
