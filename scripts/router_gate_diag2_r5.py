"""Controlled follow-up to router_gate_diag_r5: why does the fit pool's
dense tower look strong on lookup/inverse while the test window's doesn't?

One process, one index, identical math per group. Groups: test-window
lookups vs extra-pool (rows[3000:]) lookups, same for inverse. Each row is
also tagged with whether its ENTITY was exposed to the encoder via any
fit-window (rows[1500:3000]) training question, to test the entity-
exposure hypothesis directly inside the same pool.

Usage: python scripts/router_gate_diag2_r5.py [workdir]
Writes results/router_gate_diag2.json.
"""
import json
import sys
import time
from pathlib import Path

import numpy as np

import jax

jax.config.update("jax_platforms", "cpu")
try:
    jax.extend.backend.clear_backends()
except Exception:
    pass

WORK = Path(sys.argv[1] if len(sys.argv) > 1 else "runs/demo_full_r4")
NQ_CAP, CAL, TEST = 3000, 500, 1000

from rag_uq_tpu.core.config import Config, EmbedderConfig
from rag_uq_tpu.data.loaders import load_qa_jsonl

rows = load_qa_jsonl(str(WORK / "nq.jsonl"))
samples = rows[:NQ_CAP]
test_w = samples[CAL : CAL + TEST]
fit_w = samples[CAL + TEST :]
extra = rows[NQ_CAP:]


def fam(r):
    return (r.get("metadata") or {}).get("slice", "unk")


def ent(r):
    return (r.get("metadata") or {}).get("entity")


enc_entities = {ent(r) for r in fit_w if ent(r)}

groups = {}
for family in ("lookup", "inverse"):
    groups[f"test_{family}"] = [r for r in test_w if fam(r) == family]
    ex = [r for r in extra if fam(r) == family][:250]
    groups[f"extra_{family}"] = ex
    groups[f"extra_{family}_exposed"] = [r for r in ex if ent(r) in enc_entities]
    groups[f"extra_{family}_unexposed"] = [
        r for r in ex if ent(r) not in enc_entities]

from rag_uq_tpu.cli.build_index import build_index_from_jsonl

t0 = time.time()
retriever = build_index_from_jsonl(
    str(WORK / "corpus.jsonl"),
    checkpoint_path="/tmp/router_diag2_index_checkpoint.json",
    bm25_persist_path=None,
    dense_persist_directory=None,
    config=Config(embedder=EmbedderConfig(
        kind="encoder", checkpoint_path=str(WORK / "encoder/encoder.msgpack"))),
    resume=False,
)
print(f"index rebuilt in {time.time()-t0:.1f}s", flush=True)


def tower_rr(scores, hit_mask):
    ranks = 1.0 + np.sum(scores[:, None, :] > scores[:, :, None], axis=-1)
    rr = np.where(hit_mask, 1.0 / ranks, 0.0)
    return rr.max(axis=-1)


out = {"encoder_fit_entities": len(enc_entities), "groups": {}}
for name, fsamples in groups.items():
    if not fsamples:
        out["groups"][name] = {"n": 0}
        continue
    qs = [s["question"] for s in fsamples]
    bm25, dense, ids, texts = retriever.get_scores_for_router_batch(
        qs, num_passages=20, pool_order="balanced")
    bm25 = np.asarray(bm25, np.float32)
    dense = np.asarray(dense, np.float32)
    n = len(fsamples)
    gold_mask = np.zeros((n, 20), bool)
    n_gold = []
    for i, s in enumerate(fsamples):
        gold = set(s.get("gold_doc_ids") or [])
        n_gold.append(len(gold))
        gold_mask[i] = [pid in gold for pid in ids[i]]
    rr_b, rr_d = tower_rr(bm25, gold_mask), tower_rr(dense, gold_mask)
    decisive = np.abs(rr_d - rr_b) > 1e-9
    out["groups"][name] = {
        "n": n,
        "mean_gold_ids": round(float(np.mean(n_gold)), 2),
        "gold_in_pool_frac": round(float(gold_mask.any(-1).mean()), 3),
        "mean_rr_bm25": round(float(rr_b.mean()), 3),
        "mean_rr_dense": round(float(rr_d.mean()), 3),
        "decisive_frac": round(float(decisive.mean()), 3),
        "dense_vote_frac": round(
            float((rr_d > rr_b)[decisive].mean()) if decisive.any() else -1, 3),
        "both_rank1_frac": round(
            float(((rr_b == 1.0) & (rr_d == 1.0)).mean()), 3),
    }
    print(name, json.dumps(out["groups"][name]), flush=True)

path = WORK / "results/router_gate_diag2.json"
path.write_text(json.dumps(out, indent=2))
print("wrote", path)
