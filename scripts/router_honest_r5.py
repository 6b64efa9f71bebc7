"""Honest-feature router retrain (round 5): carve the router fit pool out
of the encoder's contrastive training pool.

Root cause (results/router_gate_diag2.json + pipeline_summary.json): the
pipeline encoder trains on EVERY non-cal/test QA row (train_pool 24,792),
so the router's balanced fit pool — fit rows plus inverse/lookup extras
drawn from rows[3000:] — is encoder-MEMORIZED: dense gold RR ~1.0 on the
extras regardless of entity exposure, vs 0.10-0.20 on the truly held-out
test window. The gate therefore learns lookup/inverse->dense from
memorization-inflated features and misroutes at test time (lookup MRR
0.339 routed vs 0.794 bm25; results/router_v2_probe.json).

Fix measured here: retrain the SAME encoder (register augmentation ON,
variants=3, matching the deployed best-stack encoder_augmented) with the
router pool's question ids excluded, then retrain the v2-recipe router on
the now-honest features and re-measure the three splits. Also emits the
diag2 honesty check: per-family dense gold RR on the router pool must now
match the test window.

Runs on the default (TPU) platform — encoder training is the long pole.

Usage: python scripts/router_honest_r5.py [workdir]
Writes results/router_v3_probe.json, encoder_honest/, router_v3/.
"""
import json
import sys
import time
from collections import Counter
from pathlib import Path

import numpy as np

WORK = Path(sys.argv[1] if len(sys.argv) > 1 else "runs/demo_full_r4")
SEED = 0
NQ_CAP = 3000
CAL, TEST = 500, 1000
BALANCE_TARGET = 400
EPOCHS = 60
ENC_AUG = 3

from rag_uq_tpu.core.config import (
    Config, EmbedderConfig, TrainConfig, router_recipe_v2,
)
from rag_uq_tpu.data.loaders import load_qa_jsonl

rows = load_qa_jsonl(str(WORK / "nq.jsonl"))
samples = rows[:NQ_CAP]
cal_test = samples[: CAL + TEST]
test_samples = samples[CAL : CAL + TEST]
fit_rows = samples[CAL + TEST :]
extra_pool = rows[NQ_CAP:]
hw_samples = load_qa_jsonl(str(WORK / "handwritten_qa.jsonl"))


def fam(row):
    return (row.get("metadata") or {}).get("slice", "unk")


def ent(row):
    return (row.get("metadata") or {}).get("entity")


# Router fit pool: identical construction to router_recipe_v2_probe_r5.
fit_fams = Counter(fam(r) for r in fit_rows)
extras = []
for family in ("inverse", "lookup"):
    need = max(0, BALANCE_TARGET - fit_fams[family])
    extras.extend([r for r in extra_pool if fam(r) == family][:need])
balanced = list(fit_rows) + extras
rng = np.random.default_rng(SEED)
rng.shuffle(balanced)
print(f"router pool: {dict(Counter(fam(r) for r in balanced))}", flush=True)

# Encoder pool: run_pipeline's rule (all rows minus cal/test ids minus
# held-out lookup-entity conjunction paraphrases) MINUS the router pool —
# the fix under test. The same lookup-entity guard is applied for router-
# pool lookups (a no-op at lookup_questions=1, correct above it).
held_ids = {s["id"] for s in cal_test if "id" in s}
router_ids = {s["id"] for s in balanced if "id" in s}
guard_lookup_entities = {
    ent(s) for s in list(cal_test) + balanced if fam(s) == "lookup"
}
enc_pool = [
    s for s in rows
    if s.get("id") not in held_ids
    and s.get("id") not in router_ids
    and not (fam(s) == "lookup" and ent(s) in guard_lookup_entities)
]
print(f"encoder pool {len(enc_pool)} (was 24792 with the router-pool leak)",
      flush=True)

from rag_uq_tpu.embed.encoder import EncoderConfig
from rag_uq_tpu.embed.train import (
    ContrastiveTrainer, EncoderTrainConfig, augment_registers,
)

enc_queries = [s["question"] for s in enc_pool]
enc_passages = [s.get("context", "") for s in enc_pool]
aug_q, aug_src = augment_registers(
    enc_queries, seed=SEED, variants_per_query=ENC_AUG)
queries = enc_queries + aug_q
passages = enc_passages + [enc_passages[i] for i in aug_src]
print(f"enc pairs {len(enc_pool)} + {len(aug_q)} augmented", flush=True)

t0 = time.time()
trainer = ContrastiveTrainer(
    config=EncoderTrainConfig(
        total_steps=2000,
        batch_size=min(256, max(len(enc_pool) // 2, 8)),
        seed=SEED,
    ),
    encoder_config=EncoderConfig(
        dim=256, num_layers=2, num_heads=8, mlp_dim=1024,
        max_seq_len=64, vocab_buckets=1 << 14,
    ),
)
losses = trainer.fit(queries, passages, log_every=200)
enc_dir = WORK / "encoder_honest"
enc_dir.mkdir(parents=True, exist_ok=True)
enc_ckpt = str(enc_dir / "encoder.msgpack")
trainer.save_checkpoint(enc_ckpt)
enc_train_s = time.time() - t0
print(f"encoder trained in {enc_train_s:.0f}s final loss {losses[-1]:.4f}",
      flush=True)

from rag_uq_tpu.cli.build_index import build_index_from_jsonl

t0 = time.time()
retriever = build_index_from_jsonl(
    str(WORK / "corpus.jsonl"),
    checkpoint_path="/tmp/router_v3_index_checkpoint.json",
    bm25_persist_path=None,
    dense_persist_directory=None,
    config=Config(embedder=EmbedderConfig(
        kind="encoder", checkpoint_path=enc_ckpt)),
    resume=False,
)
print(f"index built in {time.time()-t0:.1f}s", flush=True)


def tower_rr_check(group):
    """diag2's math: per-family mean dense/bm25 gold RR within the pool."""
    by_family = {}
    for family in ("lookup", "inverse", "lexical", "semantic"):
        fsamples = [r for r in group if fam(r) == family][:250]
        if not fsamples:
            continue
        bm25, dense, ids, _ = retriever.get_scores_for_router_batch(
            [s["question"] for s in fsamples], num_passages=20,
            pool_order="balanced")
        bm25 = np.asarray(bm25, np.float32)
        dense = np.asarray(dense, np.float32)
        gold_mask = np.zeros(bm25.shape, bool)
        for i, s in enumerate(fsamples):
            gold = set(s.get("gold_doc_ids") or [])
            gold_mask[i] = [pid in gold for pid in ids[i]]
        ranks = lambda sc: 1.0 + np.sum(
            sc[:, None, :] > sc[:, :, None], axis=-1)
        rr = lambda sc: np.where(gold_mask, 1.0 / ranks(sc), 0.0).max(-1)
        by_family[family] = {
            "n": len(fsamples),
            "mean_rr_bm25": round(float(rr(bm25).mean()), 3),
            "mean_rr_dense": round(float(rr(dense).mean()), 3),
        }
    return by_family


honesty = {
    "router_pool": tower_rr_check(balanced),
    "test_window": tower_rr_check(test_samples),
}
print("honesty check:", json.dumps(honesty), flush=True)

from rag_uq_tpu.cli.evaluate import run_ablation_study
from rag_uq_tpu.cli.train_router import prepare_training_data, train_router
from rag_uq_tpu.router.model import RetrievalRouter
from rag_uq_tpu.router.train import RouterTrainer

t0 = time.time()
split = int(0.9 * len(balanced))
train = prepare_training_data(retriever, balanced[:split])
val = prepare_training_data(retriever, balanced[split:])
print(f"training data in {time.time()-t0:.1f}s", flush=True)

t0 = time.time()
rdir = WORK / "router_v3"
res = train_router(
    train, val,
    train_config=TrainConfig(num_epochs=EPOCHS, checkpoint_dir=str(rdir)),
    router_config=router_recipe_v2(), output_dir=str(rdir),
)
print(f"trained v3 router in {time.time()-t0:.1f}s "
      f"val_hit@1={res['val_hit_at_1']}", flush=True)

router = RetrievalRouter()
RouterTrainer(router).load_checkpoint(str(rdir / "final_router.msgpack"))


def mean_gate_by_slice(samples_):
    router.eval()
    ws, fams = [], [fam(r) for r in samples_]
    for s in range(0, len(samples_), 512):
        chunk = samples_[s : s + 512]
        bm25, dense, _ids, _texts = retriever.get_scores_for_router_batch(
            [c["question"] for c in chunk], num_passages=20,
            pool_order="balanced",
        )
        w = np.asarray(router.forward(
            np.asarray(bm25, np.float32), np.asarray(dense, np.float32),
            update_stats=False,
        ))
        ws.append(w.mean(axis=-1))
    w_all = np.concatenate(ws)
    return {f: round(float(w_all[np.asarray([x == f for x in fams])].mean()), 4)
            for f in sorted(set(fams))}


def slim(arms):
    lr = arms["learned_router"]
    return {
        "mrr": lr["mrr"],
        "router_accuracy": lr.get("router_accuracy"),
        "by_slice": {
            sl: {"mrr": m["mrr"],
                 "recall@10": m["recall@k"].get(10, m["recall@k"].get("10"))}
            for sl, m in (lr.get("by_slice") or {}).items()
        },
        "headroom": arms.get("headroom"),
    }


out = {
    "recipe": "v2 gate, honest features (encoder holds out the router pool)",
    "encoder_pool": len(enc_pool),
    "augmented_pairs": len(aug_q),
    "encoder_train_s": round(enc_train_s, 1),
    "val_hit_at_1": res["val_hit_at_1"],
    "honesty_check": honesty,
    "splits": {},
}

arms = run_ablation_study(
    retriever, test_samples, router=router,
    output_dir=str(WORK / "results/ablation_v3"),
)
out["splits"]["synthetic_test"] = slim(arms)
out["splits"]["synthetic_test"]["dense_only_mrr"] = arms["dense_only"]["mrr"]
out["splits"]["synthetic_test"]["mean_gate_by_slice"] = mean_gate_by_slice(
    test_samples)
print("synthetic:", json.dumps(out["splits"]["synthetic_test"]), flush=True)

semantic = [s for s in test_samples if fam(s) == "semantic"]
n_half = min(len(semantic), len(hw_samples))
mixed = semantic[:n_half] + hw_samples[:n_half]
arms = run_ablation_study(
    retriever, mixed, router=router,
    output_dir=str(WORK / "results/mixed_workload_v3"),
)
out["splits"]["mixed_workload"] = slim(arms)
print("mixed:", json.dumps(out["splits"]["mixed_workload"]), flush=True)

arms = run_ablation_study(
    retriever, hw_samples, router=router,
    output_dir=str(WORK / "results/hw_ablation_v3"),
)
out["splits"]["handwritten"] = slim(arms)
out["splits"]["handwritten"]["dense_only_mrr"] = arms["dense_only"]["mrr"]
out["splits"]["handwritten"]["mean_gate_by_slice"] = mean_gate_by_slice(
    hw_samples)
print("handwritten:", json.dumps(out["splits"]["handwritten"]), flush=True)

path = WORK / "results/router_v3_probe.json"
path.write_text(json.dumps(out, indent=2))
print("wrote", path)
