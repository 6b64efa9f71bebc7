"""Round-5 router recipe (v2) at scale: train on the balanced fit pool and
measure the three splits the routing story hangs on.

Context: runs/demo_full_r4/results/router_balanced_probe.json proved that
fit-pool balancing alone does NOT fix deployed routing (capture -0.66/-0.95)
— the offline diagnosis (this round) located the failure in the reference's
RAW-score fuse w*dense+(1-w)*bm25 (reference router.py:179-202): BM25 is
O(10-30) vs dense cosine O(1), so the fuse is BM25-dominated except at w≈1
and the per-passage gate can invert pool rankings arbitrarily. The v2
recipe (core/config.router_recipe_v2: pool7 features, max-norm fuse, binary
gate policy, auxiliary decision loss, tau=0.1) measured capture +0.69 on the
dumped pools. This script reruns that recipe through the REAL deployment
paths on three splits:

1. synthetic test window (n=1000): 6-arm ablation -> results/ablation_v2/
2. mixed workload (semantic + handwritten needles, the split with oracle
   headroom 0.15 where VERDICT r4 #7 wants capture >= 0.5)
   -> results/mixed_workload_v2/
3. handwritten out-of-family ablation -> results/hw_ablation_v2/

plus per-slice mean-gate diagnostics, into results/router_v2_probe.json.

CPU-forced: the router train is seconds on host and the ablations are
pool-sized; this leaves the TPU free for the generation/bench work.

Usage: python scripts/router_recipe_v2_probe_r5.py [workdir] [hw_jsonl]
"""
import json
import sys
import time
from collections import Counter
from pathlib import Path

import numpy as np

import jax

jax.config.update("jax_platforms", "cpu")
try:
    jax.extend.backend.clear_backends()
except Exception:
    pass

WORK = Path(sys.argv[1] if len(sys.argv) > 1 else "runs/demo_full_r4")
HW = Path(sys.argv[2] if len(sys.argv) > 2
          else "runs/demo_full_r3/handwritten_qa.jsonl")
SEED = 0
NQ_CAP = 3000
CAL, TEST = 500, 1000
BALANCE_TARGET = 400
EPOCHS = 60

from rag_uq_tpu.core.config import (
    Config, EmbedderConfig, TrainConfig, router_recipe_v2,
)
from rag_uq_tpu.data.loaders import load_qa_jsonl

rows = load_qa_jsonl(str(WORK / "nq.jsonl"))
samples = rows[:NQ_CAP]
test_samples = samples[CAL : CAL + TEST]
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
rng = np.random.default_rng(SEED)
rng.shuffle(balanced)
print(f"balanced fit pool: {dict(Counter(fam(r) for r in balanced))}",
      flush=True)

from rag_uq_tpu.cli.build_index import build_index_from_jsonl

t0 = time.time()
retriever = build_index_from_jsonl(
    str(WORK / "corpus.jsonl"),
    checkpoint_path="/tmp/router_v2_index_checkpoint.json",
    bm25_persist_path=None,
    dense_persist_directory=None,
    config=Config(embedder=EmbedderConfig(
        kind="encoder", checkpoint_path=str(WORK / "encoder/encoder.msgpack"))),
    resume=False,
)
print(f"index rebuilt in {time.time()-t0:.1f}s", flush=True)

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
rdir = WORK / "router_v2"
res = train_router(
    train, val,
    train_config=TrainConfig(num_epochs=EPOCHS, checkpoint_dir=str(rdir)),
    router_config=router_recipe_v2(), output_dir=str(rdir),
)
print(f"trained v2 router in {time.time()-t0:.1f}s "
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


out = {"recipe": "v2", "val_hit_at_1": res["val_hit_at_1"], "splits": {}}

# 1. Synthetic test window.
arms = run_ablation_study(
    retriever, test_samples, router=router,
    output_dir=str(WORK / "results/ablation_v2"),
)
out["splits"]["synthetic_test"] = slim(arms)
out["splits"]["synthetic_test"]["mean_gate_by_slice"] = mean_gate_by_slice(
    test_samples)
print("synthetic:", json.dumps(out["splits"]["synthetic_test"]), flush=True)

# 2. Mixed workload (same construction as scripts/mixed_workload_ablation.py).
hw = load_qa_jsonl(str(HW))
semantic = [s for s in test_samples
            if (s.get("metadata") or {}).get("slice") == "semantic"]
n_half = min(len(semantic), len(hw))
mixed = semantic[:n_half] + hw[:n_half]
arms = run_ablation_study(
    retriever, mixed, router=router,
    output_dir=str(WORK / "results/mixed_workload_v2"),
)
out["splits"]["mixed_workload"] = slim(arms)
print("mixed:", json.dumps(out["splits"]["mixed_workload"]), flush=True)

# 3. Handwritten out-of-family.
arms = run_ablation_study(
    retriever, hw, router=router,
    output_dir=str(WORK / "results/hw_ablation_v2"),
)
out["splits"]["handwritten"] = slim(arms)
out["splits"]["handwritten"]["mean_gate_by_slice"] = mean_gate_by_slice(hw)
print("handwritten:", json.dumps(out["splits"]["handwritten"]), flush=True)

path = WORK / "results/router_v2_probe.json"
path.write_text(json.dumps(out, indent=2))
print("wrote", path)
