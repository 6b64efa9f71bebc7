"""Family-balanced router retrain probe over the r4 pipeline artifacts.

The committed runs/demo_full_r4 ablation exposed a routing failure the
pipeline's own router_accuracy 0.912 hides: on the n=1000 synthetic test
window the per-slice best arms strongly oppose (inverse/lookup: bm25 0.944 /
0.794 vs dense 0.042 / 0.165; semantic: dense 0.878 vs bm25 0.003), the
oracle (0.908 MRR) beats the best fixed arm (dense_only 0.822) by 0.087 —
yet the deployed gate lands at 0.742 (inverse 0.263, lookup 0.245,
semantic 0.674). Hypothesis: the pipeline's fit pool (samples[1500:3000],
the natural family mix) contains only ~6% inverse and ~3% lookup rows, so
the ApproxNDCG gradient is dominated by the majority families and the gate
never learns to saturate on the minority directions — the same failure mode
the round-4 handwritten probe fixed by changing the *training families*
(runs/demo_full_r3/results/handwritten_router_r4_probe.json).

Protocol (identical arrays/optimizer to cli/run_pipeline.py's router stage;
only the fit-pool composition changes):
- samples = nq.jsonl[:3000] with the pipeline split: cal [0:500),
  test [500:1500), fit [1500:3000) — cal/test untouched.
- Balanced fit pool: fit + additional inverse/lookup rows drawn from
  nq.jsonl[3000:], which the pipeline never reads (no cal/test leakage;
  the reference itself trains on its full NQ pool,
  /root/reference/experiments/run_router_training.py:57-118), topping each
  minority family up to BALANCE_TARGET rows, then reshuffled.
- pool7 router + reference3 control trained on the SAME arrays (attribution,
  VERDICT r4 #6), 50 epochs, TrainConfig defaults.
- 6-arm ablation rerun on the SAME test window with each retrained gate,
  plus a mean-gate-per-slice diagnostic (is the fix gate saturation?).

Writes <work>/results/router_balanced_probe.json and checkpoints under
<work>/router_balanced_{pool7,ref3}/.

Usage: python scripts/router_balance_probe_r5.py [workdir]
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
BALANCE_TARGET = 400  # per minority family, bounded by availability
EPOCHS = 50

from rag_uq_tpu.core.config import Config, EmbedderConfig, RouterConfig
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
    pool = [r for r in extra_pool if fam(r) == family]
    extras.extend(pool[:need])
balanced = list(fit_rows) + extras
rng = np.random.default_rng(SEED)
rng.shuffle(balanced)
print(
    f"fit {len(fit_rows)} {dict(fit_fams)} + {len(extras)} extras -> "
    f"{len(balanced)} {dict(Counter(fam(r) for r in balanced))}",
    flush=True,
)

from rag_uq_tpu.cli.build_index import build_index_from_jsonl

t0 = time.time()
retriever = build_index_from_jsonl(
    str(WORK / "corpus.jsonl"),
    checkpoint_path="/tmp/router_balance_index_checkpoint.json",
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
from rag_uq_tpu.router.train import RouterTrainer, TrainConfig

t0 = time.time()
split = int(0.9 * len(balanced))
train = prepare_training_data(retriever, balanced[:split])
val = prepare_training_data(retriever, balanced[split:])
print(f"training data in {time.time()-t0:.1f}s", flush=True)


def mean_gate_by_slice(router: RetrievalRouter) -> dict:
    """Mean per-query gate weight w on the test window, by family: shows
    whether a routing gain comes from the gate actually saturating toward
    the per-slice better tower (w->1 dense, w->0 bm25)."""
    router.eval()
    out, bs = {}, 512
    ws, fams = [], [fam(r) for r in test_samples]
    for s in range(0, len(test_samples), bs):
        chunk = test_samples[s : s + bs]
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
    for family in sorted(set(fams)):
        mask = np.asarray([f == family for f in fams])
        out[family] = round(float(w_all[mask].mean()), 4)
    return out


out = {
    "n_fit_balanced": len(balanced),
    "fit_family_counts": dict(Counter(fam(r) for r in balanced)),
    "baseline_pipeline_router": {},
    "arms": {},
}

# Diagnostic on the deployed (imbalanced-fit) pipeline router first.
base_router = RetrievalRouter(RouterConfig(feature_set="pool7"))
RouterTrainer(base_router).load_checkpoint(
    str(WORK / "router/final_router.msgpack"))
out["baseline_pipeline_router"]["mean_gate_by_slice"] = mean_gate_by_slice(
    base_router)
print("baseline gate:", out["baseline_pipeline_router"], flush=True)

for tag, cfg in (
    ("pool7", RouterConfig(feature_set="pool7")),
    ("ref3", None),
):
    t0 = time.time()
    rdir = WORK / f"router_balanced_{tag}"
    res = train_router(
        train, val,
        train_config=TrainConfig(num_epochs=EPOCHS, checkpoint_dir=str(rdir)),
        router_config=cfg, output_dir=str(rdir),
    )
    router = RetrievalRouter()
    RouterTrainer(router).load_checkpoint(str(rdir / "final_router.msgpack"))
    arms = run_ablation_study(
        retriever, test_samples, router=router,
        output_dir=str(WORK / f"results/ablation_balanced_{tag}"),
    )
    lr = arms["learned_router"]
    out["arms"][tag] = {
        "val_hit_at_1": res["val_hit_at_1"],
        "train_s": round(time.time() - t0, 1),
        "mrr": lr["mrr"],
        "router_accuracy": lr.get("router_accuracy"),
        "by_slice": {
            sl: {"mrr": m["mrr"],
                 "recall@10": m["recall@k"].get(10, m["recall@k"].get("10"))}
            for sl, m in (lr.get("by_slice") or {}).items()
        },
        "headroom": arms.get("headroom"),
        "mean_gate_by_slice": mean_gate_by_slice(router),
    }
    print(tag, json.dumps(out["arms"][tag]), flush=True)

path = WORK / "results/router_balanced_probe.json"
path.write_text(json.dumps(out, indent=2))
print("wrote", path)
