"""Does an r4-retrained router fix the out-of-family misrouting? CPU probe.

The hand-written per-arm ablation
(runs/demo_full_r3/results/handwritten_ablation/) measured bm25_only
MRR 0.956 — the oracle-router ceiling — against the deployed r3 router's
0.379 with router-vs-oracle accuracy 0.0: the r3 gate, trained only on the
lexical/semantic/lookup families with the reference's 3 global-EMA
features, routes every out-of-family query to the dense tower. This probe
answers, without waiting for the full TPU pipeline run: does the ROUTER
STAGE ALONE, retrained the r4 way (inverse-direction family + v2 question
registers in the training questions, pool7 pool-context features), route
the hand-written split correctly?

Protocol (mirrors cli/run_pipeline.py's router stage exactly):
- same corpus + trained encoder as runs/demo_full_r3,
- r4-style question set over the same seed-0 world
  (questions_per_entity=2, alias 3, lookup 1, inverse 1, style v2),
  shuffled with the pipeline rng, nq cap 3000, fit pool = rows[1500:]
  (the widened r4 cal+test window is excluded, like the pipeline),
- balanced-pool score matrices + pseudo-labels (prepare_training_data),
- a pool7 router and a reference3 control trained on the SAME arrays,
- the 6-arm handwritten ablation rerun with each trained gate.

Writes runs/demo_full_r3/results/handwritten_router_r4_probe.json and the
per-arm artifacts under results/handwritten_ablation_r4probe_{pool7,ref3}/.
"""
import json
import sys
import time
from pathlib import Path

import numpy as np

WORK = Path(sys.argv[1] if len(sys.argv) > 1 else "runs/demo_full_r3")
SEED = 0
NQ_CAP = 3000
HOLDOUT = 1500  # r4 cal+test window (500 + 1000)
EPOCHS = 50

from rag_uq_tpu.core.config import Config, EmbedderConfig, RouterConfig
from rag_uq_tpu.data.loaders import load_qa_jsonl
from rag_uq_tpu.data.synth_wiki import generate_world

hw_samples = load_qa_jsonl(str(WORK / "handwritten_qa.jsonl"))
print(f"{len(hw_samples)} handwritten questions", flush=True)

t0 = time.time()
world = generate_world(
    5000, seed=SEED, questions_per_entity=2,
    alias_questions_per_entity=3, lookup_questions_per_entity=1,
    inverse_questions_per_entity=1, question_style="v2",
)
rng = np.random.default_rng(SEED)
qa_rows = world.qa_rows()
rng.shuffle(qa_rows)
fit_rows = qa_rows[HOLDOUT:NQ_CAP]
print(f"world + {len(fit_rows)} fit questions in {time.time()-t0:.1f}s",
      flush=True)

from rag_uq_tpu.cli.build_index import build_index_from_jsonl

t0 = time.time()
retriever = build_index_from_jsonl(
    str(WORK / "corpus.jsonl"),
    checkpoint_path="/tmp/router_probe_index_checkpoint.json",
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
split = int(0.9 * len(fit_rows))
train = prepare_training_data(retriever, fit_rows[:split])
val = prepare_training_data(retriever, fit_rows[split:])
print(f"training data in {time.time()-t0:.1f}s", flush=True)

out = {"n_fit": len(fit_rows), "arms": {}}
for tag, cfg in (
    ("pool7", RouterConfig(feature_set="pool7")),
    ("ref3", None),
):
    t0 = time.time()
    rdir = WORK / f"router_r4probe_{tag}"
    res = train_router(
        train, val,
        train_config=TrainConfig(num_epochs=EPOCHS, checkpoint_dir=str(rdir)),
        router_config=cfg, output_dir=str(rdir),
    )
    router = RetrievalRouter()
    RouterTrainer(router).load_checkpoint(str(rdir / "final_router.msgpack"))
    arms = run_ablation_study(
        retriever, hw_samples, router=router,
        output_dir=str(WORK / f"results/handwritten_ablation_r4probe_{tag}"),
    )
    lr = arms["learned_router"]
    out["arms"][tag] = {
        "val_hit_at_1": res["val_hit_at_1"],
        "train_s": round(time.time() - t0, 1),
        "hw_mrr": lr["mrr"],
        "hw_router_accuracy": lr.get("router_accuracy"),
        "hw_by_slice": {
            # recall@k keys are ints in memory, strings after a JSON trip.
            sl: {"mrr": m["mrr"],
                 "recall@10": m["recall@k"].get(10, m["recall@k"].get("10"))}
            for sl, m in (lr.get("by_slice") or {}).items()
        },
        "headroom": arms.get("headroom"),
    }
    print(tag, json.dumps(out["arms"][tag]), flush=True)

path = WORK / "results/handwritten_router_r4_probe.json"
path.write_text(json.dumps(out, indent=2))
print("wrote", path)
