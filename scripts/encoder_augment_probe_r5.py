"""Register-augmented encoder retrain probe (VERDICT r4 next #4).

The r4 pipeline run trained its encoder WITHOUT register augmentation
(scripts/run_pipeline_r4.py leaves enc_augment at 0), so the dense tower's
out-of-family weakness likely persists (r3 encoder: handwritten dense_only
MRR 0.351 / recall@10 0.467 vs synthetic 0.725+). This probe isolates the
encoder question: retrain the SAME contrastive encoder on the SAME pool
with augment_registers(variants_per_query=ENC_AUG) surface-register
variants (embed/train.py), then measure the retrieval-only arms on

  (a) the 105-question handwritten split   (target: dense_only r@10 >= 0.7)
  (b) the synthetic test window [500:1500) (target: no dense regression)

against the committed no-augment artifacts
(results/handwritten_ablation & results/ablation). Mirrors the pipeline's
enc_pool construction exactly: cal/test question ids excluded, held-out
lookup entities' paraphrases excluded (memorization guard, run_pipeline.py
Step 2.5).

Writes <work>/results/encoder_augment_probe.json and the checkpoint under
<work>/encoder_augmented/.

Usage: python scripts/encoder_augment_probe_r5.py [workdir] [variants]
"""
import json
import sys
import time
from pathlib import Path

WORK = Path(sys.argv[1] if len(sys.argv) > 1 else "runs/demo_full_r4")
ENC_AUG = int(sys.argv[2]) if len(sys.argv) > 2 else 3
SEED = 0
NQ_CAP = 3000
CAL, TEST = 500, 1000
ENC_STEPS = 2000

from rag_uq_tpu.core.config import Config, EmbedderConfig
from rag_uq_tpu.data.loaders import load_qa_jsonl

rows = load_qa_jsonl(str(WORK / "nq.jsonl"))
samples = rows[:NQ_CAP]
cal_test = samples[: CAL + TEST]
test_samples = samples[CAL : CAL + TEST]
hw_samples = load_qa_jsonl(str(WORK / "handwritten_qa.jsonl"))

held_ids = {s["id"] for s in cal_test if "id" in s}
held_lookup_entities = {
    (s.get("metadata") or {}).get("entity")
    for s in cal_test
    if (s.get("metadata") or {}).get("slice") == "lookup"
}
enc_pool = [
    s for s in rows
    if s.get("id") not in held_ids
    and not (
        (s.get("metadata") or {}).get("slice") == "lookup"
        and (s.get("metadata") or {}).get("entity") in held_lookup_entities
    )
]
enc_queries = [s["question"] for s in enc_pool]
enc_passages = [s.get("context", "") for s in enc_pool]

from rag_uq_tpu.embed.train import (
    ContrastiveTrainer,
    EncoderTrainConfig,
    augment_registers,
)
from rag_uq_tpu.embed.encoder import EncoderConfig

aug_q, aug_src = augment_registers(
    enc_queries, seed=SEED, variants_per_query=ENC_AUG
)
queries = enc_queries + aug_q
passages = enc_passages + [enc_passages[i] for i in aug_src]
print(f"enc pool {len(enc_pool)} + {len(aug_q)} augmented", flush=True)

t0 = time.time()
trainer = ContrastiveTrainer(
    config=EncoderTrainConfig(
        total_steps=ENC_STEPS,
        batch_size=min(256, max(len(enc_pool) // 2, 8)),
        seed=SEED,
    ),
    encoder_config=EncoderConfig(
        dim=256, num_layers=2, num_heads=8, mlp_dim=1024,
        max_seq_len=64, vocab_buckets=1 << 14,
    ),
)
losses = trainer.fit(queries, passages, log_every=200)
enc_dir = WORK / "encoder_augmented"
enc_dir.mkdir(parents=True, exist_ok=True)
enc_ckpt = str(enc_dir / "encoder.msgpack")
trainer.save_checkpoint(enc_ckpt)
train_s = time.time() - t0
print(f"encoder trained in {train_s:.0f}s final loss {losses[-1]:.4f}",
      flush=True)

from rag_uq_tpu.cli.build_index import build_index_from_jsonl
from rag_uq_tpu.cli.evaluate import run_ablation_study

t0 = time.time()
retriever = build_index_from_jsonl(
    str(WORK / "corpus.jsonl"),
    checkpoint_path="/tmp/enc_aug_index_checkpoint.json",
    bm25_persist_path=None,
    dense_persist_directory=None,
    config=Config(embedder=EmbedderConfig(kind="encoder",
                                          checkpoint_path=enc_ckpt)),
    resume=False,
)
print(f"index rebuilt in {time.time()-t0:.1f}s", flush=True)


def arm_summary(arms):
    out = {}
    for arm in ("bm25_only", "dense_only", "fixed_hybrid_balanced"):
        m = arms[arm]
        out[arm] = {
            "mrr": m["mrr"],
            "recall@10": m["recall@k"].get(10, m["recall@k"].get("10")),
            "by_slice": {
                sl: {"mrr": v["mrr"],
                     "recall@10": v["recall@k"].get(10, v["recall@k"].get("10"))}
                for sl, v in (m.get("by_slice") or {}).items()
            },
        }
    return out


out = {
    "variants_per_query": ENC_AUG,
    "augmented_pairs": len(aug_q),
    "final_loss": losses[-1],
    "encoder_train_s": round(train_s, 1),
    "checkpoint": enc_ckpt,
}
hw_arms = run_ablation_study(
    retriever, hw_samples,
    output_dir=str(WORK / "results/hw_ablation_enc_aug"),
)
out["handwritten"] = arm_summary(hw_arms)
print("handwritten:", json.dumps(out["handwritten"]["dense_only"]), flush=True)

syn_arms = run_ablation_study(
    retriever, test_samples,
    output_dir=str(WORK / "results/ablation_enc_aug"),
)
out["synthetic"] = arm_summary(syn_arms)
print("synthetic:", json.dumps(out["synthetic"]["dense_only"]), flush=True)

path = WORK / "results/encoder_augment_probe.json"
path.write_text(json.dumps(out, indent=2))
print("wrote", path)
