"""Finish the register-augmented encoder probe (phase-3 crash recovery).

scripts/encoder_augment_probe_r5.py trained and saved the augmented
encoder (runs/demo_full_r4/encoder_augmented/) and measured the
handwritten split (dense_only MRR 0.351 -> 0.586, recall@10 0.467 ->
0.705) but crashed on a TPU relay error before the synthetic regression
check. This script resumes from the saved checkpoint: rebuilds the index
(CPU-forced — ablations are pool-sized), reruns BOTH ablations, and
writes the complete results/encoder_augment_probe.json.

Usage: python scripts/encoder_augment_finish_r5.py [workdir]
"""
import json
import sys
import time
from pathlib import Path

import jax

jax.config.update("jax_platforms", "cpu")
try:
    jax.extend.backend.clear_backends()
except Exception:
    pass

WORK = Path(sys.argv[1] if len(sys.argv) > 1 else "runs/demo_full_r4")
CAL, TEST = 500, 1000

from rag_uq_tpu.core.config import Config, EmbedderConfig
from rag_uq_tpu.data.loaders import load_qa_jsonl

rows = load_qa_jsonl(str(WORK / "nq.jsonl"))
test_samples = rows[CAL : CAL + TEST]
hw_samples = load_qa_jsonl(str(WORK / "handwritten_qa.jsonl"))

enc_ckpt = str(WORK / "encoder_augmented/encoder.msgpack")

from rag_uq_tpu.cli.build_index import build_index_from_jsonl
from rag_uq_tpu.cli.evaluate import run_ablation_study

t0 = time.time()
retriever = build_index_from_jsonl(
    str(WORK / "corpus.jsonl"),
    checkpoint_path="/tmp/enc_aug_finish_checkpoint.json",
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
    "checkpoint": enc_ckpt,
    "resumed_from": "encoder_augment_probe_r5.py phase-3 crash",
}
hw_arms = run_ablation_study(
    retriever, hw_samples,
    output_dir=str(WORK / "results/hw_ablation_enc_aug"),
)
out["handwritten"] = arm_summary(hw_arms)
print("handwritten dense:", json.dumps(out["handwritten"]["dense_only"]),
      flush=True)

syn_arms = run_ablation_study(
    retriever, test_samples,
    output_dir=str(WORK / "results/ablation_enc_aug"),
)
out["synthetic"] = arm_summary(syn_arms)
print("synthetic dense:", json.dumps(out["synthetic"]["dense_only"]),
      flush=True)

path = WORK / "results/encoder_augment_probe.json"
path.write_text(json.dumps(out, indent=2))
print("wrote", path)
