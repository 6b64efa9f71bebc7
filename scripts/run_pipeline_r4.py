"""Round-4 full-scale pipeline run.

Changes vs runs/demo_full_r3 (VERDICT r3 next #5/#7):
- test=1000 (was 200): the lookup ablation slice reaches n~55 (>=50, so its
  MRR swings stop being noise) and every calibration bin reaches n>=30, making
  MCE a resolvable number instead of a binomial-noise cap.
- Router fit pool becomes samples[1500:] -- cal+test widen to 1500, so no
  leakage into the wider test window (run_pipeline slices fit after cal+test).
- alias_questions=3, lookup_questions=1: same mixed-register question family
  as r3 (lexical/semantic/lookup splits), ablation arms on.
- inverse_questions=1 (new in r4): inverse-direction family (question names a
  unique attribute value, answer is the entity name) so the router/extractor
  see the direction the hand-written hw_inverse slice probes (which measured
  recall@10=0.0 under the r3 router).
- router_features="pool7" (new in r4): the gate also sees within-pool
  z-scores and each tower's top1-top2 gap, the scale-invariant signals that
  identify rare-term needle queries; a reference3 control router is trained
  on the same arrays into router_reference3/ for attribution.

Usage: python scripts/run_pipeline_r4.py [workdir]  (TPU; ~40-60 min)
"""
import json
import sys
import time

sys.path.insert(0, "/root/repo")

from rag_uq_tpu.cli.run_pipeline import run_pipeline

workdir = sys.argv[1] if len(sys.argv) > 1 else "runs/demo_full_r4"
t0 = time.time()
summary = run_pipeline(
    workdir=workdir,
    scales={
        "articles": 5000,
        "nq": 3000,
        "cal": 500,
        "test": 1000,
        "epochs": 50,
        "lm_steps": 4000,
        "enc_steps": 2000,
        # r5: extractor retrained on v2+inverse+alias registers with the
        # gold-position curriculum (cli/train_lm.py --curriculum
        # --question-style v2 --inverse-q 1 --gold-first-prob 0.3); the r3
        # checkpoint at models/tiny_lm/ saw v1 phrasing only, which is the
        # measured cause of hw_novel/hw_inverse EM 0.0 (VERDICT r4 missing #1).
        "lm_checkpoint": "models/tiny_lm_r5/tiny_lm.msgpack",
    },
    # pool7 gate (plus a reference3 control checkpoint trained on the
    # same arrays in router_reference3/) — see router/model.py.
    router_features="pool7",
    # v2 question style: wider phrasing registers + the four article
    # attributes v1 never asks (the hand-written eval localized the
    # out-of-family EM collapse to exactly these two axes).
    question_style="v2",
    alias_questions=3,
    lookup_questions=1,
    inverse_questions=1,
    run_ablation=True,
    seed=0,
)
print(f"pipeline r4 done in {time.time()-t0:.0f}s", flush=True)
print(json.dumps({k: v for k, v in summary.items() if k != "results"},
                 indent=2, default=str))
