"""Round-5 full-scale pipeline run: the promoted honest-features recipe.

Changes vs scripts/run_pipeline_r4.py (all through run_pipeline parameters
— no out-of-band probe steps):
- router_features="v2": the full round-5 gate recipe (pool7 features,
  max-norm fuse, binary gate policy, auxiliary decision loss;
  core/config.router_recipe_v2) that first made the learned gate beat the
  best fixed arm.
- router_balance_target=400: inverse/lookup training families topped up
  from rows beyond the nq cap (run_pipeline.build_router_pool).
- enc_augment=3: surface-register variants in the contrastive pool
  (the handwritten dense-tower fix, VERDICT r4 #4).
- The router pool is held out of the encoder pool automatically
  (run_pipeline.encoder_pool — the round-5 honest-features fix; measured
  router capture 0.683 -> 0.959 on the r4 world, results/router_v3_probe).

This validates the promoted code path end-to-end: the r4-world probes
(runs/demo_full_r4/results/router_v3_probe.json) measured the same recipe
with script-local pool logic; this run must reproduce it from the
pipeline alone.

Usage: python scripts/run_pipeline_r5.py [workdir]  (TPU; ~50-70 min)
"""
import json
import sys
import time

sys.path.insert(0, "/root/repo")

from rag_uq_tpu.cli.run_pipeline import run_pipeline

workdir = sys.argv[1] if len(sys.argv) > 1 else "runs/demo_full_r5"
t0 = time.time()
summary = run_pipeline(
    workdir=workdir,
    scales={
        "articles": 5000,
        "nq": 3000,
        "cal": 500,
        "test": 1000,
        "epochs": 60,
        "lm_steps": 4000,
        "enc_steps": 2000,
        "enc_augment": 3,
        # r5 extractor: v2+inverse+alias registers, gold-position
        # curriculum (cli/train_lm.py; VERDICT r4 missing #1 fix).
        "lm_checkpoint": "models/tiny_lm_r5/tiny_lm.msgpack",
    },
    router_features="v2",
    router_balance_target=400,
    question_style="v2",
    alias_questions=3,
    lookup_questions=1,
    inverse_questions=1,
    run_ablation=True,
    seed=0,
)
print(f"pipeline r5 done in {time.time()-t0:.0f}s", flush=True)
print(json.dumps({k: v for k, v in summary.items() if k != "results"},
                 indent=2, default=str))
