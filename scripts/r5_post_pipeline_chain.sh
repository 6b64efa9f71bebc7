#!/bin/bash
# Round-5 post-pipeline measurement chain. Waits for the pipeline PID to
# exit, then runs every decision-free TPU measurement sequentially so the
# chip never idles between stages. Each stage logs to /tmp/r5_<stage>.log.
# Usage: scripts/r5_post_pipeline_chain.sh [pipeline_pid]
set -u
cd /root/repo
# scripts/*.py put scripts/ (not the repo root) on sys.path[0]; the package
# import needs the repo root. Append — never overwrite — the preset
# PYTHONPATH (axon plugin registration lives there).
export PYTHONPATH=/root/repo:${PYTHONPATH:-}
WORK=runs/demo_full_r4
PID=${1:-$(cat /tmp/pipeline_r4.pid 2>/dev/null || echo 0)}

if [ "$PID" != "0" ]; then
  echo "[chain] waiting on pipeline pid $PID"
  while kill -0 "$PID" 2>/dev/null; do sleep 20; done
fi
echo "[chain] pipeline exited; starting measurement chain $(date -u +%H:%M:%S)"

run() {
  name=$1; shift
  echo "[chain] ==> $name $(date -u +%H:%M:%S)"
  "$@" > "/tmp/r5_${name}.log" 2>&1
  echo "[chain] <== $name rc=$? $(date -u +%H:%M:%S)"
}

# 1. Headline out-of-family EM with the r5 extractor (VERDICT done-bar #1).
HW_LM=models/tiny_lm_r5/tiny_lm.msgpack \
  run hw_eval python scripts/eval_handwritten_r3.py "$WORK"

# 2. Driver bench confirmation (VERDICT #2).
run bench python bench.py

# 3. pool7 vs ref3 attribution, synthetic + handwritten (VERDICT #6).
run pool7 python scripts/pool7_attribution.py "$WORK"

# 4. Per-slice handwritten arms incl. dense_only (encoder decision, VERDICT #4).
run hw_ablation python scripts/hw_ablation.py "$WORK"

# 5. Per-passage selector probe at n=200 (VERDICT #3).
run pp_probe python scripts/probe_per_passage_selection.py "$WORK" 200

# 6. Mixed workload where routing must win (VERDICT #7).
run mixed python scripts/mixed_workload_ablation.py "$WORK"

echo "[chain] all done $(date -u +%H:%M:%S)"
