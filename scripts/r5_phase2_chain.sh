#!/bin/bash
# Round-5 phase-2 chain: runs after r5_post_pipeline_chain (or the chain2
# rerun) finishes. Sequential so the TPU never sees concurrent clients.
# Usage: scripts/r5_phase2_chain.sh [wait_pid]
set -u
cd /root/repo
export PYTHONPATH=/root/repo:${PYTHONPATH:-}
WORK=runs/demo_full_r4
PID=${1:-0}
if [ "$PID" != "0" ]; then
  echo "[phase2] waiting on pid $PID"
  while kill -0 "$PID" 2>/dev/null; do sleep 20; done
fi
echo "[phase2] starting $(date -u +%H:%M:%S)"

run() {
  name=$1; shift
  echo "[phase2] ==> $name $(date -u +%H:%M:%S)"
  "$@" > "/tmp/r5_${name}.log" 2>&1
  echo "[phase2] <== $name rc=$? $(date -u +%H:%M:%S)"
}

# 1. Family-balanced router retrain + synthetic 6-arm ablation + gate
#    diagnostics (the committed n=1000 ablation's routing regression).
run balance python scripts/router_balance_probe_r5.py "$WORK"

# 2. Handwritten eval under the balanced pool7 gate (does the balanced fit
#    pool ALSO restore the out-of-family MRR 0.94 the r4probe showed?).
HW_LM=models/tiny_lm_r5/tiny_lm.msgpack \
HW_ROUTER="$WORK/router_balanced_pool7/final_router.msgpack" \
HW_OUT=handwritten_balanced \
  run hw_balanced python scripts/eval_handwritten_r3.py "$WORK"

# 3. Serving bench rerun (VERDICT r4 #5, third carry) with the queue-wait /
#    relay-RTT / device-call decomposition.
run serving python -m rag_uq_tpu.cli.bench_serving --out runs/serving_bench.json

echo "[phase2] all done $(date -u +%H:%M:%S)"
