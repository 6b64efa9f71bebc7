#!/bin/bash
# Round-5 phase-3 chain: encoder register-augmentation probe (VERDICT #4).
# Runs after phase 2 so the TPU never sees concurrent clients.
# Usage: scripts/r5_phase3_chain.sh [wait_pid]
set -u
cd /root/repo
export PYTHONPATH=/root/repo:${PYTHONPATH:-}
WORK=runs/demo_full_r4
PID=${1:-0}
if [ "$PID" != "0" ]; then
  echo "[phase3] waiting on pid $PID"
  while kill -0 "$PID" 2>/dev/null; do sleep 20; done
fi
echo "[phase3] starting $(date -u +%H:%M:%S)"

run() {
  name=$1; shift
  echo "[phase3] ==> $name $(date -u +%H:%M:%S)"
  "$@" > "/tmp/r5_${name}.log" 2>&1
  echo "[phase3] <== $name rc=$? $(date -u +%H:%M:%S)"
}

run enc_aug python scripts/encoder_augment_probe_r5.py "$WORK" 3

echo "[phase3] all done $(date -u +%H:%M:%S)"
