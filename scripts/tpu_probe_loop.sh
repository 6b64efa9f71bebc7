#!/bin/bash
# Background TPU recovery watch: one clean probe every ~8 min, append-only log.
# Stops itself once the chip answers (the point is to know WHEN it recovered,
# not to hammer a wedged relay). Usage: bash scripts/tpu_probe_loop.sh [log]
LOG=${1:-/tmp/tpu_probe.log}
while true; do
  echo "--- probe $(date -u +%H:%M:%S)" >> "$LOG"
  if python /root/repo/scripts/tpu_probe.py 240 >> "$LOG" 2>&1; then
    echo "RECOVERED $(date -u +%H:%M:%S)" >> "$LOG"
    exit 0
  fi
  sleep 480
done
