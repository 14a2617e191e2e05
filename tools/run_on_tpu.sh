#!/bin/bash
# Launch a TPU job robustly: the axon relay wedges cold-start handshakes
# (especially right after a previous client exited), so probe with a cheap
# jax.devices() first and only then run the real command.
# Usage: tools/run_on_tpu.sh <logfile> <cmd...>
LOG="$1"; shift
for i in $(seq 1 15); do
  if timeout 120 python -c "import jax; jax.devices()" >/dev/null 2>&1; then
    echo "[run_on_tpu] relay live (attempt $i); exec: $*" >> "$LOG"
    exec "$@" >> "$LOG" 2>&1
  fi
  echo "[run_on_tpu] attempt $i: relay not accepting; sleep 60s" >> "$LOG"
  sleep 60
done
echo "[run_on_tpu] relay never recovered" >> "$LOG"; exit 1
