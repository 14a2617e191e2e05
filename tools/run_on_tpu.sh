#!/bin/bash
# Launch a TPU job robustly: the axon relay wedges cold-start handshakes
# (especially right after a previous client exited, or when the far side
# still holds a killed client's session), so probe first and only then run
# the real command. jax.devices() alone can succeed while real compute
# wedges — the probe must execute a computation.
# Usage: tools/run_on_tpu.sh <logfile> <cmd...>
LOG="$1"; shift
for i in $(seq 1 20); do
  if timeout 180 python -c "
import jax, jax.numpy as jnp
assert float(jnp.ones((8, 8)).sum()) == 64.0
" >/dev/null 2>&1; then
    # settle: the far side needs a beat after ANY client exit (including the
    # probe's own) before the next handshake reliably completes
    sleep 45
    echo "[run_on_tpu] relay live (attempt $i); exec: $*" >> "$LOG"
    exec "$@" >> "$LOG" 2>&1
  fi
  echo "[run_on_tpu] attempt $i: relay not accepting compute; sleep 60s" >> "$LOG"
  sleep 60
done
echo "[run_on_tpu] relay never recovered" >> "$LOG"; exit 1
