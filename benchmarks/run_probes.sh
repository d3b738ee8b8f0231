#!/bin/bash
# Probe-chain runner with TPU-tunnel preflight: the axon relay goes
# unavailable for stretches; probes that start then would block ~1h and
# die.  Wait until a trivial device query succeeds before each probe.
# Usage: run_probes.sh <logfile> "<cmd1>" ["<cmd2>" ...]
LOG="$1"; shift
wait_tunnel() {
  for i in $(seq 1 200); do
    if timeout 90 python -c "import jax; jax.devices()" >/dev/null 2>&1; then
      return 0
    fi
    echo "# tunnel unavailable, retry $i" >> "$LOG"
    sleep 120
  done
  return 1
}
for cmd in "$@"; do
  echo "=== $cmd ===" >> "$LOG"
  wait_tunnel || { echo "TUNNEL DEAD" >> "$LOG"; exit 1; }
  timeout 3000 bash -c "$cmd" >> "$LOG" 2>&1
done
echo DONE >> "$LOG"
