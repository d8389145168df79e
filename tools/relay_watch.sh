#!/bin/bash
# Poll the axon TPU relay; whenever it answers a bounded probe, run the
# resumable chip queue (tools/chip_queue.sh).  Loops until the queue reports
# complete.  Run in the background; all output to runs/relay_watch.log.
set -u
cd "$(dirname "$0")/.."
mkdir -p runs
# single-instance guard: two watchers run two queues into the SAME
# artifact files and checkpoint dirs (observed round 5: duplicated
# vis_mb1 trainings corrupting each other's metrics + relay contention)
exec 9>runs/.relay_watch.lock
if ! flock -n 9; then
  echo "$(date +%H:%M:%S) another relay_watch instance holds the lock — exiting"
  exit 1
fi
PROBE_TIMEOUT=${PROBE_TIMEOUT:-300}
SLEEP=${SLEEP:-240}
QUEUE=${QUEUE:-tools/chip_queue.sh}

probe() {
  # NONCE: the axon relay dedupes executions with bit-identical inputs
  # (CLAUDE.md gotcha 2) — a constant probe could be answered from cache
  # by a wedged backend.  Fold the wall clock into the input so every
  # probe is a genuinely fresh execution.
  timeout -k 30 "$PROBE_TIMEOUT" python - <<EOF >/dev/null 2>&1
import jax, jax.numpy as jnp
x = jnp.full((128, 128), 1.0 + ($(date +%s) % 86400) * 1e-6)
assert float(jax.device_get(x @ x).sum()) > 0
EOF
}

while true; do
  if probe; then
    echo "$(date +%H:%M:%S) relay UP — running chip queue"
    if bash "$QUEUE"; then
      echo "$(date +%H:%M:%S) chip queue COMPLETE"
      break
    fi
    echo "$(date +%H:%M:%S) queue interrupted (relay wedged mid-run?)"
  else
    echo "$(date +%H:%M:%S) relay down (probe >${PROBE_TIMEOUT}s or failed)"
  fi
  sleep "$SLEEP"
done
