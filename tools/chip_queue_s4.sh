#!/bin/bash
# Resumable round-4 SESSION-4 chip-time queue: the attention BACKWARD
# kernel measurements (see ops/attention_kernel.py::_attn_bwd_body).
#
# Same contract as tools/chip_queue.sh (artifact markers, attempt caps
# with relay-wedge refunds); artifacts land in runs/r4s4/.
set -u
cd "$(dirname "$0")/.."
mkdir -p runs/r4s4
MAX_ATTEMPTS=4
PENDING=0
log() { echo "=== $(date +%H:%M:%S) $*"; }

relay_alive() {
  timeout 180 python - <<EOF >/dev/null 2>&1
import jax, jax.numpy as jnp
x = jnp.full((128, 128), 1.0 + ($(date +%s%N) % 86400000) * 1e-9)
assert float(jax.device_get(x @ x).sum()) > 0
EOF
}

step() {
  local f=$1 marker=$2 tmo=$3; shift 3
  local name=${f##*/}
  if [ -f "$f" ] && grep -q "$marker" "$f" && ! grep -q '"error"' "$f"; then
    log "skip $name (done)"
    return 0
  fi
  local att_file="runs/r4s4/.attempts_${name}"
  local att=$(( $(cat "$att_file" 2>/dev/null || echo 0) + 1 ))
  if [ "$att" -gt "$MAX_ATTEMPTS" ]; then
    log "abandon $name (tried $MAX_ATTEMPTS times)"
    return 0
  fi
  echo "$att" > "$att_file"
  log "run $name (attempt $att): $*"
  timeout "$tmo" "$@" 2>&1 | tee "$f"
  if [ -f "$f" ] && grep -q "$marker" "$f" && ! grep -q '"error"' "$f"; then
    log "done $name"
  else
    if ! relay_alive; then
      log "FAILED $name but relay is DOWN — attempt refunded, will retry"
      echo "$((att - 1))" > "$att_file"
    else
      log "FAILED $name on a live relay (attempt $att/$MAX_ATTEMPTS) — will retry"
    fi
    PENDING=1
    return 1
  fi
}

# 1. compiled selfcheck first — it now includes the attention bwd
#    kernel's Mosaic lowering (the pattern that caught two real bugs
#    in round 4's forward kernels)
step runs/r4s4/selfcheck.txt '"value": 1' 900 \
  python bench.py --selfcheck --deadline 780 || exit 1
# 2. BASELINE metric #2 A/B: Pallas backward (new default) vs the XLA
#    recompute-and-differentiate backward (round-4 number: 33,126)
step runs/r4s4/vit_images_bwdkernel.txt '"metric"' 1500 \
  python bench.py --vit-images --envs 8192 --deadline 1380 || exit 1
step runs/r4s4/vit_images_xlabwd.txt '"metric"' 1500 \
  python bench.py --vit-images --envs 8192 --no-attn-bwd-kernel \
  --deadline 1380 || exit 1
# 3. default-bench smoke on the session-4 tree (fwd path is unchanged;
#    guards the flag plumbing before the driver's round-end run)
step runs/r4s4/bench_vit_default.txt '"metric"' 1500 \
  python bench.py --envs 8192 --deadline 1380 || exit 1

if [ "$PENDING" -eq 0 ]; then
  log "queue complete — inspect runs/r4s4/ and update BASELINE.md"
fi
exit "$PENDING"
