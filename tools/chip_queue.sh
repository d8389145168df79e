#!/bin/bash
# Resumable round-4 chip-time queue (supersedes chip_session.sh for reruns).
#
# Every step checks its artifact for a success marker and is SKIPPED when
# already done, so tools/relay_watch.sh can re-invoke this script after every
# relay wedge and only the missing measurements run.  A step that fails is
# retried on the next invocation, up to MAX_ATTEMPTS times total (so a
# genuinely broken step can't loop forever).
#
# Exit status: 0 when every step is done (or permanently abandoned),
# 1 when at least one step is still pending (relay wedged mid-queue).
set -u
cd "$(dirname "$0")/.."
mkdir -p runs/r4
MAX_ATTEMPTS=4
PENDING=0
log() { echo "=== $(date +%H:%M:%S) $*"; }

# Nonce'd relay probe (CLAUDE.md gotcha 2: the relay dedupes identical
# inputs, so fold the wall clock in).  Used to distinguish "step failed
# because the relay wedged mid-run" (doesn't count as an attempt) from
# "step genuinely failed on a live relay" (counts toward MAX_ATTEMPTS).
relay_alive() {
  timeout 180 python - <<EOF >/dev/null 2>&1
import jax, jax.numpy as jnp
x = jnp.full((128, 128), 1.0 + ($(date +%s%N) % 86400000) * 1e-9)
assert float(jax.device_get(x @ x).sum()) > 0
EOF
}

# step <artifact> <success-marker-grep> <timeout_s> <cmd...>
step() {
  local f=$1 marker=$2 tmo=$3; shift 3
  local name=${f##*/}
  if [ -f "$f" ] && grep -q "$marker" "$f" && ! grep -q '"error"' "$f"; then
    log "skip $name (done)"
    return 0
  fi
  local att_file="runs/r4/.attempts_${name}"
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
    # Refund the attempt when the relay is wedged: a step interrupted by
    # the relay going down is not a genuine failure, and counting it
    # would silently abandon the measurement after MAX_ATTEMPTS wedges.
    if ! relay_alive; then
      log "FAILED $name but relay is DOWN — attempt refunded, will retry"
      echo "$((att - 1))" > "$att_file"
    else
      log "FAILED $name on a live relay (attempt $att/$MAX_ATTEMPTS) — will retry"
    fi
    PENDING=1
    # stop burning the queue and let the watcher re-probe before trying
    # the remaining steps
    return 1
  fi
}

# Priority order: driver-metric benches first, then profiling, then the
# long grid/sweep steps.
step runs/r4/bench_vit.txt '"metric"' 1500 \
  python bench.py --envs 8192 --deadline 1380 || exit 1
step runs/r4/bench_gru.txt '"metric"' 1200 \
  python bench.py --policy gru --envs 8192 --deadline 1080 || exit 1
step runs/r4/selfcheck.txt '"value": 1' 900 \
  python bench.py --selfcheck --deadline 780 || exit 1
step runs/r4/vit_images.txt '"metric"' 1500 \
  python bench.py --vit-images --envs 8192 --deadline 1380 || exit 1
step runs/r4/bench_vit_fused.txt '"metric"' 1500 \
  python bench.py --envs 8192 --fused-mlp --deadline 1380 || exit 1
step runs/r4/bench_vit_fusedblock.txt '"metric"' 1500 \
  python bench.py --envs 8192 --fused-block --deadline 1380 || exit 1
step runs/r4/bench_vit_attnkernel.txt '"metric"' 1500 \
  python bench.py --envs 8192 --attn-kernel --deadline 1380 || exit 1
step runs/r4/bench_vit_fusedblockfull.txt '"metric"' 1500 \
  python bench.py --envs 8192 --fused-block-full --deadline 1380 || exit 1
step runs/r4/bench_vit_16k.txt '"metric"' 1800 \
  python bench.py --envs 16384 --deadline 1680 || exit 1
step runs/r4/profile_vit.txt 'MFLOP/env' 1800 \
  python tools/profile_vit.py --envs 8192 || exit 1
# kernel-level A/Bs: one small compile per side — decides every fused
# default even in a short relay window
step runs/r4/kernel_bench.txt 'kernel A/Bs' 1500 \
  python tools/kernel_bench.py --envs 8192 || exit 1
# NOTE trailing comma: "'n_data_msg': 1," must not prefix-match the
# earlier "'n_data_msg': 100," row of a partially-completed grid
step runs/r4/speed_test.txt "'n_exec': 10, 'n_data_msg': 1," 2400 \
  python -m vit_marl_tpu.eval.speed_test || exit 1
for mb in 1 2 4; do
  step runs/r4/mb_$mb.txt 'env-steps/s (incl. compile)' 1800 \
    python -m vit_marl_tpu.train --config configs/ippo_2player.yaml \
      --set NUM_MINIBATCHES=$mb --set TOTAL_TIMESTEPS=1.6e7 --timing \
      --set LOG_BACKEND=jsonl --set LOG_PATH=runs/r4/mb_$mb.jsonl || exit 1
done
# env-only throughput (no policy in the loop): the pure engine number
step runs/r4/bench_none.txt '"metric"' 1200 \
  python bench.py --policy none --envs 8192 --deadline 1080 || exit 1
# model-family breadth: tiny and base presets at the same workload
step runs/r4/bench_vit_tiny.txt '"metric"' 1500 \
  python bench.py --policy vit-tiny --envs 8192 --deadline 1380 || exit 1
step runs/r4/bench_vit_base.txt '"metric"' 1500 \
  python bench.py --policy vit-base --envs 8192 --deadline 1380 || exit 1

# auto-chain the training queue (VERDICT r2 items 4 & 6) so a brief relay
# window isn't wasted waiting for a human.  Resumable: every run
# checkpoints and retries with RESUME=true, so re-invocations after a
# wedge continue from the latest checkpoint.  Marker = the final
# Learned-vs-Baseline eval matrix landed (train_session's last stage).
MB=$(python tools/pick_mb.py 2>/dev/null || echo 4)
log "train session with NUM_MINIBATCHES=$MB"
step runs/r4/train_session.log "eval matrix written" 16200 \
  bash tools/train_session.sh "$MB" || exit 1

if [ "$PENDING" -eq 0 ]; then
  log "queue complete — inspect runs/r4/ and update BASELINE.md"
fi
exit "$PENDING"
