#!/bin/bash
# ROUND-5 perf A/B queue (VERDICT r4 items 1 + 9): the split-batch
# software-pipelined rollout (bench --mode pipeline / pipeline-seq,
# rl/pipeline.py) and the LN1+QKV+attention fold kernel
# (--attn-ln-fold, ops/block_kernel.py::fused_ln_qkv_attn).
# Same resumable contract as tools/chip_queue.sh; artifacts in runs/r5b/.
set -u
cd "$(dirname "$0")/.."
mkdir -p runs/r5b
MAX_ATTEMPTS=4
PENDING=0
log() { echo "=== $(date +%H:%M:%S) $*"; }

relay_alive() {
  timeout -k 30 180 python - <<EOF >/dev/null 2>&1
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
  local att_file="runs/r5b/.attempts_${name}"
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

# 0. compiled selfcheck — now includes the fold kernel's Mosaic lowering
step runs/r5b/selfcheck.txt '"value": 1' 1200 \
  python bench.py --selfcheck --deadline 1080 || exit 1

# 1. VERDICT item 1 A/B: split-batch pipelined rollout vs the loop
#    baseline.  pipeline-seq isolates the half-batch effect from the
#    merge effect (same schedule, no packing).
# --steps 30: the pipeline schedule has a prologue/epilogue bubble per
# rep (~half a step per 10), so all three arms run longer steady states
step runs/r5b/bench_pipe.txt '"metric"' 1800 \
  python bench.py --envs 8192 --mode pipeline --steps 30 --deadline 1680 \
  || exit 1
step runs/r5b/bench_pipeseq.txt '"metric"' 1800 \
  python bench.py --envs 8192 --mode pipeline-seq --steps 30 \
  --deadline 1680 || exit 1
step runs/r5b/bench_loop_ctrl.txt '"metric"' 1500 \
  python bench.py --envs 8192 --steps 30 --deadline 1380 || exit 1

# 2. VERDICT item 9 A/B: LN1+QKV+attention fold (loop mode, default
#    attention kernel as the control = bench_loop_ctrl above)
step runs/r5b/bench_lnfold.txt '"metric"' 1800 \
  python bench.py --envs 8192 --attn-ln-fold --steps 30 --deadline 1680 \
  || exit 1

# 3. combined arm: fold + pipeline (only meaningful if both win alone,
#    but cheap to measure while the cache is warm)
step runs/r5b/bench_lnfold_pipe.txt '"metric"' 1800 \
  python bench.py --envs 8192 --attn-ln-fold --mode pipeline --steps 30 \
  --deadline 1680 || exit 1

# 3a. bwd-kernel A/B arm relocated from phase 1: the mb=2 XLA-bwd run
#     OOM'd (RESOURCE_EXHAUSTED — the XLA backward's (B,N,N,H) recompute
#     doubles with the minibatch; the Pallas bwd kernel fits, which is
#     itself the headline finding).  Measure the comparable arm at mb=4.
step runs/r5b/vis_mb4_xlabwd.txt 'throughput:' 2400 \
  python -m vit_marl_tpu.train --config configs/ippo_vision_dual_ppo.yaml \
  --timing --set NUM_ENVS=1024 --set TOTAL_TIMESTEPS=2.7e6 \
  --set NUM_MINIBATCHES=4 --set VIT_ATTN_BWD_KERNEL=false \
  --set EVAL_EVERY=0 --set LOG_BACKEND=none || true

# 3b. training-side pipeline: vision training throughput with
#     ROLLOUT_MODE=pipeline at the same shape as runs/r5/vis_mb2 (the
#     loop-mode control measured in phase 1)
step runs/r5b/vis_mb2_pipe.txt 'throughput:' 2400 \
  python -m vit_marl_tpu.train --config configs/ippo_vision_dual_ppo.yaml \
  --timing --set NUM_ENVS=1024 --set TOTAL_TIMESTEPS=2.7e6 \
  --set NUM_MINIBATCHES=2 --set ROLLOUT_MODE=pipeline --set EVAL_EVERY=0 \
  --set LOG_BACKEND=jsonl --set LOG_PATH=runs/r5b/vis_mb2_pipe_metrics.jsonl \
  || true

# 4. encoder decomposition with the new rows (lnfold fwd / fwd+bwd)
step runs/r5b/profile_vit.txt 'vit_encoder' 2400 \
  python tools/profile_vit.py --envs 8192 || true

# 5. training-relevant direction for the fold: ViT fwd+bwd images/s
step runs/r5b/vit_images_lnfold.txt '"metric"' 1500 \
  python bench.py --vit-images --envs 8192 --attn-ln-fold \
  --deadline 1380 || true

if [ "$PENDING" -eq 0 ]; then
  log "r5b queue complete — decide defaults per the BASELINE scoreboard rule"
fi
exit "$PENDING"
