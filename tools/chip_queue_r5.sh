#!/bin/bash
# Resumable ROUND-5 chip-time queue (VERDICT r4 items 3 + 4 + the
# observability-guard bench).  Same contract as tools/chip_queue.sh:
# per-step artifact markers, attempt caps with relay-wedge refunds.
# Artifacts land in runs/r5/.
#
# Phase 1 (this script): selfcheck, default bench on the r5 tree,
# vision-training throughput re-measure with the attention backward
# kernel (on/off A/B + minibatch mini-sweep), then the reference-scale
# dual_ppo vision run (4096x128) + the L/B eval matrix with the ViT
# policy in it.  Pipeline/LN-fold A/Bs queue separately once they land
# (tools/chip_queue_r5b.sh).
set -u
cd "$(dirname "$0")/.."
mkdir -p runs/r5 runs/r5_vision_2player
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
  local att_file="runs/r5/.attempts_${name}"
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

# train_step <artifact> <tmo> <dir> <config> [--set ...]  — training run
# with checkpoints + a single RESUME retry (relay-wedge resilience).
train_step() {
  local f=$1 tmo=$2 dir=$3 cfg=$4; shift 4
  local name=${f##*/}
  if [ -f "$f" ] && grep -q "throughput:" "$f"; then
    log "skip $name (done)"
    return 0
  fi
  local att_file="runs/r5/.attempts_${name}"
  local att=$(( $(cat "$att_file" 2>/dev/null || echo 0) + 1 ))
  if [ "$att" -gt "$MAX_ATTEMPTS" ]; then
    log "abandon $name (tried $MAX_ATTEMPTS times)"
    return 0
  fi
  echo "$att" > "$att_file"
  mkdir -p "$dir"
  local common=(--config "$cfg" --timing
    --set LOG_BACKEND=jsonl --set "LOG_PATH=$dir/metrics.jsonl"
    --set "CHECKPOINT_DIR=$dir/ckpt" --set CHECKPOINT_EVERY=10 "$@")
  log "run $name (attempt $att)"
  timeout "$tmo" python -m vit_marl_tpu.train "${common[@]}" 2>&1 | tee "$f" | tail -6
  local rc=${PIPESTATUS[0]}
  if [ "$rc" -ne 0 ] && [ -d "$dir/ckpt" ] && relay_alive; then
    log "rc=$rc — retrying once with RESUME=true"
    timeout "$tmo" python -m vit_marl_tpu.train "${common[@]}" \
      --set RESUME=true 2>&1 | tee -a "$f" | tail -6
  fi
  if grep -q "throughput:" "$f"; then
    log "done $name"
  else
    if ! relay_alive; then
      log "FAILED $name, relay DOWN — attempt refunded"
      echo "$((att - 1))" > "$att_file"
    fi
    PENDING=1
    return 1
  fi
}

# 1. compiled selfcheck — guards the whole tree's Mosaic lowerings
step runs/r5/selfcheck.txt '"value": 1' 900 \
  python bench.py --selfcheck --deadline 780 || exit 1

# 2. default bench on the round-5 tree (headline guard: ~132k)
step runs/r5/bench_vit_default.txt '"metric"' 1500 \
  python bench.py --envs 8192 --deadline 1380 || exit 1

# 3. VERDICT item 3: what vision TRAINING costs today (attn bwd kernel
#    landed after every round-4 training number).  Short dual_ppo runs at
#    round-4 shapes (1024 envs), mb in {1,2,4}, bwd kernel ON (default).
for MB in 1 2 4; do
  train_step runs/r5/vis_mb${MB}.txt 2400 runs/r5/vis_mb${MB} \
    configs/ippo_vision_dual_ppo.yaml \
    --set NUM_ENVS=1024 --set TOTAL_TIMESTEPS=2.7e6 \
    --set NUM_MINIBATCHES=$MB --set EVAL_EVERY=0
done
#    ... and the same shape with the bwd kernel OFF (the A/B arm; round-4
#    vision numbers were all measured in this configuration)
train_step runs/r5/vis_mb2_xlabwd.txt 2400 runs/r5/vis_mb2_xlabwd \
  configs/ippo_vision_dual_ppo.yaml \
  --set NUM_ENVS=1024 --set TOTAL_TIMESTEPS=2.7e6 \
  --set NUM_MINIBATCHES=2 --set VIT_ATTN_BWD_KERNEL=false --set EVAL_EVERY=0

# 4. ippo_vision_simplest throughput on today's tree (retires the
#    round-2-era "~6.3k env-steps/s" BASELINE row)
train_step runs/r5/vis_simplest_tp.txt 2400 runs/r5/vis_simplest_tp \
  configs/ippo_vision_simplest.yaml \
  --set TOTAL_TIMESTEPS=2.7e6 --set NUM_MINIBATCHES=2 --set EVAL_EVERY=0

# 5. VERDICT item 4: reference-scale dual_ppo vision run — 4096 envs x
#    128 steps (protocol of runs/r4_2player; scale of the reference's
#    config/ippo_rnn_JAXMARL_2player.yaml) with blend_aggressive, then
#    the held-out L/B combination matrix with the ViT policy in it.
MBWIN=$( { grep -l . runs/r5/vis_mb*.txt 2>/dev/null | head -1 >/dev/null \
  && python - <<'EOF'
import glob, re
best, mb = -1.0, 2
for f in glob.glob("runs/r5/vis_mb[0-9].txt"):
    hits = re.findall(r"throughput: ([\d.]+) env-steps/s", open(f).read())
    m = re.search(r"vis_mb(\d+)", f)
    if hits and m and float(hits[-1]) > best:
        best, mb = float(hits[-1]), int(m.group(1))
print(mb)
EOF
} || echo 2 )
log "vision minibatch winner: mb=$MBWIN"
train_step runs/r5/vision_2player.txt 7200 runs/r5_vision_2player \
  configs/ippo_vision_dual_ppo.yaml \
  --set AGENT_CONFIGS.Execution.BLEND_AGGRESSIVE=true \
  --set NUM_ENVS=4096 --set TOTAL_TIMESTEPS=1.2e8 \
  --set NUM_MINIBATCHES=$MBWIN --set EVAL_EVERY=10

step runs/r5_vision_2player/eval_matrix.txt 'combinations' 2700 \
  python -m vit_marl_tpu.evaluate --config configs/ippo_vision_dual_ppo.yaml \
  --set AGENT_CONFIGS.Execution.BLEND_AGGRESSIVE=true \
  --checkpoint-dir runs/r5_vision_2player/ckpt --num-envs 256 --num-steps 50 \
  --out-dir runs/r5_vision_2player/eval || true

python - <<'EOF' || true
from vit_marl_tpu.eval.plotting import learning_curves
for d in ("runs/r5_vision_2player",):
    try:
        learning_curves(f"{d}/metrics.jsonl",
                        save_path=f"{d}/learning_curves.png")
        print(f"{d} curves saved")
    except Exception as e:
        print(f"{d} curves failed: {e}")
EOF

if [ "$PENDING" -eq 0 ]; then
  log "queue complete — inspect runs/r5/ + runs/r5_vision_2player/, update BASELINE.md"
fi
exit "$PENDING"
