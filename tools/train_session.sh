#!/bin/bash
# Round-4 training queue (VERDICT r2 items 4 and 6).  Run AFTER
# tools/chip_session.sh (the minibatch sweep there decides NUM_MINIBATCHES;
# pass it as $1, default 4 = round-2 setting).
#
# Outage-resilient: every training run checkpoints frequently and is
# retried once with RESUME=true, so a relay wedge mid-run costs only the
# un-checkpointed tail instead of the whole run.
set -u
MB=${1:-4}
mkdir -p runs/r4_vision_simplest runs/r4_2player
log() { echo "=== $(date +%H:%M:%S) $*"; }

# run_training <timeout_s> <out_dir> <config> [extra --set args...]
run_training() {
  local tmo=$1 dir=$2 cfg=$3; shift 3
  local common=(--config "$cfg" --timing
    --set LOG_BACKEND=jsonl --set "LOG_PATH=$dir/metrics.jsonl"
    --set "CHECKPOINT_DIR=$dir/ckpt" --set CHECKPOINT_EVERY=10 "$@")
  timeout "$tmo" python -m vit_marl_tpu.train "${common[@]}" 2>&1 | tail -8
  local rc=${PIPESTATUS[0]}
  if [ "$rc" -ne 0 ] && [ -d "$dir/ckpt" ]; then
    log "rc=$rc — retrying once with RESUME=true"
    timeout "$tmo" python -m vit_marl_tpu.train "${common[@]}" \
      --set RESUME=true 2>&1 | tail -8
  fi
}

log "A: learning THROUGH the ViT encoder (solvable simplest-case task)"
run_training 3600 runs/r4_vision_simplest configs/ippo_vision_simplest.yaml

python - <<'EOF'
from vit_marl_tpu.eval.plotting import learning_curves
learning_curves("runs/r4_vision_simplest/metrics.jsonl",
                save_path="runs/r4_vision_simplest/learning_curves.png")
print("vision-simplest curves saved")
EOF

log "B: 2-player rerun at reference scale on round-3 defaults"
run_training 5400 runs/r4_2player configs/ippo_2player.yaml \
  --set NUM_MINIBATCHES=$MB --set TOTAL_TIMESTEPS=1.2e8 --set EVAL_EVERY=10

python - <<'EOF'
from vit_marl_tpu.eval.plotting import learning_curves
learning_curves("runs/r4_2player/metrics.jsonl",
                save_path="runs/r4_2player/learning_curves.png")
print("2player curves saved")
EOF

log "C: Learned-vs-Baseline combination matrix on the new checkpoint"
timeout 1800 python -m vit_marl_tpu.evaluate --config configs/ippo_2player.yaml \
  --checkpoint-dir runs/r4_2player/ckpt --num-envs 256 --num-steps 50 \
  --out-dir runs/r4_2player/eval 2>&1 | tail -12

log "D: dual_ppo exec with blend_aggressive (VERDICT r3 item 6: does the"
log "   far-touch lever un-flatten the exec KL/reward curve?)"
mkdir -p runs/r4_vision_blend
run_training 3600 runs/r4_vision_blend configs/ippo_vision_dual_ppo.yaml \
  --set AGENT_CONFIGS.Execution.BLEND_AGGRESSIVE=true --set NUM_ENVS=1024 \
  --set TOTAL_TIMESTEPS=2.0e7

python - <<'EOF'
from vit_marl_tpu.eval.plotting import learning_curves
learning_curves("runs/r4_vision_blend/metrics.jsonl",
                save_path="runs/r4_vision_blend/learning_curves.png")
print("vision-blend curves saved")
EOF

# success marker for the resumable queue: only printed when the eval
# matrix actually landed (chip_queue greps for this line)
if [ -f runs/r4_2player/eval/combinations.json ]; then
  log "eval matrix written"
fi

log "done — update BASELINE.md with the new numbers"
