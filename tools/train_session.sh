#!/bin/bash
# Round-3 training queue (VERDICT r2 items 4 and 6).  Run AFTER
# tools/chip_session.sh (the minibatch sweep there decides NUM_MINIBATCHES;
# pass it as $1, default 4 = round-2 setting).
set -u
MB=${1:-4}
mkdir -p runs/r3_vision_simplest runs/r3_2player
log() { echo "=== $(date +%H:%M:%S) $*"; }

log "A: learning THROUGH the ViT encoder (solvable simplest-case task)"
timeout 3600 python -m vit_marl_tpu.train \
  --config configs/ippo_vision_simplest.yaml --timing \
  --set LOG_BACKEND=jsonl --set LOG_PATH=runs/r3_vision_simplest/metrics.jsonl \
  --set CHECKPOINT_DIR=runs/r3_vision_simplest/ckpt --set CHECKPOINT_EVERY=20 \
  2>&1 | tail -8

python - <<'EOF'
from vit_marl_tpu.eval.plotting import learning_curves
learning_curves("runs/r3_vision_simplest/metrics.jsonl",
                save_path="runs/r3_vision_simplest/learning_curves.png")
print("vision-simplest curves saved")
EOF

log "B: 2-player rerun at reference scale on round-3 defaults"
timeout 5400 python -m vit_marl_tpu.train --config configs/ippo_2player.yaml \
  --timing --set NUM_MINIBATCHES=$MB --set TOTAL_TIMESTEPS=1.2e8 \
  --set EVAL_EVERY=10 \
  --set LOG_BACKEND=jsonl --set LOG_PATH=runs/r3_2player/metrics.jsonl \
  --set CHECKPOINT_DIR=runs/r3_2player/ckpt --set CHECKPOINT_EVERY=20 \
  2>&1 | tail -8

python - <<'EOF'
from vit_marl_tpu.eval.plotting import learning_curves
learning_curves("runs/r3_2player/metrics.jsonl",
                save_path="runs/r3_2player/learning_curves.png")
print("2player curves saved")
EOF

log "C: Learned-vs-Baseline combination matrix on the new checkpoint"
timeout 1800 python -m vit_marl_tpu.evaluate --config configs/ippo_2player.yaml \
  --checkpoint-dir runs/r3_2player/ckpt --num-envs 256 --num-steps 50 \
  --out-dir runs/r3_2player/eval 2>&1 | tail -12

log "done — update BASELINE.md with the new numbers"
