#!/bin/bash
# Round-4 session-3 follow-on: runs after tools/relay_watch.sh prints
# "chip queue COMPLETE".  Reruns train-session stage A (it crashed on the
# YAML str-timesteps bug, fixed in config.py) and refreshes two metrics
# with the now-default attention kernel.
set -u
cd "$(dirname "$0")/.."
log() { echo "=== $(date +%H:%M:%S) $*"; }

# wait for the chip queue to finish (poll the watcher log)
while ! grep -q "chip queue COMPLETE" runs/relay_watch.log; do
  sleep 60
done
log "queue complete — post-queue follow-on starting"

# A-rerun: learning THROUGH the ViT encoder (VERDICT item 5)
if [ ! -f runs/r4_vision_simplest/metrics.jsonl ]; then
  mkdir -p runs/r4_vision_simplest
  timeout 3600 python -m vit_marl_tpu.train \
    --config configs/ippo_vision_simplest.yaml --timing \
    --set LOG_BACKEND=jsonl \
    --set LOG_PATH=runs/r4_vision_simplest/metrics.jsonl \
    --set CHECKPOINT_DIR=runs/r4_vision_simplest/ckpt \
    --set CHECKPOINT_EVERY=10 2>&1 | tail -8
  if [ "${PIPESTATUS[0]}" -ne 0 ] && [ -d runs/r4_vision_simplest/ckpt ]; then
    log "retrying stage A with RESUME=true"
    timeout 3600 python -m vit_marl_tpu.train \
      --config configs/ippo_vision_simplest.yaml --timing \
      --set LOG_BACKEND=jsonl \
      --set LOG_PATH=runs/r4_vision_simplest/metrics.jsonl \
      --set CHECKPOINT_DIR=runs/r4_vision_simplest/ckpt \
      --set CHECKPOINT_EVERY=10 --set RESUME=true 2>&1 | tail -8
  fi
  python - <<'PYEOF'
from vit_marl_tpu.eval.plotting import learning_curves
learning_curves("runs/r4_vision_simplest/metrics.jsonl",
                save_path="runs/r4_vision_simplest/learning_curves.png")
print("vision-simplest curves saved")
PYEOF
fi

# metric #2 with the attention kernel (fwd+bwd path)
timeout 1500 python bench.py --vit-images --envs 8192 --deadline 1380 \
  2>&1 | tee runs/r4/vit_images_attnkernel.txt | tail -3

# headline default bench with kernel + cls-only last block
timeout 1500 python bench.py --envs 8192 --deadline 1380 \
  2>&1 | tee runs/r4/bench_vit_default.txt | tail -3

log "post-queue follow-on done"
