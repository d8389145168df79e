#!/bin/bash
# Round-3 chip-time measurement queue (VERDICT r2 items 2-3), in priority
# order.  Run from the repo root when the TPU relay is up; every step is
# individually time-bounded so one wedge doesn't eat the session, and all
# output lands in runs/r3/.
set -u
mkdir -p runs/r3
log() { echo "=== $(date +%H:%M:%S) $*"; }

log "1/8 kernel selfcheck (compiled-mode bit-equality after AGG_STATS=8)"
timeout 900 python bench.py --selfcheck 2>&1 | tee runs/r3/selfcheck.txt

log "2/8 bench GRU 8192 (round-2: 362k)"
timeout 1200 python bench.py --policy gru --envs 8192 2>&1 | tee runs/r3/bench_gru.txt

log "3/8 bench ViT-Small 8192 (round-2: 125k; now transpose-free attention)"
timeout 1200 python bench.py --envs 8192 2>&1 | tee runs/r3/bench_vit.txt

log "3b/8 bench ViT-Small with fused Pallas MLP (A/B vs step 3)"
timeout 1200 python bench.py --envs 8192 --fused-mlp 2>&1 | tee runs/r3/bench_vit_fused.txt

log "3c/8 bench ViT-Small with fused block halves (LN+QKV / proj+LN+MLP)"
timeout 1200 python bench.py --envs 8192 --fused-block 2>&1 | tee runs/r3/bench_vit_fusedblock.txt

log "3d/8 bench ViT-Small 16384 envs (MFU vs batch; 8192 is 33% MFU)"
timeout 1500 python bench.py --envs 16384 2>&1 | tee runs/r3/bench_vit_16k.txt

log "4/8 ViT fwd stage decomposition + fused-MLP A/B (ROW_BLOCK=2048)"
timeout 1800 python tools/profile_vit.py --envs 8192 2>&1 | tee runs/r3/profile_vit.txt

log "5/8 BASELINE metric #2: ViT fwd+bwd images/sec (never measured)"
timeout 1200 python bench.py --vit-images --envs 8192 2>&1 | tee runs/r3/vit_images.txt

log "6/8 speed_test grid refresh (committed CSV is round-1 stale)"
timeout 2400 python -m vit_marl_tpu.eval.speed_test 2>&1 | tee runs/r3/speed_test.txt

log "7/8 PPO minibatch sweep at 4096x128 (NUM_MINIBATCHES 1/2/4)"
for mb in 1 2 4; do
  timeout 1800 python -m vit_marl_tpu.train --config configs/ippo_2player.yaml \
    --set NUM_MINIBATCHES=$mb --set TOTAL_TIMESTEPS=1.6e7 --timing \
    2>&1 | tail -5 | tee runs/r3/mb_$mb.txt
done

log "8/8 done — inspect runs/r3/ and update BASELINE.md"
