#!/bin/bash
# ROUND-5 phase 3: the reference-scale dual_ppo vision run + L/B eval
# matrix (VERDICT r4 item 4), run AFTER the r5b perf A/Bs so the quick
# default-deciding measurements get relay time first.  Reset the phase-1
# abandon markers and delegate to chip_queue_r5.sh (resumable: every
# other step is already done and skips).
set -u
cd "$(dirname "$0")/.."
rm -f runs/r5/.attempts_vision_2player.txt runs/r5/.attempts_eval_matrix.txt
exec bash tools/chip_queue_r5.sh
