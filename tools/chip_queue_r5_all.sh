#!/bin/bash
# Round-5 master queue: phase 1 (vision re-measure + reference-scale run,
# tools/chip_queue_r5.sh) then the perf A/Bs (tools/chip_queue_r5b.sh).
set -u
cd "$(dirname "$0")/.."
bash tools/chip_queue_r5.sh || exit 1
bash tools/chip_queue_r5b.sh
