"""Pick the NUM_MINIBATCHES winner from the runs/r4/mb_*.txt sweep.

Prints the mb value with the highest training throughput; falls back to 4
(the round-2 setting) when no sweep artifact has a parseable number.
"""

import glob
import re

best, best_mb = -1.0, 4
for f in glob.glob("runs/r4/mb_*.txt"):
    m = re.search(r"mb_(\d+)", f)
    if not m:
        continue
    hits = re.findall(r"throughput: ([\d.]+) env-steps/s", open(f).read())
    if hits and float(hits[-1]) > best:
        best, best_mb = float(hits[-1]), int(m.group(1))
print(best_mb)
