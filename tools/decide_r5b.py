"""Summarize the runs/r5b perf A/Bs and print the default-flip decision.

Scoreboard rule (BASELINE.md): a lever ships default-ON only on an
end-to-end WIN on the default bench config; isolated/micro wins do not
count.  Prints one line per arm + the decision, comparing against the
loop-mode control measured in the same session.
"""

import glob
import json
import re

ARMS = {
    "bench_loop_ctrl.txt": "loop control (attn kernel, 30 steps)",
    "bench_pipe.txt": "pipeline (merged ticks)",
    "bench_pipeseq.txt": "pipeline-seq (half-batch, unmerged)",
    "bench_lnfold.txt": "LN1+QKV+attention fold (loop)",
    "bench_lnfold_pipe.txt": "fold + pipeline",
}


def value(path):
    try:
        for line in open(path):
            if line.startswith("{"):
                d = json.loads(line)
                if "error" in d:
                    return None
                return d["value"]
    except OSError:
        return None
    return None


def main():
    vals = {}
    for f, label in ARMS.items():
        v = value(f"runs/r5b/{f}")
        vals[f] = v
        print(f"{label:44s} {v if v is not None else '(missing)'}")
    ctrl = vals.get("bench_loop_ctrl.txt")
    if not ctrl:
        print("\nno control measurement — no decision")
        return
    print()
    for f in ("bench_pipe.txt", "bench_pipeseq.txt", "bench_lnfold.txt",
              "bench_lnfold_pipe.txt"):
        v = vals.get(f)
        if v:
            print(f"{f[6:-4]:24s} {v / ctrl - 1:+.1%} vs loop control")
    pipe, fold = vals.get("bench_pipe.txt"), vals.get("bench_lnfold.txt")
    both = vals.get("bench_lnfold_pipe.txt")
    best = max([("loop", ctrl)]
               + [(n, v) for n, v in (("pipeline", pipe), ("lnfold", fold),
                                      ("lnfold+pipeline", both)) if v],
               key=lambda kv: kv[1])
    print(f"\nwinner: {best[0]} @ {best[1]:.0f} env-steps/s")
    if best[0] == "loop":
        print("decision: keep all defaults (levers stay off-by-default, "
              "numbers documented)")
    else:
        print("decision: flip the winning lever(s) default-ON (bench.py "
              "default mode / ViTConfig+TrainConfig attn_ln_fold), update "
              "BASELINE.md + DESIGN.md, rerun selfcheck before the driver's "
              "round-end bench")
    # training-side pipeline arm (phase-1 control: runs/r5/vis_mb2.txt)
    tr = {}
    for f in ("runs/r5/vis_mb2.txt", "runs/r5b/vis_mb2_pipe.txt"):
        hits = []
        try:
            hits = re.findall(r"throughput: ([\d.]+) env-steps/s",
                              open(f).read())
        except OSError:
            pass
        tr[f] = float(hits[-1]) if hits else None
    if all(tr.values()):
        a, b = tr["runs/r5/vis_mb2.txt"], tr["runs/r5b/vis_mb2_pipe.txt"]
        print(f"\nvision training mb2: loop {a:.0f} vs pipeline {b:.0f} "
              f"({b / a - 1:+.1%}) env-steps/s incl. compile")


if __name__ == "__main__":
    main()
