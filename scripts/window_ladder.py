#!/usr/bin/env python
"""Walk the WaterRamps window curriculum on the chip (VERDICT r4 item 3).

The reference trains WaterRamps at batch 16 with a 3 -> 5 -> 10 -> 20
window curriculum (reference configs/WaterRamps.yml:49-55, curricula
pipelines/simulator.py:431-476).  This driver proves every stage fits one
v5e and measures it: for each window it runs scripts/gns_scale_run.py at
batch 16 and records {peak HBM, s/step, loss trend}.

Execution shape per stage (sized to the TPU runtime's ~15-30 s
per-execution walltime):
  w3  : grad_accum 8,  host accum (micro ~4 s)
  w5  : grad_accum 8,  host accum (micro ~7 s)
  w10 : grad_accum 16, host accum (micro ~7 s)
  w20 : grad_accum 16, host accum (micro ~13 s)

Writes docs/window_ladder_r5.json.

Usage: python scripts/window_ladder.py [--device tpu] [--windows 3,5,10,20]
"""

import argparse
import json
import os
import subprocess
import sys
import time

ROOT = os.path.join(os.path.dirname(__file__), "..")

STAGES = {
    # window -> (grad_accum, iters)
    3: (8, 40),
    5: (8, 12),
    10: (16, 8),
    20: (16, 6),
}


def run_stage(window, ga, iters, device):
    cmd = [sys.executable, "scripts/gns_scale_run.py",
           "--window", str(window), "--batch", "16",
           "--grad_accum", str(ga), "--grad_accum_host",
           "--iters", str(iters), "--device", device]
    print("stage:", " ".join(cmd), flush=True)
    t0 = time.time()
    r = subprocess.run(cmd, cwd=ROOT, capture_output=True, text=True)
    sys.stdout.write(r.stdout[-2500:])
    sys.stderr.write(r.stderr[-1500:])
    out = {"window": window, "grad_accum": ga, "iters": iters,
           "wall_s": round(time.time() - t0, 1),
           "rc": r.returncode}
    # the stage summary is the last JSON line of gns_scale_run's stdout
    for line in reversed(r.stdout.splitlines()):
        line = line.strip()
        if line.startswith("{"):
            try:
                out["summary"] = json.loads(line)
                break
            except json.JSONDecodeError:
                continue
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--device", default="tpu")
    ap.add_argument("--windows", default="3,5,10,20")
    args = ap.parse_args()

    results = []
    for w in [int(x) for x in args.windows.split(",")]:
        ga, iters = STAGES.get(w, (16, 6))
        results.append(run_stage(w, ga, iters, args.device))
        # persist after every stage: a late OOM/fault must not lose the
        # earlier stages' measurements
        path = os.path.join(ROOT, "docs", "window_ladder_r5.json")
        with open(path, "w") as f:
            json.dump({"batch": 16, "stages": results}, f, indent=1)
        print("wrote", path, flush=True)

    ok = all(r["rc"] == 0 for r in results)
    table = []
    for r in results:
        s = r.get("summary") or {}
        table.append({
            "window": r["window"], "grad_accum": r["grad_accum"],
            "peak_hbm_gib": s.get("peak_hbm_gib"),
            "s_per_step": (round(s["wall_per_step_ms"] / 1000.0, 1)
                           if s.get("wall_per_step_ms") else None),
            "final_loss": s.get("final_loss"),
            "loss_finite": s.get("loss_finite"),
        })
    print(json.dumps({"ok": ok, "table": table}, indent=1))
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
