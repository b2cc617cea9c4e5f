#!/usr/bin/env python
"""Complete the canyon demo protocol (VERDICT r2 item 5).

The reference's flagship demo (reference run_sample.py:121-179): canyon
terrain with 185k boundary particles, fluid block shot in with inflow
re-injection, 200 timesteps.  The reference hardcodes re-injection every
2 steps at |v|=11.7; the only complete shipped checkpoint (Liquid3d) was
trained at |v| < 2, where a 2-step cadence re-injects into occupied space
and explodes density (REPORT_QUALITY.md §3).  This driver runs the demo
*in the checkpoint's regime*: velocity scaled to Liquid3d's training
distribution and the inflow cadence scaled to preserve the reference
demo's block clearance (0.47 units between injections: N = 2 x 11.7/2.3
~= 10 steps at |v|=2.3, dt=0.02).

Then verifies containment frame by frame:
  - below-floor count: particles below the local terrain height minus
    margin (terrain = min boundary y per (x, z) cell)
  - inside fraction: particles within the boundary AABB (+margin)
  - ballistic-ejection check: max fluid y never exceeds the boundary top

and renders a frame strip to docs/.

Usage: python scripts/canyon_demo.py [--steps 200] [--skip_run]
"""

import argparse
import json
import os
import subprocess
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

SENTINEL = 1000.0


def analyze(h5path, margin=0.15, cell=0.5):
    import h5py
    with h5py.File(h5path, "r") as f:
        grp = f[list(f.keys())[0]]
        pred = np.asarray(grp["pred"])   # [T, cap, 3], sentinel rows 1000
        bnd = np.asarray(grp["bnd"])     # [B, 3]

    lo, hi = bnd.min(0), bnd.max(0)
    # terrain height map: min boundary y per (x, z) cell
    gx = np.floor((bnd[:, 0] - lo[0]) / cell).astype(int)
    gz = np.floor((bnd[:, 2] - lo[2]) / cell).astype(int)
    nx, nz = gx.max() + 1, gz.max() + 1
    floor = np.full((nx, nz), lo[1], np.float32)
    np.minimum.at(floor, (gx, gz), bnd[:, 1])

    frames = []
    for t in range(pred.shape[0]):
        p = pred[t]
        active = np.abs(p[:, 0]) < SENTINEL / 2
        p = p[active]
        n = len(p)
        if n == 0:
            frames.append({"t": t, "n": 0})
            continue
        inside = np.all((p >= lo - margin) & (p <= hi + margin), -1)
        fx = np.clip(np.floor((p[:, 0] - lo[0]) / cell).astype(int),
                     0, nx - 1)
        fz = np.clip(np.floor((p[:, 2] - lo[2]) / cell).astype(int),
                     0, nz - 1)
        below = p[:, 1] < floor[fx, fz] - margin
        frames.append({
            "t": t, "n": n,
            "inside_frac": round(float(inside.mean()), 4),
            "below_floor": int(below.sum()),
            "max_y": round(float(p[:, 1].max()), 2),
            "finite": bool(np.all(np.isfinite(p))),
        })
    last = [f for f in frames if f.get("n")]
    top = float(hi[1])
    ok = (all(f["below_floor"] == 0 for f in last)
          and all(f["inside_frac"] >= 0.99 for f in last)
          and all(f["max_y"] <= top + margin for f in last)
          and all(f["finite"] for f in last))
    return {"contained": ok, "boundary_top_y": round(top, 2),
            "frames": [f for f in frames if f["t"] % 20 == 0 or
                       f["t"] == len(frames) - 1]}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=200)
    ap.add_argument("--out", default="/tmp/canyon_demo_r3")
    ap.add_argument("--crop", type=int, default=65536)
    ap.add_argument("--every", type=int, default=10)
    ap.add_argument("--chunk", type=int, default=20)
    ap.add_argument("--device", default="tpu")
    ap.add_argument("--config", default="configs/Liquid3d.yml",
                    help="model config (e.g. a raised-neighbor-budget "
                         "variant when the overflow report asks for one)")
    ap.add_argument("--skip_run", action="store_true",
                    help="only analyze/render an existing output dir")
    args = ap.parse_args()

    h5 = os.path.join(args.out, "example", "0000", "0000.hdf5")
    root = os.path.join(os.path.dirname(__file__), "..")
    if not args.skip_run:
        cmd = [sys.executable, "run_sample.py",
               "-c", args.config,
               "--tf_ckpt", "/root/reference/checkpoints/Liquid3d/ckpt",
               "--vel", "2", "0", "-1.2",
               "--inflow", str(args.steps),
               "--inflow_every", str(args.every),
               "--timesteps", str(args.steps),
               "--chunk", str(args.chunk),
               "--boundary_crop_max", str(args.crop),
               "--device", args.device,
               "--output_dir", args.out]
        print("running:", " ".join(cmd))
        r = subprocess.run(cmd, cwd=root, capture_output=True, text=True)
        sys.stdout.write(r.stdout[-4000:])
        sys.stderr.write(r.stderr[-2000:])
        assert r.returncode == 0, f"run_sample failed rc={r.returncode}"

    report = analyze(h5)
    if not args.skip_run:
        # neighbor-exactness evidence from the run itself
        report["overflow_report"] = [
            ln for ln in r.stdout.splitlines()
            if "over rollout" in ln or "overflow" in ln]
        report["args"] = {"crop": args.crop, "every": args.every,
                          "steps": args.steps}
    print(json.dumps(report, indent=1))

    tag = os.path.basename(os.path.normpath(args.out)) or "canyon_demo"
    strip = os.path.join(root, "docs", f"{tag}_strip.png")
    r = subprocess.run([sys.executable, "-m", "dmcf_tpu.viz.draw2d", h5,
                        strip, "--num_frames", "6",
                        "--pointsets", "pred,Ours"], cwd=root)
    print("strip:", strip, "rc=", r.returncode)
    with open(os.path.join(root, "docs", f"{tag}.json"), "w") as f:
        json.dump(report, f, indent=1)


if __name__ == "__main__":
    main()
