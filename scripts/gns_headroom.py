#!/usr/bin/env python
"""Exercise the GNS data path at WaterRamps scale and measure loader
headroom (VERDICT r2 item 7).

The real WaterRamps download is egress-blocked, so this synthesizes a
GNS-format tfrecord at the real dataset's per-trajectory scale
(reference datasets/download_waterramps.sh: 2D, ~1000-2500 particles,
600 frames/trajectory, metadata sequence_length 600), runs it through
the full conversion path (`dmcf_tpu.data.gns_converter.convert` — the
same code that would consume the real download), then measures:

  1. conversion throughput (trajectories/s, output blocks)
  2. loader-only throughput at the training configuration
     (batch 16, window 3, num_workers 1/2/4 — reference
     dataset_reader_physics.py:469-517 semantics)
  3. optionally a short end-to-end training run (`--train N` steps) so
     DataLatency lands in the logs next to the step time.

Writes a JSON report (default docs/gns_headroom.json).

Usage:
    python scripts/gns_headroom.py [--root /tmp/gns_wr] [--train 0]
"""

import argparse
import json
import os
import subprocess
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def synthesize(root, n_traj, frames, n_fluid, n_ramp, seed=0):
    """Plausible 2D blob dynamics (damped ballistics + wall bounce) at
    WaterRamps scale; physics fidelity is irrelevant to the data path,
    realistic array shapes/bytes are the point."""
    from dmcf_tpu.data.gns_converter import (encode_sequence_example,
                                             write_tfrecord)
    rng = np.random.RandomState(seed)
    os.makedirs(root, exist_ok=True)
    dt = 0.0025
    records = []
    for _ in range(n_traj):
        c = rng.uniform(0.25, 0.75, 2)
        w = rng.uniform(0.08, 0.18)
        pos = rng.uniform(-1, 1, (n_fluid, 2)) * w + c
        vel = rng.uniform(-1, 1, (1, 2)) * 0.5 + rng.uniform(
            -0.2, 0.2, (n_fluid, 2))
        traj = np.empty((frames, n_fluid, 2), np.float32)
        for t in range(frames):
            vel[:, 1] -= 9.81 * dt
            vel *= 0.999
            pos = pos + vel * dt
            for ax in range(2):
                lo, hi = pos[:, ax] < 0.1, pos[:, ax] > 0.9
                vel[lo | hi, ax] *= -0.3
                pos[:, ax] = np.clip(pos[:, ax], 0.1, 0.9)
            traj[t] = pos
        # a static ramp of type-3 boundary particles (WaterRamps' obstacle)
        rx = rng.uniform(0.2, 0.6)
        ramp = np.stack([np.linspace(rx, rx + 0.25, n_ramp),
                         np.linspace(0.15, 0.3, n_ramp)], -1)
        full = np.concatenate(
            [traj, np.broadcast_to(ramp, (frames, n_ramp, 2))], 1)
        ptype = np.concatenate([np.full(n_fluid, 5), np.full(n_ramp, 3)])
        records.append(encode_sequence_example(full, ptype))
    write_tfrecord(os.path.join(root, "train.tfrecord"), records)
    write_tfrecord(os.path.join(root, "valid.tfrecord"), records[:1])
    with open(os.path.join(root, "metadata.json"), "w") as f:
        json.dump({"dim": 2, "sequence_length": frames - 1,
                   "bounds": [[0.1, 0.9], [0.1, 0.9]], "dt": dt}, f)
    size_mb = os.path.getsize(os.path.join(root, "train.tfrecord")) / 2**20
    return {"trajectories": n_traj, "frames": frames,
            "fluid_particles": n_fluid, "tfrecord_mb": round(size_mb, 1)}


def measure_loader(conv_root, batch_size=16, window=3, n_batches=60):
    from dmcf_tpu.data import get_dataloader
    from dmcf_tpu.data.dataset import Dataset
    ds = Dataset(dataset_path=os.path.join(conv_root, "train"))
    out = {}
    for workers in (1, 2, 4):
        loader = get_dataloader(
            ds, batch_size=batch_size, window=window, repeat=True,
            shuffle_buffer=512, num_workers=workers, stride=1,
            translate=[-0.5, -0.5, 0.0], scale=[1.0, 1.0, 0.0])
        it = iter(loader)
        next(it)  # warm the worker streams
        t0 = time.time()
        for _ in range(n_batches):
            next(it)
        dt_s = time.time() - t0
        loader.close()
        out[f"workers_{workers}"] = {
            "batches_per_s": round(n_batches / dt_s, 2),
            "ms_per_batch": round(1e3 * dt_s / n_batches, 2)}
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--root", default="/tmp/gns_wr")
    ap.add_argument("--traj", type=int, default=8)
    ap.add_argument("--frames", type=int, default=600)
    ap.add_argument("--particles", type=int, default=2000)
    ap.add_argument("--skip_synth", action="store_true")
    ap.add_argument("--train", type=int, default=0,
                    help="also run an end-to-end train of N iterations")
    ap.add_argument("--device", default="cpu")
    ap.add_argument("--out", default="docs/gns_headroom.json")
    args = ap.parse_args()

    report = {}
    raw, conv = args.root, args.root + "_conv"

    if not args.skip_synth:
        t0 = time.time()
        report["synthesize"] = synthesize(raw, args.traj, args.frames,
                                          args.particles, 300)
        report["synthesize"]["seconds"] = round(time.time() - t0, 1)
        print("synthesized:", report["synthesize"], flush=True)

    from dmcf_tpu.data.gns_converter import convert
    t0 = time.time()
    blocks = convert(raw, conv, split="train")
    blocks_v = convert(raw, conv, split="valid")
    dt_s = time.time() - t0
    report["convert"] = {
        "blocks_train": blocks, "blocks_valid": blocks_v,
        "seconds": round(dt_s, 1),
        "traj_per_s": round((args.traj + 1) / dt_s, 2)}
    print("converted:", report["convert"], flush=True)

    report["loader"] = measure_loader(conv)
    print("loader:", json.dumps(report["loader"], indent=1), flush=True)

    if args.train:
        root = os.path.join(os.path.dirname(__file__), "..")
        logdir = "/tmp/gns_headroom_logs"
        cmd = [sys.executable, "run_pipeline.py", "-c",
               "configs/WaterRamps.yml", "--split", "train",
               "--device", args.device,
               "--dataset_path", conv,
               "--main_log_dir", logdir,
               "--pipeline.max_epoch", "1",
               "--pipeline.iter", str(args.train),
               "--pipeline.train_sum_dir", logdir + "/tb"]
        print("running:", " ".join(cmd), flush=True)
        env = dict(os.environ, DMCF_LOOP_TIMING="1")
        t0 = time.time()
        r = subprocess.run(cmd, cwd=root, capture_output=True, text=True,
                           env=env)
        sys.stdout.write(r.stdout[-3000:])
        sys.stderr.write(r.stderr[-2000:])
        timing = [ln.strip() for ln in (r.stdout + r.stderr).splitlines()
                  if "loop timing" in ln]
        report["train"] = {"iters": args.train, "rc": r.returncode,
                           "seconds": round(time.time() - t0, 1),
                           "loop_timing": timing[-3:]}

    out = os.path.join(os.path.dirname(__file__), "..", args.out)
    with open(out, "w") as f:
        json.dump(report, f, indent=1)
    print("report ->", args.out)


if __name__ == "__main__":
    main()


