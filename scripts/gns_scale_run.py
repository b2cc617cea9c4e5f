#!/usr/bin/env python
"""Exercise the GNS path at WaterRamps scale and measure loader headroom
(VERDICT r2 item 7).

The real WaterRamps tfrecord needs a network download (zero egress here;
reference download_waterramps.sh), so this synthesizes a tfrecord with the
real dataset's geometry — ~2.3k fluid particles per trajectory, 2D dam
break in the unit box, 600-step sequences, ramp obstacle particles
(type 3) — converts it with the production converter
(dmcf_tpu/data/gns_converter.py, the TF-free protobuf parser), and trains
a few hundred steps at the reference's WaterRamps budget shape
(batch 16, configs/WaterRamps.yml:49-55 analog) with a multi-worker
loader, reporting DataLatency vs step wall time.

Usage:  python scripts/gns_scale_run.py [--iters 200] [--workers 4]
        [--device tpu|cpu] [--keep]
"""

import argparse
import glob
import json
import os
import shutil
import subprocess
import sys
import tempfile
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def synthesize_trajectory(rng, n_fluid=2304, n_bnd=192, t_frames=601,
                          dt=0.0025):
    """2D dam-break-like trajectory in the GNS unit box: fluid block
    falls, spreads on the floor, damps — plausible finite-difference
    velocities for the converter to derive."""
    side = int(np.ceil(np.sqrt(n_fluid)))
    xs, ys = np.meshgrid(np.arange(side), np.arange(side), indexing="ij")
    spacing = 0.3 / side
    pos = np.stack([xs.reshape(-1), ys.reshape(-1)], -1)[:n_fluid] \
        .astype(np.float32) * spacing
    pos += np.asarray([0.15, 0.45], np.float32)
    pos += rng.normal(scale=spacing * 0.02, size=pos.shape) \
        .astype(np.float32)
    vel = np.zeros_like(pos)

    # ramp obstacle: a slanted line of type-3 particles
    rx = np.linspace(0.5, 0.9, n_bnd, dtype=np.float32)
    ry = 0.1 + (rx - 0.5) * 0.5
    bnd = np.stack([rx, ry], -1)

    frames = np.empty((t_frames, n_fluid + n_bnd, 2), np.float32)
    g = np.asarray([0.0, -9.81], np.float32)
    lo, hi = 0.1, 0.9
    for t in range(t_frames):
        frames[t, :n_fluid] = pos
        frames[t, n_fluid:] = bnd
        vel = vel + dt * g
        pos = pos + dt * vel
        # wall/floor bounce with damping
        for ax in range(2):
            under = pos[:, ax] < lo
            over = pos[:, ax] > hi
            pos[under, ax] = lo + (lo - pos[under, ax])
            pos[over, ax] = hi - (pos[over, ax] - hi)
            vel[under | over, ax] *= -0.3
        # ramp: reflect particles crossing the line y = 0.1+(x-0.5)*0.5
        on = (pos[:, 0] >= 0.5) & (pos[:, 0] <= 0.9)
        liney = 0.1 + (pos[:, 0] - 0.5) * 0.5
        below = on & (pos[:, 1] < liney)
        pos[below, 1] = liney[below] + (liney[below] - pos[below, 1])
        vel[below, 1] = np.abs(vel[below, 1]) * 0.3
    ptype = np.concatenate([np.full(n_fluid, 5), np.full(n_bnd, 3)]) \
        .astype(np.int64)
    return frames, ptype


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--trajectories", type=int, default=4)
    ap.add_argument("--frames", type=int, default=601)
    ap.add_argument("--n_fluid", type=int, default=2304)
    ap.add_argument("--iters", type=int, default=200)
    ap.add_argument("--workers", type=int, default=4)
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--window", type=int, default=3)
    ap.add_argument("--device", default="tpu")
    ap.add_argument("--k_chunk", type=int, default=0,
                    help="model.conv_k_chunk override: scan K-list convs "
                         "in this many-neighbor slices, bounding the "
                         "[B,Q,K,S] tap transients (needed on one chip "
                         "past window 3 at batch 16)")
    ap.add_argument("--dense_n_chunk", type=int, default=None,
                    help="model.dense_n_chunk override")
    ap.add_argument("--grad_accum", type=int, default=0,
                    help="pipeline.grad_accum: split the batch into this "
                         "many sequential micro-batches (same math, "
                         "1/G the activation HBM)")
    ap.add_argument("--grad_accum_host", action="store_true",
                    help="pipeline.grad_accum_host: one device execution "
                         "per micro-batch (same math again) — keeps long-"
                         "window steps under the TPU runtime's per-"
                         "execution walltime, which a single in-graph "
                         "batch-16 window-20 execution exceeds")
    ap.add_argument("--keep", action="store_true",
                    help="keep the work dir (print its path)")
    args = ap.parse_args()

    from tests.test_gns_converter import (make_sequence_example,
                                          write_tfrecord)
    from dmcf_tpu.data.gns_converter import convert
    from dmcf_tpu.data.dataset import read_msgpack_zst

    work = tempfile.mkdtemp(prefix="gns_scale_")
    raw = os.path.join(work, "raw")
    os.makedirs(raw)
    rng = np.random.RandomState(0)

    t0 = time.time()
    records = []
    for i in range(args.trajectories):
        frames, ptype = synthesize_trajectory(
            rng, n_fluid=args.n_fluid, t_frames=args.frames)
        records.append(make_sequence_example(frames, ptype))
    write_tfrecord(os.path.join(raw, "train.tfrecord"), records)
    with open(os.path.join(raw, "metadata.json"), "w") as f:
        json.dump({"dim": 2, "sequence_length": args.frames - 1, "dt":
                   0.0025}, f)
    size_mb = os.path.getsize(os.path.join(raw, "train.tfrecord")) / 2**20
    print(f"synthesized {args.trajectories} x {args.frames} frames x "
          f"{args.n_fluid} fluid: {size_mb:.0f} MB tfrecord "
          f"({time.time() - t0:.1f}s)")

    t0 = time.time()
    conv = os.path.join(work, "converted")
    n = convert(raw, conv, split="train")
    # the pipeline's DatasetGroup also opens valid/test subdirs
    for sub in ("valid", "test"):
        os.symlink(os.path.join(conv, "train"), os.path.join(conv, sub))
    files = glob.glob(os.path.join(conv, "train", "*.msgpack.zst"))
    scene = read_msgpack_zst(files[0])
    print(f"converted {n} scene blocks ({time.time() - t0:.1f}s); "
          f"block 0: {len(scene)} frames, "
          f"{scene[0]['pos'].shape[0]} fluid, "
          f"{scene[0]['box'].shape[0]} boundary")

    logs = os.path.join(work, "logs")
    cmd = [
        sys.executable, "run_pipeline.py",
        "--cfg_file", "configs/WaterRamps.yml",
        "--split", "train", "--device", args.device,
        "--dataset.dataset_path", conv,
        "--pipeline.max_epoch", "0",
        "--pipeline.iter", str(args.iters),
        "--pipeline.batch_size", str(args.batch),
        "--pipeline.main_log_dir", logs,
        "--pipeline.train_sum_dir", os.path.join(work, "train_log"),
        "--pipeline.output_dir", os.path.join(work, "output"),
        "--pipeline.run_valid_every_epoch", "False",
        "--pipeline.run_test_every_epoch", "False",
        "--pipeline.log_every", "10",
        # reference opening window 3 (configs/WaterRamps.yml:74): runs on
        # one chip now that the dense pairs' training tap fields are
        # source-chunked + remat'd (model dense_n_chunk; an unchunked
        # batch-16 x window-3 step measured OOM at 16 GB in r3)
        "--pipeline.windows", f"[{args.window}]",
        "--pipeline.window_bnds", "[]",
        "--pipeline.data_generator.train.num_workers", str(args.workers),
        # flush telemetry every 10 steps: the default (1000) keeps the
        # whole run's dispatches queued with zero output, which is
        # indistinguishable from a wedged device from the outside
        "--pipeline.log_flush_steps", "10",
    ]
    if args.k_chunk:
        # K-chunking only applies to convs that build taps inline
        # (models/layers.py: the chunk scan is skipped when a shared tap
        # tensor is passed), and the cached [Q,K,S] tap tensors are what
        # OOM a batch-16 vmapped BPTT step in the first place (measured:
        # 56.9 GB requested, dominated by f32[16,8640,40,64] pair_taps) —
        # so force every conv to the inline-fused form as well
        cmd += ["--model.conv_k_chunk", str(args.k_chunk),
                "--model.tap_cache_max_elems", "1"]
    if args.dense_n_chunk is not None:
        cmd += ["--model.dense_n_chunk", str(args.dense_n_chunk)]
    if args.grad_accum:
        cmd += ["--pipeline.grad_accum", str(args.grad_accum)]
    if args.grad_accum_host:
        cmd += ["--pipeline.grad_accum_host", "True"]
    print("running:", " ".join(cmd))
    t0 = time.time()
    r = subprocess.run(cmd, cwd=os.path.join(os.path.dirname(__file__),
                                             ".."))
    wall = time.time() - t0
    assert r.returncode == 0, f"training failed rc={r.returncode}"

    # pull DataLatency + loss from the run's metrics.jsonl
    metrics = []
    for mf in glob.glob(os.path.join(logs, "*", "*", "metrics.jsonl")) + \
            glob.glob(os.path.join(work, "train_log", "*",
                                   "metrics.jsonl")):
        with open(mf) as f:
            metrics += [json.loads(line) for line in f]
    lat = [m["value"] for m in metrics if m["tag"] == "DataLatency"]
    losses = [m["value"] for m in metrics if m["tag"] == "train/loss"]
    hbm = [m["value"] for m in metrics if m["tag"] == "train/peak_hbm_gib"]
    per_step = wall / max(args.iters, 1)
    print(json.dumps({
        "iters": args.iters, "batch": args.batch,
        "window": args.window, "workers": args.workers,
        "wall_s": round(wall, 1),
        "peak_hbm_gib": round(hbm[-1], 2) if hbm else None,
        "wall_per_step_ms": round(1000 * per_step, 1),
        "data_latency_ms": [round(1000 * v, 2) for v in lat],
        "final_loss": losses[-1] if losses else None,
        "loss_first3": [round(v, 4) for v in losses[:3]],
        "loss_last3": [round(v, 4) for v in losses[-3:]],
        "loss_decreasing": bool(losses and np.mean(losses[-3:]) <
                                np.mean(losses[:3])),
        "loss_finite": bool(np.all(np.isfinite(losses))) if losses
        else None,
    }))
    if args.keep:
        print("work dir kept:", work)
    else:
        shutil.rmtree(work, ignore_errors=True)


if __name__ == "__main__":
    main()
