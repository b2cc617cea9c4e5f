#!/usr/bin/env python
"""Exercise the WBC-SPH regime end to end (VERDICT r4 item 6).

The real WBC-SPH dataset (reference README.md:35, download-blocked here:
zero egress) is 2D breaking-wave data on complex boundaries, trained at
batch 2 / 50x1000 iters (reference configs/WBC-SPH.yml:51-60) and tested
over 3200-frame rollouts (reference README.md:79).  This synthesizes a
scene *in that regime* — a 2D wave flume at the config's own geometry
(voxel/spacing 0.005, dt 0.0025, particle_radii [0.01..0.08]): dam-break
column collapsing into a shallow pool, running up a sloped beach —
then:

  1. smoke-trains SymNet (the WBC-SPH model shape: kernel [1,8,8],
     grav_eqvar) at the reference budget shape (batch 2, window 3);
  2. runs the full 3200-frame chunked test rollout with the exactness
     badge (max_neighbors <= K, pair_overflow <= 0) enforced;
  3. emits one BENCH-style JSON line.

The trajectory generator is ballistic + boundary reflection + a
position-based separation pass (2 Jacobi iterations at 0.9*spacing),
which keeps packing near rest density so true neighbor counts stay in
the regime the config's K budgets are sized for — the same synthesis
playbook as scripts/gns_scale_run.py, upgraded with the separation pass
because a 3200-frame horizon gives collapse artifacts 16x longer to
accumulate than WaterRamps' 600.

Usage: python scripts/wbc_scale_run.py [--iters 300] [--rollout 3200]
       [--device tpu] [--keep]
"""

import argparse
import glob
import json
import os
import re
import subprocess
import sys
import tempfile
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

H = 0.005            # particle spacing == model voxel_size
DT = 0.0025          # reference configs/WBC-SPH.yml timestep
DOMAIN_X = 2.0
WALL_Y = 0.5
BEACH_X0 = 1.3       # beach toe
BEACH_SLOPE = 0.35


def terrain_y(x):
    return np.maximum(0.0, BEACH_SLOPE * (x - BEACH_X0))


def make_boundary(layers=3):
    """Flume boundary: floor, beach, two walls; outward(-fluid) normals."""
    pts, nor = [], []

    def add(p, n):
        pts.append(p)
        nor.append(np.broadcast_to(np.asarray(n, np.float32), p.shape))

    xs = np.arange(0.0, BEACH_X0, H, dtype=np.float32)
    for k in range(layers):
        add(np.stack([xs, np.full_like(xs, -k * H)], -1), [0.0, 1.0])
    # beach: from toe to domain end, offset into the slope per layer
    th = np.arctan(BEACH_SLOPE)
    n_beach = np.asarray([-np.sin(th), np.cos(th)], np.float32)
    step = H * np.cos(th)
    bx = np.arange(BEACH_X0, DOMAIN_X, step, dtype=np.float32)
    for k in range(layers):
        off = -k * H * n_beach
        add(np.stack([bx + off[0],
                      terrain_y(bx).astype(np.float32) + off[1]], -1),
            n_beach)
    ys = np.arange(0.0, WALL_Y, H, dtype=np.float32)
    for k in range(layers):
        add(np.stack([np.full_like(ys, -k * H), ys], -1), [1.0, 0.0])
        yr = ys[ys > terrain_y(DOMAIN_X) - H]
        add(np.stack([np.full_like(yr, DOMAIN_X + k * H), yr], -1),
            [-1.0, 0.0])
    p = np.concatenate(pts, 0).astype(np.float32)
    n = np.concatenate(nor, 0).astype(np.float32)
    z = np.zeros((p.shape[0], 1), np.float32)
    return np.concatenate([p, z], -1), np.concatenate([n, z], -1)


def _block(x0, x1, y0, y1, rng):
    xs = np.arange(x0, x1, H, dtype=np.float32)
    ys = np.arange(y0, y1, H, dtype=np.float32)
    gx, gy = np.meshgrid(xs, ys, indexing="ij")
    p = np.stack([gx.reshape(-1), gy.reshape(-1)], -1)
    return p + rng.normal(scale=H * 0.02, size=p.shape).astype(np.float32)


def synthesize_flume(rng, t_frames, dam_h=0.25, pool_d=0.05,
                     report_every=None):
    """[T, N, 2] trajectory: dam break into a shallow pool + beach."""
    from scipy.spatial import cKDTree

    pos = np.concatenate([
        _block(0.02, 0.52, 0.005, 0.005 + dam_h, rng),
        _block(0.54, BEACH_X0 - 0.02, 0.005, 0.005 + pool_d, rng),
    ], 0).astype(np.float32)
    vel = np.zeros_like(pos)
    n = pos.shape[0]
    frames = np.empty((t_frames, n, 2), np.float32)
    g = np.asarray([0.0, -9.81], np.float32)
    rest = 0.95 * H
    settled = 0
    for t in range(t_frames):
        frames[t] = pos
        # PBD step: predict, project constraints, derive velocity from
        # the projected positions — keeps packing at rest spacing even
        # under a hydrostatic column (pure reflection integrators let
        # gravity compress the pile without bound)
        vel = vel + DT * g
        prev = pos
        pos = pos + DT * vel
        for _ in range(4):
            pairs = cKDTree(pos).query_pairs(rest, output_type="ndarray")
            if len(pairs):
                d = pos[pairs[:, 0]] - pos[pairs[:, 1]]
                dist = np.maximum(
                    np.linalg.norm(d, axis=1, keepdims=True), 1e-6)
                push = 0.5 * (rest - dist) * d / dist
                pos = pos.copy()
                np.add.at(pos, pairs[:, 0], push)
                np.add.at(pos, pairs[:, 1], -push)
            # boundary projection: clamp inside walls / above terrain
            pos[:, 0] = np.clip(pos[:, 0], 0.0, DOMAIN_X)
            pos[:, 1] = np.minimum(
                np.maximum(pos[:, 1], terrain_y(pos[:, 0])), WALL_Y)
            if not len(pairs) or float(np.abs(push).max()) < 1e-3 * H:
                break
        vel = ((pos - prev) / DT * 0.995).astype(np.float32)
        pos = pos.astype(np.float32)
        # settle early-exit: once the pool is at rest (long horizons spend
        # most frames there, and the late-time Jacobi passes dominate the
        # synthesis cost), freeze the trajectory — physically the settled
        # state IS the remaining ground truth
        if float(np.abs(pos - prev).max()) < 0.02 * H:
            settled += 1
            if settled >= 20:
                frames[t + 1:] = pos
                if report_every:
                    print(f"  settled at frame {t}, froze the remaining "
                          f"{t_frames - t - 1}", flush=True)
                break
        else:
            settled = 0
        if report_every and t % report_every == 0:
            print(f"  synth frame {t}/{t_frames}", flush=True)
    return frames


def write_scene(path, frames2d, box, box_nor, block_size=50):
    """Frames -> msgpack.zst blocks in the reader's schema
    (data/gns_converter.py:325-334): forward-difference velocities."""
    from dmcf_tpu.data.dataset import write_msgpack_zst
    T = frames2d.shape[0]
    z = np.zeros((frames2d.shape[1], 1), np.float32)
    vel = np.concatenate([frames2d[1:] - frames2d[:-1],
                          frames2d[-1:] - frames2d[-2:-1]], 0) / DT
    base = path  # path is a pattern with %02d for the block
    nb = 0
    for bi in range((T + block_size - 1) // block_size):
        fr = []
        for i in range(bi * block_size, min((bi + 1) * block_size, T)):
            fr.append({
                "box": box, "box_normals": box_nor,
                "frame_id": i, "scene_id": "wbc",
                "pos": np.concatenate([frames2d[i], z], -1),
                "vel": np.concatenate([vel[i], z], -1),
            })
        write_msgpack_zst(base % bi, fr)
        nb += 1
    return nb


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--train_scenes", type=int, default=3)
    ap.add_argument("--train_frames", type=int, default=400)
    ap.add_argument("--rollout", type=int, default=3200)
    ap.add_argument("--iters", type=int, default=300)
    ap.add_argument("--batch", type=int, default=2)
    ap.add_argument("--device", default="tpu")
    ap.add_argument("--skip_train", action="store_true")
    ap.add_argument("--synth_only", action="store_true",
                    help="synthesize the dataset into --work and exit")
    ap.add_argument("--work", default=None,
                    help="reuse an existing work dir (skips synthesis "
                         "if its dataset exists)")
    ap.add_argument("--keep", action="store_true")
    args = ap.parse_args()

    root = os.path.join(os.path.dirname(__file__), "..")
    work = args.work or tempfile.mkdtemp(prefix="wbc_scale_")
    data = os.path.join(work, "dataset")
    rng = np.random.RandomState(7)
    box, box_nor = make_boundary()

    def split_done(sub):
        return glob.glob(os.path.join(data, sub, "*.msgpack.zst"))

    t0 = time.time()
    for sub in ("train", "valid", "test"):
        os.makedirs(os.path.join(data, sub), exist_ok=True)
    n_fluid = None
    if not split_done("train"):
        for si in range(args.train_scenes):
            fr = synthesize_flume(rng, args.train_frames,
                                  dam_h=0.2 + 0.05 * si)
            n_fluid = fr.shape[1]
            write_scene(os.path.join(data, "train",
                                     f"sim_{si:04d}_%02d.msgpack.zst"),
                        fr, box, box_nor)
    if not split_done("valid"):
        fr = synthesize_flume(rng, 300, dam_h=0.22)
        write_scene(os.path.join(data, "valid", "sim_0000_%02d.msgpack.zst"),
                    fr, box, box_nor)
    if not split_done("test"):
        fr = synthesize_flume(rng, args.rollout + 1, dam_h=0.25,
                              report_every=500)
        write_scene(os.path.join(data, "test", "sim_0000_%02d.msgpack.zst"),
                    fr, box, box_nor)
        print(f"synthesized: {n_fluid} fluid, {box.shape[0]} boundary, "
              f"{args.train_scenes}x{args.train_frames} train + "
              f"{args.rollout + 1} test frames "
              f"({time.time() - t0:.0f}s)", flush=True)

    if args.synth_only:
        print("work dir:", work)
        return

    logs = os.path.join(work, "logs")
    common = [
        sys.executable, "run_pipeline.py",
        "--cfg_file", "configs/WBC-SPH.yml",
        "--device", args.device,
        "--dataset.dataset_path", data,
        "--pipeline.main_log_dir", logs,
        "--pipeline.train_sum_dir", os.path.join(work, "train_log"),
        "--pipeline.output_dir", os.path.join(work, "output"),
    ]

    summary = {"metric": "wbc_sph_regime", "unit": "steps/s"}
    if not args.skip_train:
        cmd = common + [
            "--split", "train",
            "--pipeline.max_epoch", "0",
            "--pipeline.iter", str(args.iters),
            "--pipeline.batch_size", str(args.batch),
            "--pipeline.run_valid_every_epoch", "False",
            "--pipeline.run_test_every_epoch", "False",
            "--pipeline.log_every", "10",
            "--pipeline.windows", "[3]",
            "--pipeline.window_bnds", "[]",
            "--pipeline.data_generator.train.num_workers", "2",
        ]
        print("training:", " ".join(cmd), flush=True)
        t0 = time.time()
        r = subprocess.run(cmd, cwd=root)
        assert r.returncode == 0, f"train rc={r.returncode}"
        train_wall = time.time() - t0
        losses, hbm = [], []
        for mf in glob.glob(os.path.join(work, "train_log", "*",
                                         "metrics.jsonl")):
            with open(mf) as f:
                for line in f:
                    m = json.loads(line)
                    if m["tag"] == "train/loss":
                        losses.append(m["value"])
                    elif m["tag"] == "train/peak_hbm_gib":
                        hbm.append(m["value"])
        summary["train"] = {
            "iters": args.iters, "batch": args.batch,
            "wall_per_step_ms": round(1000 * train_wall / args.iters, 1),
            "peak_hbm_gib": round(hbm[-1], 2) if hbm else None,
            "loss_first3": [round(v, 4) for v in losses[:3]],
            "loss_last3": [round(v, 4) for v in losses[-3:]],
            "loss_decreasing": bool(losses and
                                    np.mean(losses[-5:]) <
                                    np.mean(losses[:5])),
        }

    # 3200-frame chunked rollout with the exactness badge: strict mode
    # turns any neighbor/pair overflow into a hard failure
    cmd = common + [
        "--split", "test",
        "--pipeline.data_generator.test.time_end", str(args.rollout),
        "--pipeline.test_compute_metric", "False",
        "--pipeline.strict_overflow", "True",
    ]
    print("rollout:", " ".join(cmd), flush=True)
    r = subprocess.run(cmd, cwd=root, capture_output=True, text=True)
    sys.stdout.write(r.stdout[-3000:])
    sys.stderr.write(r.stderr[-3000:])
    assert r.returncode == 0, f"test rollout rc={r.returncode}"
    txt = r.stdout + r.stderr
    mrt = re.search(r"Average runtime: ([0-9.]+) s/step \(([0-9.]+) "
                    r"steps/s\)", txt)
    mnb = re.search(r"max_neighbors=(\d+) avg_neighbors=([0-9.]+) "
                    r"\(K=(\d+)\)", txt)
    h5 = glob.glob(os.path.join(work, "output", "*", "visual", "0000",
                                "*.hdf5"))
    import h5py
    with h5py.File(h5[0], "r") as f:
        grp = f[list(f.keys())[0]]
        pred = np.asarray(grp["pred"])
    summary.update({
        "value": round(float(mrt.group(2)), 2) if mrt else None,
        "rollout_frames": int(pred.shape[0]),
        "ms_per_step": round(1000 * float(mrt.group(1)), 2) if mrt
        else None,
        "exact": True,  # strict_overflow would have failed the run
        "max_neighbors": int(mnb.group(1)) if mnb else None,
        "avg_neighbors": float(mnb.group(2)) if mnb else None,
        "neighbor_k": int(mnb.group(3)) if mnb else None,
        "finite": bool(np.all(np.isfinite(pred))),
    })
    print(json.dumps(summary), flush=True)
    out = os.path.join(root, "docs", "wbc_sph_run.json")
    with open(out, "w") as f:
        json.dump(summary, f, indent=1)
    print("wrote", out)
    if args.keep or args.work:
        print("work dir kept:", work)
    else:
        import shutil
        shutil.rmtree(work, ignore_errors=True)


if __name__ == "__main__":
    main()
