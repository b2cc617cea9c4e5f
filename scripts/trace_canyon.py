#!/usr/bin/env python
"""Device-trace the canyon-regime model step (bench.py's bench_canyon
scene) and print top ops via scripts/parse_trace.py.

The canyon is the exact-AND-fast battleground (VERDICT r4 item 1): the
headline scene holds 114 steps/s with exactness, but the canyon regained
exactness at 3.3 s/step.  This script shows where those 3.3 s go.

Usage: python scripts/trace_canyon.py [--steps 3] [--out /tmp/canyon_trace]
"""

import argparse
import os
import sys
import time

import numpy as np
import yaml

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=3)
    ap.add_argument("--crop", type=int, default=32768)
    ap.add_argument("--out", default="/tmp/canyon_trace")
    ap.add_argument("--override", action="append", default=[],
                    help="model-config override key=yaml_value")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from dmcf_tpu.data import read_msgpack_zst
    from dmcf_tpu.data.dataflow import pad_particles, sentinel_rows
    from dmcf_tpu.models import build_model
    from dmcf_tpu.utils import enable_compilation_cache

    enable_compilation_cache()

    root = os.path.join(os.path.dirname(__file__), "..")
    cfg = yaml.safe_load(open(os.path.join(
        root, "configs/Liquid3d.yml")))["model"]
    cfg["boundary_crop_max"] = args.crop
    for ov in args.override:
        k, v = ov.split("=", 1)
        cfg[k] = yaml.safe_load(v)
    model = build_model(cfg)

    canyon_path = "/root/reference/datasets/canyon_data/canyon.msgpack.zst"
    frame0 = read_msgpack_zst(canyon_path)[0]
    pos0 = np.asarray(frame0["pos"], np.float32)
    vel0 = np.asarray(frame0["vel"], np.float32) + \
        np.asarray([2.0, 0.0, -1.2], np.float32)
    box = np.asarray(frame0["box"], np.float32)
    nrm = np.asarray(frame0["box_normals"], np.float32)
    n0 = pos0.shape[0]
    capacity = int(-(-n0 // 128) * 128)
    pos = np.concatenate([pos0, sentinel_rows(capacity - n0)], 0)
    vel = np.concatenate([vel0, np.zeros((capacity - n0, 3),
                                         np.float32)], 0)
    grav = np.zeros((capacity, 3), np.float32)
    grav[:, 1] = float(model.grav)
    b_cap = int(-(-box.shape[0] // 128) * 128)
    box_p = pad_particles(box, b_cap)
    box_p[box.shape[0]:] = sentinel_rows(b_cap - box.shape[0],
                                         offset=capacity)
    sample = {
        "pos": jnp.asarray(pos), "vel": jnp.asarray(vel),
        "grav": jnp.asarray(grav), "box": jnp.asarray(box_p),
        "box_normals": jnp.asarray(pad_particles(nrm, b_cap)),
        "fluid_mask": jnp.asarray(np.arange(capacity) < n0),
        "box_mask": jnp.asarray(np.arange(b_cap) < box.shape[0]),
    }
    params = jax.jit(lambda key, s: model.init(key, s, training=False))(
        jax.random.PRNGKey(0), sample)

    def rollout(params, s0, length):
        def body(carry, _):
            p_, v_ = carry
            s = dict(s0)
            s["pos"], s["vel"] = p_, v_
            p2, v2, aux = model.apply(params, s, training=False)
            return (p2, v2), aux["pair_overflow"]
        carry, po = jax.lax.scan(
            body, (s0["pos"], s0["vel"]), None, length=length)
        return carry[0], jnp.max(po)

    roll = jax.jit(rollout, static_argnames=("length",))
    t0 = time.time()
    p, po = roll(params, sample, args.steps)
    np.asarray(p[:1])
    print(f"compile+first: {time.time() - t0:.1f}s")
    t0 = time.time()
    p, po = roll(params, sample, args.steps)
    np.asarray(p[:1])
    dt = time.time() - t0
    print(f"steady: {1000 * dt / args.steps:.0f} ms/step, "
          f"pair_overflow={int(po)}")

    with jax.profiler.trace(args.out):
        p, po = roll(params, sample, args.steps)
        np.asarray(p[:1])
    print(f"trace written to {args.out}")
    sys.stdout.flush()
    os._exit(0)


if __name__ == "__main__":
    main()
