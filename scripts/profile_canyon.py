#!/usr/bin/env python
"""Profile a canyon-scale simulation step (the reference's flagship demo
scene, run_sample.py:121-179: ~13k fluid block + 185k boundary).

Measures, separately:
  * compile time of the jitted step,
  * steady-state step time (scan of --steps steps, one dispatch),
  * optional jax.profiler trace (--trace) of a short scan.

Knobs mirror run_sample: --boundary_crop_max (in-graph contact crop),
--capacity_mult (simulate the inflow-grown buffer: capacity = mult * n0).
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
    ap.add_argument("--cfg", default="configs/Liquid3d.yml")
    ap.add_argument("--data", default="/root/reference/datasets/"
                    "canyon_data/canyon.msgpack.zst")
    ap.add_argument("--boundary_crop_max", type=int, default=32768)
    ap.add_argument("--capacity_mult", type=int, default=1,
                    help="fluid buffer = mult * n0 (inflow growth)")
    ap.add_argument("--steps", type=int, default=10)
    ap.add_argument("--trace", action="store_true")
    ap.add_argument("--device", default=None)
    args = ap.parse_args()

    import jax
    if args.device == "cpu":
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from dmcf_tpu.data import read_msgpack_zst
    from dmcf_tpu.data.dataflow import pad_particles, sentinel_rows
    from dmcf_tpu.models import build_model
    from dmcf_tpu.utils import enable_compilation_cache

    enable_compilation_cache()

    cfg = yaml.safe_load(open(args.cfg))
    if args.boundary_crop_max:
        cfg["model"]["boundary_crop_max"] = args.boundary_crop_max
    model = build_model(cfg["model"])

    data = read_msgpack_zst(args.data)
    frame0 = data[0]
    pos0 = np.asarray(frame0["pos"], np.float32)
    vel0 = np.asarray(frame0["vel"], np.float32) + \
        np.asarray([2.0, 0.0, -1.2], np.float32)
    box = np.asarray(frame0["box"], np.float32)
    nrm = np.asarray(frame0["box_normals"], np.float32)
    n0 = pos0.shape[0]

    capacity = int(-(-(args.capacity_mult * n0) // 128) * 128)
    pos = np.concatenate([pos0, sentinel_rows(capacity - n0)], 0)
    vel = np.concatenate([vel0, np.zeros((capacity - n0, 3), np.float32)],
                         0)
    grav = np.zeros((capacity, 3), np.float32)
    grav[:, 1] = float(model.grav)
    fmask = np.arange(capacity) < n0

    b_cap = int(-(-box.shape[0] // 128) * 128)
    box_p = pad_particles(box, b_cap)
    box_p[box.shape[0]:] = sentinel_rows(b_cap - box.shape[0],
                                         offset=capacity)
    nrm_p = pad_particles(nrm, b_cap)
    bmask = np.arange(b_cap) < box.shape[0]

    sample = {
        "pos": jnp.asarray(pos), "vel": jnp.asarray(vel),
        "grav": jnp.asarray(grav), "box": jnp.asarray(box_p),
        "box_normals": jnp.asarray(nrm_p),
        "fluid_mask": jnp.asarray(fmask), "box_mask": jnp.asarray(bmask),
    }
    print(f"scene: {n0} fluid (capacity {capacity}), {box.shape[0]} "
          f"boundary (padded {b_cap}), crop {args.boundary_crop_max}")

    params = jax.jit(lambda k, s: model.init(k, s, training=False))(
        jax.random.PRNGKey(0), sample)
    jax.block_until_ready(params)

    def rollout(params, s0, length):
        def body(carry, _):
            p_, v_ = carry
            s = dict(s0)
            s["pos"], s["vel"] = p_, v_
            p, v, _ = model.apply(params, s, training=False)
            return (p, v), ()
        (p, v), _ = jax.lax.scan(body, (s0["pos"], s0["vel"]), None,
                                 length=length)
        return p, v

    roll = jax.jit(rollout, static_argnames=("length",))

    # FLOPs (single step) via XLA cost analysis
    try:
        single = jax.jit(lambda pr, s: model.apply(pr, s, training=False))
        cost = single.lower(params, sample).compile().cost_analysis()
        if isinstance(cost, list):
            cost = cost[0]
        print(f"step flops: {cost.get('flops', 0):.3e}  "
              f"bytes: {cost.get('bytes accessed', 0):.3e}")
    except Exception as e:
        print("cost analysis failed:", e)

    # sync via a host readback: block_until_ready has been observed to
    # return early on the tunneled stack (verify-skill playbook)
    t0 = time.time()
    p, v = roll(params, sample, args.steps)
    np.asarray(p[:1])
    t1 = time.time()
    print(f"first call (compile + {args.steps} steps): {t1 - t0:.2f}s")

    t0 = time.time()
    p, v = roll(params, sample, args.steps)
    np.asarray(p[:1])
    dt = time.time() - t0
    print(f"steady state: {dt / args.steps * 1000:.1f} ms/step "
          f"({args.steps / dt:.3f} steps/s)")

    if args.trace:
        trace_dir = "/tmp/canyon_trace"
        with jax.profiler.trace(trace_dir):
            p, v = roll(params, sample, args.steps)
            jax.block_until_ready(p)
        print("trace written to", trace_dir)

    # tunneled-TPU interpreters hang ~2 min in atexit; skip it
    import sys
    sys.stdout.flush()
    os._exit(0)


if __name__ == "__main__":
    main()
