#!/usr/bin/env python
"""Capture a device trace of the column forward step (and optionally the
train step) as one scanned execution, for scripts/parse_trace.py.

The forward is the unit cost every part of training multiplies (warm-up
~9x forward, BPTT window ~5x(fwd+bwd)), so op-level time in the forward
is the whole game for small-scene training throughput.

Usage: python scripts/trace_forward.py [--cfg ...] [--train] [--n 50]
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
    ap.add_argument("--cfg", default="configs/column/symnet_wide.yml")
    ap.add_argument("--n", type=int, default=50)
    ap.add_argument("--train", action="store_true",
                    help="also trace one train step")
    ap.add_argument("--bench", action="store_true",
                    help="trace the bench.py scene instead of a dataset")
    ap.add_argument("--out", default="/tmp/fwd_trace")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from dmcf_tpu.models import build_model
    from dmcf_tpu.utils import enable_compilation_cache

    enable_compilation_cache()

    cfg = yaml.safe_load(open(args.cfg))
    if args.bench:
        # the exact bench.py scene (WaterRamps-scale SymNet free rollout)
        from bench import build_scene
        from dmcf_tpu.data.dataflow import pad_particles, sentinel_rows
        pos0, box, nrm = build_scene()
        n0 = pos0.shape[0]
        cap = int(-(-n0 // 128) * 128)
        pos = np.concatenate([pos0, sentinel_rows(cap - n0)], 0)
        b_cap = int(-(-box.shape[0] // 128) * 128)
        box_p = pad_particles(box, b_cap)
        box_p[box.shape[0]:] = sentinel_rows(b_cap - box.shape[0],
                                             offset=cap)
        mcfg = cfg["model"]
        grav = np.zeros((cap, 3), np.float32)
        grav[:, 1] = float(mcfg.get("grav", -9.81))
        sample = {
            "pos": jnp.asarray(pos),
            "vel": jnp.zeros((cap, 3), jnp.float32),
            "grav": jnp.asarray(grav),
            "box": jnp.asarray(box_p),
            "box_normals": jnp.asarray(pad_particles(nrm, b_cap)),
            "fluid_mask": jnp.asarray(np.arange(cap) < n0),
            "box_mask": jnp.asarray(np.arange(b_cap) < box.shape[0]),
        }
    else:
        from dmcf_tpu.data import DatasetGroup, get_dataloader
        ds = DatasetGroup(**cfg["dataset"], split="train")
        pcfg = cfg["pipeline"]
        dg = dict(pcfg["data_generator"])
        tr = dict(dg.pop("train"))
        dg.pop("valid", None), dg.pop("test", None)
        loader = get_dataloader(ds.train,
                                batch_size=int(pcfg["batch_size"]),
                                window=5, pre_frames=5, **dg, **tr)
        batch = next(loader)
        sample = {k: jnp.asarray(v[0]) for k, v in batch.items()
                  if v is not None and k != "pre"}
        sample["pos"] = sample["pos"][0]
        sample["vel"] = sample["vel"][0]
        if "grav" in sample:
            sample["grav"] = sample["grav"][0]

    model = build_model(cfg["model"])
    params = jax.jit(lambda k, s: model.init(k, s, training=False))(
        jax.random.PRNGKey(0), sample)

    def roll(params, s0, n):
        def body(carry, _):
            p, v = carry
            s = dict(s0)
            s["pos"], s["vel"] = p, v
            p2, v2, _ = model.apply(params, s, training=False)
            return (p2, v2), ()
        (p, v), _ = jax.lax.scan(body, (s0["pos"], s0["vel"]), None,
                                 length=n)
        return p
    run = jax.jit(roll, static_argnames=("n",))

    t0 = time.time()
    np.asarray(run(params, sample, args.n)[:1])
    print(f"compile+first: {time.time() - t0:.1f}s")
    t0 = time.time()
    np.asarray(run(params, sample, args.n)[:1])
    total = time.time() - t0
    print(f"forward: {total / args.n * 1e3:.2f} ms/step "
          f"({args.n} steps in {total:.2f}s)", flush=True)

    jax.profiler.start_trace(args.out)
    np.asarray(run(params, sample, args.n)[:1])
    jax.profiler.stop_trace()
    print("trace:", args.out)

    if args.train and args.bench:
        raise SystemExit("--train needs the dataset path (no --bench)")
    if args.train:
        import optax
        from dmcf_tpu.models.losses import get_loss
        from dmcf_tpu.pipelines.simulator import make_train_step
        dbatch = {k: jnp.asarray(v) for k, v in batch.items()
                  if v is not None}
        time_w = jnp.ones((5,), jnp.float32)
        loss_fns = {k: get_loss(**dict(v))
                    for k, v in cfg["model"]["loss"].items()}
        optimizer = optax.adam(1e-4, eps=1e-6)
        step = make_train_step(model, loss_fns, optimizer, window=5,
                               its=0, max_err=None,
                               max_dens_err=pcfg.get("max_dens_err"))

        def chain(params, opt_state, n):
            def body(carry, _):
                p, o = carry
                p, o, lvec, pre, st = step(p, o, dbatch, time_w)
                return (p, o), jnp.sum(lvec)
            (_, _), ls = jax.lax.scan(body, (params, opt_state), None,
                                      length=n)
            return ls[-1]
        runner = jax.jit(chain, static_argnames=("n",))
        opt_state = optimizer.init(params)
        k = 4
        t0 = time.time()
        np.asarray(runner(params, opt_state, k))
        print(f"train chain compile+first: {time.time() - t0:.1f}s")
        t0 = time.time()
        np.asarray(runner(params, opt_state, k))
        print(f"train step: {(time.time() - t0) / k * 1e3:.1f} ms/step",
              flush=True)
        jax.profiler.start_trace(args.out + "_train")
        np.asarray(runner(params, opt_state, k))
        jax.profiler.stop_trace()
        print("train trace:", args.out + "_train")

    sys.stdout.flush()
    os._exit(0)


if __name__ == "__main__":
    main()
