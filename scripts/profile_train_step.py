#!/usr/bin/env python
"""Measure the wide-column train step on the real TPU and decompose it.

Variants isolate the suspects: warm-up while_loop, BPTT window length,
gradient pass, ASCC 'highest' precision. Writes a jax.profiler trace for
the base variant when --trace is given.
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
    ap.add_argument("--trace", action="store_true")
    ap.add_argument("--steps", type=int, default=20)
    ap.add_argument("--cfg", default="configs/column/symnet_wide.yml")
    ap.add_argument("--no_prefetch", action="store_true",
                    help="disable the batched pair-search prefetch")
    ap.add_argument("--base_only", action="store_true",
                    help="only time the base variant (fast A/B bisect)")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from dmcf_tpu.data import DatasetGroup, get_dataloader
    from dmcf_tpu.models import build_model
    from dmcf_tpu.models.losses import get_loss
    from dmcf_tpu.pipelines.simulator import make_train_step
    from dmcf_tpu.utils import enable_compilation_cache

    enable_compilation_cache()

    cfg = yaml.safe_load(open(args.cfg))
    ds = DatasetGroup(**cfg["dataset"], split="train")
    pcfg = cfg["pipeline"]
    dg = dict(pcfg["data_generator"])
    tr = dict(dg.pop("train"))
    dg.pop("valid", None), dg.pop("test", None)

    window, warm = 5, 5  # post-curriculum shapes (step >= 15000)
    loader = get_dataloader(ds.train, batch_size=int(pcfg["batch_size"]),
                            window=window, pre_frames=warm, **dg, **tr)
    batch = next(loader)

    if args.no_prefetch:
        cfg["model"]["batch_pair_searches"] = False
    model = build_model(cfg["model"])
    loss_cfg = cfg["model"]["loss"]
    loss_fns = {k: get_loss(**dict(v)) for k, v in loss_cfg.items()}

    import optax
    optimizer = optax.adam(1e-4, eps=1e-6)

    sample = {k: jnp.asarray(v[0]) for k, v in batch.items()
              if v is not None and k != "pre"}
    sample["pos"] = sample["pos"][0]
    sample["vel"] = sample["vel"][0]
    if "grav" in sample:
        sample["grav"] = sample["grav"][0]
    params = jax.jit(lambda k, s: model.init(k, s, training=False))(
        jax.random.PRNGKey(0), sample)
    opt_state = optimizer.init(params)

    dbatch = {k: jnp.asarray(v) for k, v in batch.items() if v is not None}
    time_w = jnp.ones((window,), jnp.float32)

    print("batch shapes:", {k: v.shape for k, v in dbatch.items()})

    def timeit(name, **kw):
        base = dict(window=window, its=0, max_err=None,
                    max_dens_err=pcfg.get("max_dens_err"), w_decay=0.0,
                    grad_norm=-1.0)
        base.update(kw)
        step = make_train_step(model, loss_fns, optimizer, **base)
        p, o = jax.tree.map(jnp.copy, params), jax.tree.map(jnp.copy,
                                                            opt_state)
        t0 = time.time()
        p, o, lvec, pre, st = step(p, o, dbatch, time_w[:base["window"]])
        jax.block_until_ready(lvec)
        compile_s = time.time() - t0
        t0 = time.time()
        for _ in range(args.steps):
            p, o, lvec, pre, st = step(p, o, dbatch,
                                       time_w[:base["window"]])
        jax.block_until_ready(lvec)
        dt = (time.time() - t0) / args.steps
        print(f"{name:36s} {dt * 1e3:8.1f} ms/step  "
              f"(compile {compile_s:.0f}s)")
        return dt

    t_base = timeit("base (warm5 win5 dens-guard grad)")
    if args.base_only:
        import sys
        sys.stdout.flush()
        os._exit(0)
    timeit("no dens guard", max_dens_err=None)
    timeit("window 3", window=3)
    t1 = timeit("window 1", window=1)
    print(f"  -> per-unroll-step cost ~ {(t_base - t1) / 4 * 1e3:.1f} ms")

    # warm-up cost: zero out pre
    db0 = dict(dbatch)
    db0["pre"] = jnp.zeros_like(dbatch["pre"])
    step = make_train_step(model, loss_fns, optimizer, window=window, its=0,
                           max_err=None,
                           max_dens_err=pcfg.get("max_dens_err"))
    p, o = jax.tree.map(jnp.copy, params), jax.tree.map(jnp.copy, opt_state)
    p, o, lvec, pre, st = step(p, o, db0, time_w)
    jax.block_until_ready(lvec)
    t0 = time.time()
    for _ in range(args.steps):
        p, o, lvec, pre, st = step(p, o, db0, time_w)
    jax.block_until_ready(lvec)
    print(f"{'pre=0 (no warm-up iterations)':36s} "
          f"{(time.time() - t0) / args.steps * 1e3:8.1f} ms/step")

    # forward-only single model step for reference
    fwd = jax.jit(lambda p, s: model.apply(p, s, training=False)[0])
    pos = fwd(params, sample)
    jax.block_until_ready(pos)
    t0 = time.time()
    for _ in range(args.steps * 5):
        pos = fwd(params, {**sample, "pos": pos})
    jax.block_until_ready(pos)
    print(f"{'single forward step':36s} "
          f"{(time.time() - t0) / (args.steps * 5) * 1e3:8.1f} ms/step")

    if args.trace:
        step = make_train_step(model, loss_fns, optimizer, window=window,
                               its=0, max_err=None,
                               max_dens_err=pcfg.get("max_dens_err"))
        p, o = jax.tree.map(jnp.copy, params), jax.tree.map(jnp.copy,
                                                            opt_state)
        p, o, lvec, *_ = step(p, o, dbatch, time_w)
        jax.block_until_ready(lvec)
        jax.profiler.start_trace("/tmp/train_step_trace")
        for _ in range(3):
            p, o, lvec, *_ = step(p, o, dbatch, time_w)
        jax.block_until_ready(lvec)
        jax.profiler.stop_trace()
        print("trace written to /tmp/train_step_trace")

    sys.stdout.flush()
    os._exit(0)


if __name__ == "__main__":
    main()
