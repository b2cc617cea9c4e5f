#!/usr/bin/env python
"""Probe: does a fresh small host->device upload per step stall the
tunneled TPU's dispatch queue the way device->host readbacks do?

Runs the real wide-column train step N times in three modes:
  A) constant device-resident time_w        (baseline)
  B) fresh jnp.asarray(np time_w) per step  (what the blend region does)
  C) device-computed time_w from a step scalar (the candidate fix)
"""

import time

import numpy as np
import yaml


def main():
    import jax
    import jax.numpy as jnp
    import optax

    from dmcf_tpu.data import DatasetGroup, get_dataloader
    from dmcf_tpu.models import build_model
    from dmcf_tpu.models.losses import get_loss
    from dmcf_tpu.pipelines.simulator import make_train_step
    from dmcf_tpu.utils import enable_compilation_cache

    enable_compilation_cache()
    cfg = yaml.safe_load(open("configs/column/symnet_wide.yml"))
    ds = DatasetGroup(**cfg["dataset"], split="train")
    pcfg = cfg["pipeline"]
    dg = dict(pcfg["data_generator"])
    tr = dict(dg.pop("train"))
    dg.pop("valid", None), dg.pop("test", None)
    window, warm = 5, 5
    loader = get_dataloader(ds.train, batch_size=4, window=window,
                            pre_frames=warm, **dg, **tr)
    batch = next(loader)
    model = build_model(cfg["model"])
    loss_fns = {k: get_loss(**dict(v))
                for k, v in cfg["model"]["loss"].items()}
    optimizer = optax.adam(1e-4, eps=1e-6)
    sample = {k: jnp.asarray(v[0]) for k, v in batch.items()
              if v is not None and k != "pre"}
    sample["pos"], sample["vel"] = sample["pos"][0], sample["vel"][0]
    sample["grav"] = sample["grav"][0]
    params = jax.jit(lambda k, s: model.init(k, s, training=False))(
        jax.random.PRNGKey(0), sample)
    opt_state = optimizer.init(params)
    dbatch = {k: jnp.asarray(v) for k, v in batch.items() if v is not None}
    step = make_train_step(model, loss_fns, optimizer, window=window,
                           its=0, max_err=None,
                           max_dens_err=pcfg.get("max_dens_err"))

    N = 100

    def run(mode):
        p = jax.tree.map(jnp.copy, params)
        o = jax.tree.map(jnp.copy, opt_state)
        tw_const = jnp.ones((window,), jnp.float32)
        # warm-up/compile
        p, o, lvec, *_ = step(p, o, dbatch, tw_const)
        jax.block_until_ready(lvec)
        t0 = time.time()
        for i in range(N):
            if mode == "A":
                tw = tw_const
            elif mode == "B":
                w = np.ones((window,), np.float32)
                w[-2:] = np.clip((i + 1) / N - np.arange(2) / 2, 0, 1)
                tw = jnp.asarray(w)
            p, o, lvec, *_ = step(p, o, dbatch, tw)
        jax.block_until_ready(lvec)
        dt = (time.time() - t0) / N
        print(f"mode {mode}: {dt * 1e3:8.2f} ms/step")

    run("A")
    run("B")
    run("A")

    # also: fresh BATCH upload per step (what prefetch does) for reference
    p = jax.tree.map(jnp.copy, params)
    o = jax.tree.map(jnp.copy, opt_state)
    tw = jnp.ones((window,), jnp.float32)
    p, o, lvec, *_ = step(p, o, dbatch, tw)
    jax.block_until_ready(lvec)
    raw = {k: np.asarray(v) for k, v in dbatch.items()}
    t0 = time.time()
    for i in range(N):
        db = {k: jnp.asarray(v) for k, v in raw.items()}
        p, o, lvec, *_ = step(p, o, db, tw)
    jax.block_until_ready(lvec)
    print(f"fresh-batch-upload: {(time.time() - t0) / N * 1e3:8.2f} ms/step")

    import os
    import sys
    sys.stdout.flush()
    os._exit(0)


if __name__ == "__main__":
    main()
