#!/usr/bin/env python
"""A/B the train step's remat/prefetch variants with trustworthy timing.

The tunnel makes naive timing lie twice over (block_until_ready returns
early; device->host transfers serialize the dispatch queue at ~0.4 s per
pending step), so each variant is measured as ONE device execution: a
lax.scan of K chained train steps, synced once via np.asarray.  Per-step
cost = (t(2K) - t(K)) / K, which also cancels the constant sync cost.

Usage: python scripts/probe_train_variants.py [--k 8] \
           [--variants A,B,C,D,E]
  A: batched pair prefetch ON,  save searches+taps   (round-3 code)
  B: prefetch ON,  save nothing (plain jax.checkpoint)
  C: prefetch ON,  save neighbor lists only
  D: prefetch OFF, save searches+taps
  E: prefetch OFF, save nothing                      (round-2 code)
"""

import argparse
import os
import sys
import time

import numpy as np
import yaml

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

VARIANTS = {
    "A": (True, "all"), "B": (True, "0"), "C": (True, "nbr"),
    "D": (False, "all"), "E": (False, "0"), "F": (False, "full"),
}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--k", type=int, default=8)
    ap.add_argument("--cfg", default="configs/column/symnet_wide.yml")
    ap.add_argument("--variants", default="A,B,C,D,E")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import optax

    from dmcf_tpu.data import DatasetGroup, get_dataloader
    from dmcf_tpu.models import build_model
    from dmcf_tpu.models.losses import get_loss
    from dmcf_tpu.utils import enable_compilation_cache

    enable_compilation_cache()

    cfg = yaml.safe_load(open(args.cfg))
    ds = DatasetGroup(**cfg["dataset"], split="train")
    pcfg = cfg["pipeline"]
    dg = dict(pcfg["data_generator"])
    tr = dict(dg.pop("train"))
    dg.pop("valid", None), dg.pop("test", None)
    window, warm = 5, 5
    loader = get_dataloader(ds.train, batch_size=int(pcfg["batch_size"]),
                            window=window, pre_frames=warm, **dg, **tr)
    batch = next(loader)
    dbatch = {k: jnp.asarray(v) for k, v in batch.items()
              if v is not None}
    time_w = jnp.ones((window,), jnp.float32)
    loss_cfg = cfg["model"]["loss"]
    optimizer = optax.adam(1e-4, eps=1e-6)

    sample = {k: jnp.asarray(v[0]) for k, v in batch.items()
              if v is not None and k != "pre"}
    sample["pos"] = sample["pos"][0]
    sample["vel"] = sample["vel"][0]
    if "grav" in sample:
        sample["grav"] = sample["grav"][0]

    results = {}
    for name in args.variants.split(","):
        prefetch, save_mode = VARIANTS[name]
        os.environ["DMCF_SAVE_SEARCHES"] = save_mode
        mcfg = dict(cfg["model"])
        mcfg["batch_pair_searches"] = prefetch
        model = build_model(mcfg)
        loss_fns = {k: get_loss(**dict(v)) for k, v in loss_cfg.items()}
        # import inside the loop: make_train_step reads the env var at
        # trace time
        from dmcf_tpu.pipelines.simulator import make_train_step
        step = make_train_step(model, loss_fns, optimizer, window=window,
                               its=0, max_err=None,
                               max_dens_err=pcfg.get("max_dens_err"))
        params = jax.jit(lambda k2, s: model.init(k2, s,
                                                  training=False))(
            jax.random.PRNGKey(0), sample)
        opt_state = optimizer.init(params)

        def chain(params, opt_state, n):
            def body(carry, _):
                p, o = carry
                p, o, lvec, pre, st = step(p, o, dbatch, time_w)
                return (p, o), jnp.sum(lvec)
            (p, o), ls = jax.lax.scan(body, (params, opt_state), None,
                                      length=n)
            return ls[-1]

        runner = jax.jit(chain, static_argnames=("n",))

        def timed(n):
            t0 = time.time()
            np.asarray(runner(params, opt_state, n))
            return time.time() - t0

        timed(args.k)          # compile + warm
        timed(2 * args.k)      # compile + warm
        t1 = min(timed(args.k) for _ in range(2))
        t2 = min(timed(2 * args.k) for _ in range(2))
        per = (t2 - t1) / args.k
        results[name] = per
        print(f"variant {name} (prefetch={prefetch}, save={save_mode}): "
              f"{per * 1e3:.1f} ms/step  [t{args.k}={t1:.2f}s "
              f"t{2 * args.k}={t2:.2f}s]", flush=True)

    print({k: round(v * 1e3, 1) for k, v in results.items()})
    sys.stdout.flush()
    os._exit(0)


if __name__ == "__main__":
    main()
