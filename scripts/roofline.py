#!/usr/bin/env python
"""Roofline analysis of the bench-scale forward step (VERDICT r3 item 7).

The bench step is HBM-bound, not FLOP-bound, so the relevant roofline is
bytes: this script compiles the single bench-protocol forward step (same
scene builder as bench.py), pulls XLA's cost analysis (flops + bytes
accessed), measures steady-state ms/step via a scan harness, and prints the
achieved HBM bandwidth against the v5e peak alongside MFU.

Reference protocol being modeled: /root/reference/pipelines/simulator.py
rollout loop (73-109) — one forward per frame, no grad.

Usage:  python scripts/roofline.py [--steps=N]
Prints one JSON line.
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

V5E_PEAK_BF16_FLOPS = 197e12   # per chip
V5E_PEAK_HBM_GBS = 819.0       # GB/s per chip


def main():
    steps = 200
    for a in sys.argv[1:]:
        if a.startswith("--steps="):
            steps = int(a.split("=", 1)[1])

    import jax
    import jax.numpy as jnp
    import yaml

    from bench import build_scene
    from dmcf_tpu.data.dataflow import pad_rollout_state
    from dmcf_tpu.models import build_model
    from dmcf_tpu.utils import enable_compilation_cache
    enable_compilation_cache()

    cfg = yaml.safe_load(open(os.path.join(
        os.path.dirname(__file__), "..", "configs/WaterRamps.yml")))["model"]
    model = build_model(cfg)

    pos, box, nrm = build_scene()
    data = {
        "pos": pos[None], "vel": np.zeros_like(pos)[None],
        "grav": np.broadcast_to(
            np.array([0, -9.81, 0], np.float32), pos.shape)[None].copy(),
        "box": box, "box_normals": nrm,
    }
    state = pad_rollout_state(data, bucket=128)
    sample = {
        "pos": jnp.asarray(state["pos"][0]),
        "vel": jnp.asarray(state["vel"][0]),
        "grav": jnp.asarray(state["grav"][0]),
        "box": jnp.asarray(state["box"]),
        "box_normals": jnp.asarray(state["box_normals"]),
        "fluid_mask": jnp.asarray(state["fluid_mask"]),
        "box_mask": jnp.asarray(state["box_mask"]),
    }
    params = jax.jit(lambda key, s: model.init(key, s, training=False))(
        jax.random.PRNGKey(0), sample)

    # compiled-step cost analysis
    single = jax.jit(lambda pr, s: model.apply(pr, s, training=False))
    compiled = single.lower(params, sample).compile()
    cost = compiled.cost_analysis()
    if isinstance(cost, list):
        cost = cost[0]
    flops = float(cost.get("flops", 0.0))
    # XLA reports "bytes accessed" (total) plus per-operand/output splits
    bytes_total = float(cost.get("bytes accessed", 0.0))

    # steady-state timing through a scan harness (block_until_ready alone
    # returns early on this tunnel — sync via host transfer)
    def rollout(params, s0, length):
        def body(carry, _):
            p_, v_ = carry
            s = dict(s0)
            s["pos"], s["vel"] = p_, v_
            p2, v2, _ = model.apply(params, s, training=False)
            return (p2, v2), ()
        carry, _ = jax.lax.scan(body, (s0["pos"], s0["vel"]), None,
                                length=length)
        return carry
    roll = jax.jit(rollout, static_argnames=("length",))
    p, v = roll(params, sample, steps)
    np.asarray(p[:1])
    t0 = time.time()
    p, v = roll(params, sample, steps)
    np.asarray(p[:1])
    dt = time.time() - t0
    ms = 1000.0 * dt / steps

    achieved_gbs = bytes_total / (dt / steps) / 1e9 if bytes_total else None
    mfu = 100.0 * flops / (dt / steps) / V5E_PEAK_BF16_FLOPS
    # arithmetic intensity and the machine balance point
    ai = flops / bytes_total if bytes_total else None
    balance = V5E_PEAK_BF16_FLOPS / (V5E_PEAK_HBM_GBS * 1e9)

    print(json.dumps({
        "ms_per_step": round(ms, 3),
        "flops_per_step": flops,
        "bytes_per_step": bytes_total,
        "arithmetic_intensity_flops_per_byte": round(ai, 2) if ai else None,
        "machine_balance_flops_per_byte": round(balance, 1),
        "bound": ("hbm" if ai is not None and ai < balance else "flops"),
        "achieved_hbm_gbs": round(achieved_gbs, 1) if achieved_gbs else None,
        "hbm_peak_gbs": V5E_PEAK_HBM_GBS,
        "hbm_utilization_pct": (round(100 * achieved_gbs / V5E_PEAK_HBM_GBS, 1)
                                if achieved_gbs else None),
        "mfu_pct": round(mfu, 3),
        "device": str(jax.devices()[0]),
    }))
    sys.stdout.flush()
    os._exit(0)


if __name__ == "__main__":
    main()
