#!/usr/bin/env python
"""A/B the bench-scene rollout under model-config overrides.

Usage: python scripts/bench_ab.py KEY=VAL [KEY=VAL ...] [--steps N]
Times a steady-state rollout of the bench.py scene with the WaterRamps
model config patched by the given dotted overrides (YAML-parsed values).
Prints one JSON line per run.
"""

import json
import os
import sys
import time

import numpy as np
import yaml

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    steps = 200
    overrides = {}
    for a in sys.argv[1:]:
        if a.startswith("--steps="):
            steps = int(a.split("=", 1)[1])
        elif "=" in a:
            k, v = a.split("=", 1)
            overrides[k] = yaml.safe_load(v)

    import jax
    import jax.numpy as jnp

    from bench import build_scene
    from dmcf_tpu.data.dataflow import pad_rollout_state
    from dmcf_tpu.models import build_model
    from dmcf_tpu.utils import enable_compilation_cache
    enable_compilation_cache()

    cfg = yaml.safe_load(open(os.path.join(
        os.path.dirname(__file__), "..", "configs/WaterRamps.yml")))["model"]
    for k, v in overrides.items():
        if v is None and k in cfg:
            del cfg[k]
        else:
            cfg[k] = v
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

    def rollout(params, s0, length):
        def body(carry, _):
            p_, v_ = carry
            s = dict(s0)
            s["pos"], s["vel"] = p_, v_
            p, v, _ = model.apply(params, s, training=False)
            return (p, v), ()
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
    print(json.dumps({
        "overrides": {k: str(v) for k, v in overrides.items()},
        "steps": steps,
        "ms_per_step": round(1000.0 * dt / steps, 3),
        "steps_per_sec": round(steps / dt, 2),
        "finite": bool(jnp.all(jnp.isfinite(
            p[np.asarray(sample["fluid_mask"])]))),
    }))
    sys.stdout.flush()
    os._exit(0)


if __name__ == "__main__":
    main()
