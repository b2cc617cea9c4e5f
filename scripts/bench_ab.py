#!/usr/bin/env python
"""A/B the bench-scene rollout under model-config overrides.

Usage: python scripts/bench_ab.py KEY=VAL [KEY=VAL ...] [--steps N]
Times a steady-state rollout of the bench.py scene with the WaterRamps
model config patched by the given overrides (YAML-parsed values; dotted
keys descend into nested config dicts).  Unknown top-level keys are an
error — a typo'd override that silently falls through would make the A/B
meaningless.  Prints one JSON line per run, including the rollout's
neighbor/pair overflow maxima so a "faster" config that merely drops
interactions is visible.
"""

import json
import os
import sys
import time

import numpy as np
import yaml

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def _apply_override(cfg, key, value):
    """Set ``a.b.c`` into nested dicts; delete on value None."""
    parts = key.split(".")
    d = cfg
    for p in parts[:-1]:
        if p not in d or not isinstance(d[p], dict):
            d[p] = {}
        d = d[p]
    leaf = parts[-1]
    if value is None and leaf in d:
        del d[leaf]
    else:
        d[leaf] = value


def main():
    steps = 200
    overrides = {}
    args = sys.argv[1:]
    i = 0
    while i < len(args):
        a = args[i]
        if a.startswith("--steps="):
            steps = int(a.split("=", 1)[1])
        elif a == "--steps" and i + 1 < len(args):
            steps = int(args[i + 1])
            i += 1
        elif "=" in a and not a.startswith("--"):
            k, v = a.split("=", 1)
            overrides[k] = yaml.safe_load(v)
        else:
            sys.exit(f"unrecognized argument: {a!r} "
                     "(expected KEY=VAL or --steps N)")
        i += 1

    from bench import _arm_backend_watchdog
    _arm_backend_watchdog()
    import signal

    import jax
    import jax.numpy as jnp

    from bench import build_scene
    from dmcf_tpu.data.dataflow import pad_rollout_state
    from dmcf_tpu.models import build_model
    from dmcf_tpu.utils import enable_compilation_cache
    enable_compilation_cache()
    np.asarray(jnp.zeros((8,)) + 1.0)  # first device contact
    signal.alarm(0)

    cfg = yaml.safe_load(open(os.path.join(
        os.path.dirname(__file__), "..", "configs/WaterRamps.yml")))["model"]
    from dmcf_tpu.models import MODELS, _NON_MODULE_KEYS
    fields = set(
        MODELS[cfg.get("name", "SymNet")].__dataclass_fields__.keys())
    for k, v in overrides.items():
        top = k.split(".", 1)[0]
        if top not in cfg and top not in fields and \
                top not in _NON_MODULE_KEYS:
            sys.exit(f"unknown model config key: {top!r} (not in config, "
                     f"not a {cfg.get('name', 'SymNet')} field)")
        _apply_override(cfg, k, v)
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
            p_, v_, mx, po = carry
            s = dict(s0)
            s["pos"], s["vel"] = p_, v_
            p, v, aux = model.apply(params, s, training=False)
            mx = jnp.maximum(mx, aux["neighbor_overflow"])
            po = jnp.maximum(po, aux.get("pair_overflow", po))
            return (p, v, mx, po), ()
        carry, _ = jax.lax.scan(
            body, (s0["pos"], s0["vel"], jnp.asarray(0, jnp.int32),
                   jnp.asarray(-(2 ** 30), jnp.int32)), None, length=length)
        return carry
    roll = jax.jit(rollout, static_argnames=("length",))
    p, v, mx, po = roll(params, sample, steps)
    np.asarray(p[:1])
    t0 = time.time()
    p, v, mx, po = roll(params, sample, steps)
    np.asarray(p[:1])
    dt = time.time() - t0
    print(json.dumps({
        "overrides": {k: str(v) for k, v in overrides.items()},
        "steps": steps,
        "ms_per_step": round(1000.0 * dt / steps, 3),
        "steps_per_sec": round(steps / dt, 2),
        "finite": bool(jnp.all(jnp.isfinite(
            p[np.asarray(sample["fluid_mask"])]))),
        "max_neighbors": int(mx),
        "pair_overflow": int(po),
    }))
    sys.stdout.flush()
    os._exit(0)


if __name__ == "__main__":
    main()
