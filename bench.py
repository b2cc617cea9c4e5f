#!/usr/bin/env python
"""Rollout throughput benchmark (the BASELINE.md headline metric).

Measures steady-state simulation steps/sec of the flagship SymNet (DMCF)
model on a WaterRamps-scale 2D scene (~2.3k fluid + ~0.5k boundary
particles, 600-frame horizon — configs/WaterRamps.yml test protocol), with
the whole rollout running on device as one lax.scan.

vs_baseline: the reference publishes no numbers (BASELINE.md); we anchor to
an estimated 20 steps/s (50 ms/step) for the TF/CUDA reference on this
scene class.  Derivation (see BASELINE.md "Baseline derivation"): the
WaterRamps SymNet forward issues 27 ContinuousConv calls, EACH running its
own Open3D FixedRadiusSearch (hash-table build + query kernels) because the
reference never reuses searches across layers (utils/convolutions.py:352-373),
plus ~28 ragged continuous_conv ops, ~10 dense layers and the ragged
bookkeeping between them — several hundred CUDA kernel launches on ~2.3k
particles, each too small to hide launch + TF-runtime overhead, so the step
is launch-bound: 300-1000 launches x ~50-100 us effective cost ~= 30-80 ms.
20 steps/s (50 ms) sits in the middle of that band and is, if anything,
charitable to the reference.  The driver's north star is >=5x that, i.e.
vs_baseline >= 5.  (Real WaterRamps initial frames would be preferred over
the synthetic scene, but the dataset needs a network download —
reference download_waterramps.sh — and this environment has zero egress;
the synthetic scene matches its particle counts and geometry class.)

Prints exactly one JSON line.
"""

import json
import os
import sys
import time

import numpy as np

REFERENCE_STEPS_PER_SEC = 20.0  # documented estimate, see module docstring
HORIZON = 600


def build_scene(n_fluid=2304, spacing=0.01, seed=0):
    """Dam-break-like block resting on a ramped floor, GNS WaterRamps scale:
    fluid at rest spacing, boundary = floor + two walls + a ramp."""
    rng = np.random.RandomState(seed)
    side = int(np.ceil(np.sqrt(n_fluid)))
    xs, ys = np.meshgrid(np.arange(side), np.arange(side), indexing="ij")
    pos = np.stack([xs.reshape(-1), ys.reshape(-1),
                    np.zeros(side * side)], -1)[:n_fluid] * spacing
    pos[:, 0] -= 0.45
    pos[:, 1] -= 0.45
    pos = pos + rng.normal(scale=spacing * 0.01, size=pos.shape)
    pos[:, 2] = 0.0

    # boundary: floor, walls, ramp
    m = int(1.0 / spacing)
    line = np.arange(m) * spacing - 0.5
    floor = np.stack([line, np.full(m, -0.5), np.zeros(m)], -1)
    left = np.stack([np.full(m, -0.5), line, np.zeros(m)], -1)
    right = np.stack([np.full(m, 0.5), line, np.zeros(m)], -1)
    ramp_x = np.arange(m // 2) * spacing
    ramp = np.stack([ramp_x, -0.5 + ramp_x * 0.5,
                     np.zeros(m // 2)], -1)
    box = np.concatenate([floor, left, right, ramp], 0).astype(np.float32)
    nrm = np.zeros_like(box)
    nrm[:m, 1] = 1.0
    nrm[m:2 * m, 0] = 1.0
    nrm[2 * m:3 * m, 0] = -1.0
    nrm[3 * m:, 1] = 1.0
    return pos.astype(np.float32), box, nrm


# Canyon right-sizing (round 5, measured ladder — scripts/canyon_stats.py
# + scripts/trace_canyon.py on TPU v5e):
#   r4 shipped config (crop 32768):                     3306 ms/step exact
#   crop 8192 (in-contact boundary is 6403; the crop keeps ALL of it and
#   the count is verified each timed step) + scale capacities re-sized to
#   dilated-voxel occupancy:                            1106 ms/step exact
#   per-pair K budgets re-sized to 5-step dynamic maxima (measured via
#   aux['pair_overflow_detail']) x ~1.2 headroom, K-chunk scan off (the
#   [Q,K,S] transients fit at this scale):               922 ms/step exact
# The shipped YAML keeps the larger crop-65536 budgets (the inflow demo's
# regime, where fluid grows 20x and contact spreads); these overrides are
# the bench scene's own measured-exact sizing and are recorded in the
# result JSON.
CANYON_OVERRIDES = {
    "scale_size_factor": [1.0, 1.35, 0.42],
    "neighbor_k_pairs": [[96, 288, 1408], [288, 288, 1312],
                         [320, 320, 288]],
    "conv_k_chunk": 0,
}


def bench_canyon(canyon_path, steps=5, crop=8192):
    """Steady-state ms/step of the canyon scene (1280-fluid block, 185k
    boundary, contact crop) — the reference's own large-scene demo
    protocol at Liquid3d regime."""
    import jax
    import jax.numpy as jnp
    import yaml

    from dmcf_tpu.data import read_msgpack_zst
    from dmcf_tpu.data.dataflow import pad_particles, sentinel_rows
    from dmcf_tpu.models import build_model

    cfg = yaml.safe_load(open(os.path.join(
        os.path.dirname(__file__) or ".", "configs/Liquid3d.yml")))["model"]
    cfg["boundary_crop_max"] = crop
    cfg.update(CANYON_OVERRIDES)
    model = build_model(cfg)

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
            p_, v_, mx, po, bcc = carry
            s = dict(s0)
            s["pos"], s["vel"] = p_, v_
            p2, v2, aux = model.apply(params, s, training=False)
            mx = jnp.maximum(mx, aux["neighbor_overflow"])
            po = jnp.maximum(po, aux.get("pair_overflow", po))
            bcc = jnp.maximum(bcc, aux.get("boundary_crop_count", bcc))
            return (p2, v2, mx, po, bcc), ()
        carry, _ = jax.lax.scan(
            body, (s0["pos"], s0["vel"], jnp.asarray(0, jnp.int32),
                   jnp.asarray(-(2 ** 30), jnp.int32),
                   jnp.asarray(0, jnp.int32)), None, length=length)
        return carry
    roll = jax.jit(rollout, static_argnames=("length",))
    p, v, mx, po, bcc = roll(params, sample, steps)
    np.asarray(p[:1])  # sync (compile + warm-up)
    t0 = time.time()
    p, v, mx, po, bcc = roll(params, sample, steps)
    np.asarray(p[:1])
    dt = time.time() - t0
    return {
        "ms_per_step": round(1000.0 * dt / steps, 1),
        "steps_per_sec": round(steps / dt, 3),
        "n_fluid": int(n0),
        "n_boundary": int(box.shape[0]),
        "boundary_crop": crop,
        # in-contact boundary count (max over the timed steps): must stay
        # <= crop or the contact crop itself dropped coupled boundary —
        # folded into the exactness gate below
        "boundary_contact_count": int(bcc),
        "overrides": CANYON_OVERRIDES,
        "finite": bool(jnp.all(jnp.isfinite(
            p[np.asarray(sample["fluid_mask"])]))),
        # exactness badge: no conv dropped an in-radius neighbor anywhere
        # in the timed rollout (same gate as the headline scene)
        "max_neighbors": int(mx),
        "neighbor_k": int(cfg.get("neighbor_k", 64)),
        "pair_overflow": int(po),
        "r2_baseline_steps_per_sec": 0.1,
        "vs_r2_baseline": round(steps / dt / 0.1, 1),
    }


def _arm_backend_watchdog(seconds=900):
    """If backend init wedges (tunneled-TPU outage: jax.devices() has been
    observed to hang ~25 min then raise UNAVAILABLE), emit one diagnostic
    JSON line instead of hanging the driver indefinitely."""
    import signal

    def bail(signum, frame):
        print(json.dumps({
            "metric": "WaterRamps_SymNet_rollout_steps_per_sec",
            "value": 0.0, "unit": "steps/s", "vs_baseline": 0.0,
            "detail": {"error": "TPU backend unavailable (init watchdog "
                                f"fired after {seconds}s)"}}))
        sys.stdout.flush()
        os._exit(0)

    signal.signal(signal.SIGALRM, bail)
    signal.alarm(seconds)


def main():
    _arm_backend_watchdog()
    import signal

    import jax
    import jax.numpy as jnp
    import yaml

    from dmcf_tpu.data.dataflow import pad_rollout_state
    from dmcf_tpu.models import build_model
    from dmcf_tpu.utils import enable_compilation_cache
    enable_compilation_cache()
    # first device contact is what wedges during outages; once it
    # succeeds, the long compiles that follow are legitimate — disarm
    np.asarray(jnp.zeros((8,)) + 1.0)
    signal.alarm(0)

    cfg = yaml.safe_load(open(
        os.path.join(os.path.dirname(__file__) or ".",
                     "configs/WaterRamps.yml")))["model"]
    model = build_model(cfg)

    pos, box, nrm = build_scene()
    n = pos.shape[0]
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
            pos, vel, mx, po = carry
            s = dict(s0)
            s["pos"], s["vel"] = pos, vel
            p, v, aux = model.apply(params, s, training=False)
            mx = jnp.maximum(mx, aux["neighbor_overflow"])
            po = jnp.maximum(po, aux.get("pair_overflow", po))
            return (p, v, mx, po), ()
        (p, v, mx, po), _ = jax.lax.scan(
            body, (s0["pos"], s0["vel"], jnp.asarray(0, jnp.int32),
                   jnp.asarray(-(2 ** 30), jnp.int32)), None, length=length)
        return p, v, mx, po

    roll = jax.jit(rollout, static_argnames=("length",))
    # warm-up / compile at the SAME length as the timed run (a different
    # length is a different scan program => the timed call would include
    # compilation), then hard-sync through a host transfer
    p, v, mx, po = roll(params, sample, HORIZON)
    np.asarray(p[:1])

    t0 = time.time()
    p, v, mx, po = roll(params, sample, HORIZON)
    np.asarray(p[:1])
    dt = time.time() - t0
    steps_per_sec = HORIZON / dt

    finite = bool(jnp.all(jnp.isfinite(p[np.asarray(
        sample["fluid_mask"])])))

    # measured FLOPs/step of the compiled single step -> MFU is tracked
    # from now on (VERDICT r2: perf was judged against steps/s alone)
    flops_per_step = None
    mfu_pct = None
    try:
        single = jax.jit(lambda pr, s: model.apply(pr, s, training=False))
        cost = single.lower(params, sample).compile().cost_analysis()
        if isinstance(cost, list):
            cost = cost[0]
        flops_per_step = float(cost.get("flops", 0.0))
        peak = 197e12  # v5e bf16 peak FLOP/s
        mfu_pct = round(100.0 * flops_per_step * steps_per_sec / peak, 3)
    except Exception:
        pass

    # canyon-scale bench (the reference's flagship demo regime,
    # run_sample.py:121-179: 185k boundary + in-graph contact crop).
    # Round-2 ran this at ~0.1 steps/s; the sorted-window cell search
    # (ops/cell_search.py) is the fix being tracked here.
    canyon = None
    canyon_path = ("/root/reference/datasets/canyon_data/"
                   "canyon.msgpack.zst")
    if os.path.exists(canyon_path) and \
            os.environ.get("DMCF_BENCH_LARGE", "1") != "0":
        try:
            canyon = bench_canyon(canyon_path)
        except Exception as e:  # pragma: no cover - defensive
            canyon = {"error": str(e)[:200]}
    # strict exactness gate (VERDICT r3 item 1): the headline number is
    # only meaningful if no conv dropped an in-radius neighbor anywhere in
    # the 600-step rollout.  A violation still prints the JSON line (the
    # driver records it) but exits non-zero so it can't regress silently.
    exact = int(po) <= 0 and int(mx) <= int(cfg.get("neighbor_k", 64))
    # the canyon detail rides the same gate (ADVICE r4): when the canyon
    # bench ran, its overflow counters must also be clean or we exit 1
    if isinstance(canyon, dict) and "error" not in canyon:
        exact = exact and int(canyon.get("pair_overflow", 0)) <= 0 \
            and int(canyon.get("max_neighbors", 0)) <= \
            int(canyon.get("neighbor_k", 1 << 30)) \
            and int(canyon.get("boundary_contact_count", 0)) <= \
            int(canyon.get("boundary_crop", 1 << 30))
    result = {
        "metric": "WaterRamps_SymNet_rollout_steps_per_sec",
        "value": round(steps_per_sec, 2),
        "unit": "steps/s",
        "vs_baseline": round(steps_per_sec / REFERENCE_STEPS_PER_SEC, 2),
        "detail": {
            "exact": exact,
            "horizon": HORIZON,
            "n_fluid": n,
            "n_boundary": int(box.shape[0]),
            "ms_per_step": round(1000.0 * dt / HORIZON, 3),
            "finite": finite,
            "device": str(jax.devices()[0]),
            "baseline_assumption_steps_per_sec": REFERENCE_STEPS_PER_SEC,
            "flops_per_step": flops_per_step,
            "mfu_pct": mfu_pct,
            # neighbor-exactness over the whole rollout: max true count at
            # the finest radius (must be <= neighbor_k) and worst per-pair
            # K-budget excess (<= 0 means no conv dropped any neighbor)
            "max_neighbors": int(mx),
            "neighbor_k": int(cfg.get("neighbor_k", 64)),
            "pair_overflow": int(po),
            "canyon": canyon,
        },
    }
    print(json.dumps(result))
    # tunneled-TPU interpreters hang ~2min in atexit; skip it
    sys.stdout.flush()
    if not exact:
        print(f"EXACTNESS VIOLATION: pair_overflow={int(po)} "
              f"max_neighbors={int(mx)} > K — headline number dropped "
              "neighbors", file=sys.stderr)
        sys.stderr.flush()
        os._exit(1)
    os._exit(0)


if __name__ == "__main__":
    main()
