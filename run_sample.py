#!/usr/bin/env python
"""Standalone large-scene inference demo (canyon scene with inflow).

Equivalent of the reference run_sample.py:77-241: load a msgpack.zst scene,
restore a checkpoint, run a jitted rollout with optional particle inflow
(re-injection of the initial block every 2 steps while t < --inflow), and
write the trajectory to hdf5.

TPU-first design: instead of growing tensors per inflow event (dynamic
shapes => retraces), the particle buffer is pre-allocated at full capacity
(initial block x number of inflow events) and inflow *activates* the next
block by flipping its validity mask inside the jitted scan — fixed shapes
throughout, a single compiled rollout.
"""

import argparse
import os
import sys
import time

import numpy as np
import yaml


def parse_args():
    parser = argparse.ArgumentParser(description="Run a network")
    parser.add_argument("-c", "--cfg_file", help="path to the config file")
    parser.add_argument("--ckpt_path", help="path to the checkpoint")
    parser.add_argument("--tf_ckpt", help="path to a reference TensorFlow "
                        "checkpoint prefix (e.g. .../Liquid3d/ckpt); "
                        "converted to flax on the fly")
    parser.add_argument("--data_path", help="path to the scene data",
                        default="/root/reference/datasets/canyon_data/"
                                "canyon.msgpack.zst")
    parser.add_argument("--inflow", default=0, type=int,
                        help="inflow timing (steps with re-injection)")
    parser.add_argument("--inflow_every", default=2, type=int,
                        help="re-inject the initial block every N steps "
                             "(reference hardcodes 2, run_sample.py:173-177"
                             "; at tamed velocities the previous block has "
                             "not cleared the injection site after 2 steps "
                             "and re-injection explodes the density — "
                             "scale N so blocks clear: N >= block_depth / "
                             "(|v| * dt))")
    parser.add_argument("--timesteps", default=None, type=int)
    parser.add_argument("--vel", default=None, type=float, nargs=3,
                        help="initial/inflow velocity boost (default "
                             "[10, 0, -6], the reference demo's; scale it "
                             "down when driving a checkpoint trained at a "
                             "slower regime, e.g. Liquid3d)")
    parser.add_argument("--chunk", default=0, type=int,
                        help="max rollout steps per device execution "
                             "(0 = whole horizon in one executable; set "
                             "small for huge scenes where one execution "
                             "would exceed the TPU per-execution walltime)")
    parser.add_argument("--device", default="tpu")
    parser.add_argument("--output_dir", default="output")
    parser.add_argument("--boundary_crop_margin", type=float, default=None,
                        help="optional static AABB pre-crop margin for the "
                             "boundary (host-side)")
    parser.add_argument("--boundary_crop_max", type=int, default=0,
                        help="per-step in-graph boundary working-set size "
                             "(the fixed-shape analog of the reference's "
                             "AABB crop; recommended for huge scenes)")
    parser.add_argument("--neighbor_k", type=int, default=0,
                        help="override model.neighbor_k (under compression "
                             "the true in-radius count can exceed the "
                             "config budget; overflow is reported per run)")
    parser.add_argument("--spatial", default="none",
                        choices=["none", "halo"],
                        help="'halo': slab-decompose the scene over ALL "
                             "devices (parallel/halo_model) — each shard "
                             "holds 1/D of the fluid plus its boundary "
                             "slice, so the FULL boundary runs uncropped; "
                             "re-partitions host-side when particles "
                             "drift (incompatible with --inflow / "
                             "--boundary_crop_max)")
    parser.add_argument("--halo_width", type=float, default=0.0,
                        help="halo-zone width (0 = 1.5x the model's "
                             "one-step receptive field)")
    parser.add_argument("--override", action="append", default=[],
                        help="model-config override key=yaml_value "
                             "(repeatable), e.g. "
                             "--override 'neighbor_k_pairs=[[96,...]]'")
    return parser.parse_known_args()[0]


def main():
    args = parse_args()
    np.random.seed(42)

    import jax
    if args.device == "cpu":
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from dmcf_tpu.data import read_msgpack_zst, write_results
    from dmcf_tpu.data.dataflow import pad_particles, sentinel_rows
    from dmcf_tpu.models import build_model
    from dmcf_tpu.utils import enable_compilation_cache, setup_logging

    setup_logging()
    enable_compilation_cache()

    cfg = yaml.safe_load(open(args.cfg_file))
    if args.boundary_crop_max:
        cfg["model"]["boundary_crop_max"] = args.boundary_crop_max
    if args.neighbor_k:
        cfg["model"]["neighbor_k"] = args.neighbor_k
    for ov in args.override:
        key, val = ov.split("=", 1)
        cfg["model"][key] = yaml.safe_load(val)
    model = build_model(cfg["model"])

    data = read_msgpack_zst(args.data_path)
    frame0 = data[0]
    timesteps = args.timesteps if args.timesteps is not None else len(data)

    pos0 = np.asarray(frame0["pos"], np.float32)
    boost = (args.vel if args.vel is not None else [10.0, 0.0, -6.0])
    vel0 = np.asarray(frame0["vel"], np.float32) + \
        np.asarray(boost, np.float32)
    box = np.asarray(frame0["box"], np.float32)
    nrm = np.asarray(frame0["box_normals"], np.float32)
    n0 = pos0.shape[0]

    if args.boundary_crop_margin is not None:
        # static pre-crop of the boundary to the traversable region
        lo = pos0.min(0) - args.boundary_crop_margin
        hi = pos0.max(0) + args.boundary_crop_margin
        keep = np.all((box >= lo) & (box <= hi), axis=-1)
        box, nrm = box[keep], nrm[keep]
        print(f"boundary cropped: {keep.sum()}/{keep.size}")

    # capacity: initial block + one block per inflow event
    every = max(int(args.inflow_every), 1)
    n_events = max(min(args.inflow, timesteps) // every, 0)
    capacity = (1 + n_events) * n0
    capacity = int(-(-capacity // 128) * 128)

    pos = np.concatenate([pos0, sentinel_rows(capacity - n0)], 0)
    vel = np.concatenate([vel0, np.zeros((capacity - n0, 3), np.float32)], 0)
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

    # checkpoint
    params = None
    if args.tf_ckpt:
        from dmcf_tpu.utils.tf_ckpt import load_tf_reference_checkpoint
        template = jax.eval_shape(
            lambda: model.init(jax.random.PRNGKey(0), sample,
                               training=False))
        template = jax.tree.map(lambda s: np.zeros(s.shape, s.dtype),
                                template)
        params = load_tf_reference_checkpoint(
            args.tf_ckpt, template, model.layer_channels,
            use_pre_adv=model.use_pre_adv)
        params = jax.tree.map(jnp.asarray, params)
        print(f"Converted reference TF checkpoint {args.tf_ckpt}")
    elif args.ckpt_path:
        import orbax.checkpoint as ocp
        ckptr = ocp.StandardCheckpointer()
        restored = ckptr.restore(os.path.abspath(args.ckpt_path))
        params = restored.get("params", restored)
        print(f"Restored from {args.ckpt_path}")
    if params is None:
        print("No checkpoint given: using random init")
        params = jax.jit(lambda k, s: model.init(k, s, training=False))(
            jax.random.PRNGKey(0), sample)

    if args.spatial == "halo":
        # slab-decomposed rollout over the device mesh: full boundary, no
        # crop, host-side re-partition on drift (parallel/halo_model.py)
        assert not args.inflow, "--spatial halo does not support --inflow"
        assert not args.boundary_crop_max, \
            "--spatial halo replaces the boundary crop (full boundary)"
        from dmcf_tpu.parallel.halo_model import halo_rollout_host
        from dmcf_tpu.parallel.spatial import make_spatial_mesh
        mesh = make_spatial_mesh(jax.devices())
        n_steps = max(timesteps - 1, 1)
        t0 = time.time()
        frames, report = halo_rollout_host(
            model, mesh, params, sample, n_steps,
            chunk=args.chunk or 10,
            halo_width=args.halo_width or None,
            log=print)
        total = time.time() - t0
        print("Average runtime: %.05f s/step (incl. compile; %d steps, "
              "%d devices)" % (total / n_steps, n_steps,
                               mesh.devices.size))
        print("halo report:", {k: v for k, v in report.items()})
        if report["halo_overflow"] > 0:
            print("HALO OVERFLOW: exchange buffer too small — results "
                  "dropped boundary-zone particles; raise halo_cap")
        if report["pair_overflow"] > 0:
            print(f"pair-search overflow: worst true count exceeded its "
                  f"pair K budget by {report['pair_overflow']}")
        out = np.ones((timesteps, capacity, 3), np.float32) * 1000.0
        out[0, :n0] = pos0
        out[1:, fmask] = frames[:, fmask]
        out_dir = os.path.join(args.output_dir, "example", "0000")
        os.makedirs(out_dir, exist_ok=True)
        write_results(os.path.join(out_dir, "0000.hdf5"),
                      type(model).__name__,
                      [(out, {"name": "pred", "type": "PARTICLE"}),
                       (box, {"name": "bnd", "type": "PARTICLE"})])
        print("wrote", os.path.join(out_dir, "0000.hdf5"))
        sys.stdout.flush()
        os._exit(0)

    inflow_steps = int(args.inflow)
    block_pos = jnp.asarray(pos0)
    block_vel = jnp.asarray(vel0)

    def rollout(params, s0, carry, ts):
        """Scan ``len(ts)`` steps from ``carry``; ts carries the global
        step indices so inflow timing survives chunked execution."""
        def body(carry, t):
            pos, vel, mask, n_active, mx, po, cc, sc = carry
            s = dict(s0)
            s["pos"], s["vel"], s["fluid_mask"] = pos, vel, mask
            p, v, aux = model.apply(params, s, training=False)
            mx = jnp.maximum(mx, aux["neighbor_overflow"])
            po = jnp.maximum(po, aux.get("pair_overflow", po))
            cc = jnp.maximum(cc, aux.get("boundary_crop_count", cc))
            sc = jnp.maximum(sc, aux.get("scale_counts", sc))

            def do_inflow(args_):
                p, v, mask, n_active = args_
                p = jax.lax.dynamic_update_slice(p, block_pos,
                                                 (n_active, 0))
                v = jax.lax.dynamic_update_slice(v, block_vel,
                                                 (n_active, 0))
                idx = jnp.arange(capacity)
                mask = mask | ((idx >= n_active) & (idx < n_active + n0))
                return p, v, mask, n_active + n0

            inflow_now = (t < inflow_steps) & (t % every == every - 1) & \
                (n_active + n0 <= capacity)
            p, v, mask, n_active = jax.lax.cond(
                inflow_now, do_inflow, lambda a: a, (p, v, mask, n_active))
            pod = aux.get("pair_overflow_detail", {})
            return (p, v, mask, n_active, mx, po, cc, sc), (p, mask, pod)

        carry, (ps, ms, pod) = jax.lax.scan(body, carry, ts)
        # reduce the per-pair excess over the chunk here so only a dict of
        # scalars crosses the device boundary
        pod = {k: jnp.max(v) for k, v in pod.items()}
        return carry, ps, ms, pod

    roll = jax.jit(rollout)
    print(f"scene: {n0} fluid (capacity {capacity}), "
          f"{int(bmask.sum())} boundary; {timesteps} steps")
    n_steps = max(timesteps - 1, 1)
    exe_steps = min(args.chunk, n_steps) if args.chunk else n_steps
    n_scales = len(getattr(model, "strides", None) or [1])
    carry = (sample["pos"], sample["vel"], sample["fluid_mask"],
             jnp.asarray(n0, jnp.int32), jnp.asarray(0, jnp.int32),
             jnp.asarray(-(2 ** 30), jnp.int32),
             jnp.asarray(0, jnp.int32),
             jnp.zeros((n_scales,), jnp.int32))
    t0 = time.time()
    ps_parts, ms_parts = [], []
    pod_max = {}
    done = 0
    while done < n_steps:
        # a short final chunk re-runs the full chunk length and discards
        # the excess (a second program shape would mean a second compile)
        ts = jnp.arange(done, done + exe_steps)
        carry, ps_c, ms_c, pod_c = roll(params, sample, carry, ts)
        jax.block_until_ready(ps_c)
        take = min(exe_steps, n_steps - done)
        ps_parts.append(np.asarray(ps_c[:take]))
        ms_parts.append(np.asarray(ms_c[:take]))
        for key, v in pod_c.items():
            pod_max[key] = max(pod_max.get(key, -(1 << 30)), int(v))
        done += take
    total = time.time() - t0
    print("Average runtime: %.05f s/step (incl. compile; %d steps)" %
          (total / n_steps, n_steps))
    max_nbr, pair_over, crop_cnt = (int(carry[4]), int(carry[5]),
                                    int(carry[6]))
    k = int(cfg["model"].get("neighbor_k", 64))
    print(f"max true neighbor count over rollout: {max_nbr} (K={k})"
          + (" — OVERFLOW, neighbors dropped; raise --neighbor_k"
             if max_nbr > k else ""))
    if pair_over > 0:
        print(f"pair-search overflow: worst true count exceeded its pair "
              f"K budget by {pair_over}")
    for key in sorted(pod_max):
        if pod_max[key] > 0:
            print(f"  pair {key}: true count exceeded K by {pod_max[key]}")
    crop_max = int(cfg["model"].get("boundary_crop_max", 0) or 0)
    if crop_max:
        print(f"max in-contact boundary over rollout: {crop_cnt} "
              f"(crop capacity {crop_max})"
              + (" — CROP OVERFLOW, boundary support dropped; raise "
                 "--boundary_crop_max" if crop_cnt > crop_max else ""))
    sc_max = np.asarray(carry[7]).tolist()
    if any(sc_max):
        # mirror the model's capacity formula (models/pbf.py out_maxes);
        # the in-graph contact crop compacts the boundary to its
        # boundary_crop_max slots BEFORE the pyramid is built
        b_rows = int(sample["box"].shape[0])
        bcm = int(getattr(model, "boundary_crop_max", 0) or 0)
        if 0 < bcm < b_rows:
            b_rows = bcm
        all_max = int(sample["pos"].shape[0]) + \
            (b_rows if getattr(model, "use_bnds", True) else 0)
        ssf = getattr(model, "scale_size_factor", 1.0)
        strides = list(getattr(model, "strides", [1]))
        factors = (list(ssf) if isinstance(ssf, (list, tuple))
                   else [float(ssf)] * len(strides))
        caps = [all_max if s == 1 else
                max(8, int(np.ceil(all_max * factors[si])))
                for si, s in enumerate(strides)]
        over = [c for c, cap in zip(sc_max, caps) if c > cap]
        print(f"max scale occupancy over rollout: {sc_max} "
              f"(capacities {caps})"
              + (" — SCALE OVERFLOW, voxels dropped; raise "
                 "scale_size_factor" if over else ""))

    # assemble output: frame 0 + rollout frames, padded with sentinel 1000
    # (reference run_sample.py:215-218)
    ps = np.concatenate(ps_parts, 0)
    ms = np.concatenate(ms_parts, 0)
    out = np.ones((timesteps, capacity, 3), np.float32) * 1000.0
    out[0, :n0] = pos0
    for i in range(ps.shape[0]):
        m = ms[i]
        out[i + 1][m] = ps[i][m]

    out_dir = os.path.join(args.output_dir, "example", "0000")
    os.makedirs(out_dir, exist_ok=True)
    write_results(os.path.join(out_dir, "0000.hdf5"),
                  type(model).__name__,
                  [(out, {"name": "pred", "type": "PARTICLE"}),
                   (box, {"name": "bnd", "type": "PARTICLE"})])
    print("wrote", os.path.join(out_dir, "0000.hdf5"))
    sys.stdout.flush()
    os._exit(0)


if __name__ == "__main__":
    main()
