"""Full multi-scale model step under slab-decomposed (halo) execution.

Extends ``parallel/halo.py`` (one search+conv building block) to the whole
PBF/HRNet/SymNet step (SURVEY §5.7's spatial equivalent; VERDICT r3 item 6):
space is split into D slabs along one axis, each device OWNS its slab's
fluid particles plus a static slice of the boundary, and per step ONE
``ppermute`` pair exchanges the fluid boundary zone (width = the model's
one-step receptive field) with the two neighboring shards.  The full
multi-scale forward — voxel pyramid, per-pair searches, trunk convs, ASCC —
then runs strictly shard-local on the (owned + halo) set, and only the
owned rows' outputs are kept.

Design note (why ONE fat halo instead of per-scale halos at each scale's
radius): a per-scale exchange inserts ~#pairs small collectives between the
trunk's convs, serializing XLA's fusion regions around each one, and saves
halo volume only when the receptive field approaches the slab width.  At
the target regime (canyon: slab width tens of units vs receptive field
~1.5) the fat halo is a few percent of the shard's points, so a single
point-to-point exchange up front both minimizes latency and keeps the whole
forward one fusable shard-local region.  The memory law is the same:

    per-device points ~ N/D + 2H   (H = halo-zone occupancy)
    per-device compute ~ 1/D of the single-device step
    communication      ~ 2H rows over ICI, once per step

Exactness: an owned query's output depends on sources within the one-step
receptive field ``rf`` (sum of conv radii along the deepest influence
chain + voxel-stamp margin, :func:`receptive_field`); with halo_width >= rf
and slab width >= halo_width, the owned+halo set covers that ball, the
voxel pyramid anchors at the GLOBAL centroid (``grid_center``, psum'd — a
shard-local centroid would misalign voxel grids across slabs), and the
owned outputs equal the single-device step to fp-reduction tolerance.

Scope: voxel-pyramid models (``voxel_size`` set — the flagship SymNet
configs).  FPS transitions (``voxel_size: None``) subsample globally and
are not shard-local decomposable; :func:`make_halo_model_step` rejects
them.  Boundary cropping is the single-chip HBM workaround this module
replaces: each shard holds only its boundary slice, so the full boundary
(canyon: 185k rows) runs uncropped.

Ownership is fixed between (re)partitions: particles that drift across a
slab plane mid-rollout are still updated by their owning shard (their halo
coverage degrades with distance); re-partition every O(slab_width /
(v_max * dt)) steps host-side.  ``aux['halo_escaped']`` counts owned
particles outside [lo - halo/2, hi + halo/2) so drivers know when.
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from .halo import _halo_select, slab_partition

_FAR = 1e9


def receptive_field(model, *, voxel_margin=2.0):
    """Conservative one-step influence radius of a PBF-family model.

    Sums the per-hop search radii along the deepest influence chain:
    scale-0 feature convs (r0) + per trunk layer (1 + max extra convs)
    hops at the coarsest radius + ASCC (r0) + pre-advection (r0) + the
    density-pyramid chain when dens_norm consumes it, plus a voxel-stamp
    margin (coarse voxel centers near the halo edge must see their full
    voxel occupancy: diameter + hysteresis stamp of the coarsest grid).
    """
    radii = [float(r) for r in model.particle_radii]
    r0, r_max = radii[0], max(radii)
    lc = model.layer_channels
    rf = r0                                   # scale-0 feature convs
    for layer in lc[1:] if len(lc) > 1 else []:
        extra = max((len(ch) - 1 for ch in layer), default=0)
        rf += (1 + extra) * r_max             # cross-scale + extra convs
    if getattr(model, "sym_channels", None):
        rf += r0 * len(model.sym_channels)    # ASCC stack
    if model.use_pre_adv:
        rf += r0
    if model.dens_norm:
        rf += sum(radii[1:])                  # density pyramid chain
    if model.voxel_size is not None:
        vs = float(np.max(np.asarray(model.voxel_size)))
        stride = max(int(s) for s in model.strides)
        rf += voxel_margin * vs * stride
    return rf


def partition_model_sample(sample, n_dev, halo_width, *, axis=None,
                           bcap_round=8):
    """Host-side slab layout of a model sample for :func:`make_halo_model_step`.

    Fluid is split into equal-count slabs (dynamic: re-exchanged on device
    every step); the static boundary is sliced per shard WITH its halo
    baked in (no exchange needed).  Returns a dict of stacked [D, ...]
    arrays plus metadata; place on the mesh with :func:`shard_model_parts`.
    """
    pos = np.asarray(sample["pos"])
    fmask = np.asarray(sample["fluid_mask"]).astype(bool)
    payload = np.concatenate([np.asarray(sample["vel"]),
                              np.asarray(sample["grav"])], axis=-1)
    parts = slab_partition(pos, fmask, n_dev, axis=axis, payload=payload)
    axis = parts["axis"]
    bounds = parts["bounds"]

    # static boundary slices: shard d holds boundary rows within
    # [lo - halo, hi + halo); 'owned' (in [lo, hi)) rows are flagged so
    # global reductions (centroid psum) count each row exactly once.
    box = np.asarray(sample["box"])
    nrm = np.asarray(sample["box_normals"])
    bmask = np.asarray(sample["box_mask"]).astype(bool)
    coord = box[:, axis]
    sel = []
    for d in range(n_dev):
        lo, hi = bounds[d]
        lo_h = -np.inf if not np.isfinite(lo) else lo - halo_width
        hi_h = np.inf if not np.isfinite(hi) else hi + halo_width
        sel.append(np.nonzero(bmask & (coord >= lo_h) & (coord < hi_h))[0])
    bcap = max(max((s.size for s in sel), default=1), 1)
    # round the boundary capacity up generously (bcap_round, e.g. 1024 for
    # rollout drivers): re-partitions move the slab planes, and a per-shape
    # recompile on every re-partition would dominate the host loop
    bcap = int(-(-bcap // bcap_round) * bcap_round)
    bpos = np.zeros((n_dev, bcap, 3), box.dtype)
    bnrm = np.zeros((n_dev, bcap, 3), nrm.dtype)
    bm = np.zeros((n_dev, bcap), bool)
    bown = np.zeros((n_dev, bcap), bool)
    for d in range(n_dev):
        s = sel[d]
        k = s.size
        bpos[d, :k] = box[s]
        bpos[d, k:] = _FAR + np.arange(bcap - k)[:, None] * 7.0
        bnrm[d, :k] = nrm[s]
        bm[d, :k] = True
        lo, hi = bounds[d]
        bown[d, :k] = (box[s, axis] >= lo) & (box[s, axis] < hi)
    parts.update(box=bpos, box_normals=bnrm, box_mask=bm,
                 box_owned=bown, halo_width=float(halo_width))
    return parts


def shard_model_parts(parts, mesh, axis_name="sp"):
    """Place :func:`partition_model_sample` output on the mesh."""
    sh = NamedSharding(mesh, P(axis_name))
    out = dict(parts)
    for key in ("pos", "mask", "src", "bounds", "payload",
                "box", "box_normals", "box_mask", "box_owned"):
        out[key] = jax.device_put(jnp.asarray(parts[key]), sh)
    return out


def make_halo_model_step(model, mesh, *, halo_width, halo_cap,
                         axis=0, axis_name="sp", training=False):
    """Build the shard-mapped full-model step.

    Returns ``fn(params, parts) -> (pos, vel, aux)`` where ``parts`` is
    :func:`shard_model_parts` output and pos/vel are [D*fcap, 3] in shard
    order (``parts['src']`` maps rows back to input order; only rows with
    ``parts['mask']`` are meaningful).  ``aux`` carries ``halo_overflow``
    (boundary-zone rows beyond ``halo_cap`` — exact iff 0),
    ``halo_escaped`` (owned rows drifting past half the halo margin), and
    the model's own neighbor/pair overflow maxima.
    """
    if model.voxel_size is None and any(int(s) != 1 for s in model.strides):
        raise NotImplementedError(
            "halo decomposition requires the voxel pyramid; FPS "
            "transitions (voxel_size: None) subsample globally")
    n_dev = mesh.devices.size
    right = [(i, i + 1) for i in range(n_dev - 1)]
    left = [(i + 1, i) for i in range(n_dev - 1)]
    payload_c = 6  # vel ++ grav

    def step_core(params, pos, mask, payload, lo, hi,
                  bpos, bnrm, bmask, bown):
        """One shard-local model step on unwrapped per-shard arrays;
        shared by the single-step entry and the scanned rollout."""
        # --- fluid halo exchange (one fat zone at the receptive field) ---
        send_r_pos, send_r_pay, send_r_m, cnt_r = _halo_select(
            pos, mask, payload, axis, hi - halo_width, +1, halo_cap)
        send_l_pos, send_l_pay, send_l_m, cnt_l = _halo_select(
            pos, mask, payload, axis, lo + halo_width, -1, halo_cap)
        over = (jnp.maximum(cnt_r - halo_cap, 0)
                + jnp.maximum(cnt_l - halo_cap, 0))

        recv_l_pos = jax.lax.ppermute(send_r_pos, axis_name, right)
        recv_l_pay = jax.lax.ppermute(send_r_pay, axis_name, right)
        recv_r_pos = jax.lax.ppermute(send_l_pos, axis_name, left)
        recv_r_pay = jax.lax.ppermute(send_l_pay, axis_name, left)
        # the sender's validity mask rides along (ADVICE r4 high): the old
        # one-sided zone test (">= lo - halo") let unused halo slots' far
        # sentinels (~2e9) enter the model step as mask-True fluid, which
        # collapsed grid_pos's voxel extent; a two-sided test would instead
        # drop owned points that drifted into our slab.  Unmatched mesh
        # edges receive zeros -> all-False masks.
        lmask = jax.lax.ppermute(send_r_m, axis_name, right)
        rmask = jax.lax.ppermute(send_l_m, axis_name, left)
        recv_l_pos = jnp.where(
            lmask[:, None], recv_l_pos,
            2 * _FAR + jnp.arange(halo_cap, dtype=pos.dtype)[:, None])
        recv_r_pos = jnp.where(
            rmask[:, None], recv_r_pos,
            3 * _FAR + jnp.arange(halo_cap, dtype=pos.dtype)[:, None])

        fcap = pos.shape[0]
        local_pos = jnp.concatenate([pos, recv_l_pos, recv_r_pos], 0)
        local_mask = jnp.concatenate([mask, lmask, rmask], 0)
        local_pay = jnp.concatenate([payload, recv_l_pay, recv_r_pay], 0)
        vel = local_pay[:, :3]
        grav = local_pay[:, 3:payload_c]

        s = {"pos": local_pos, "vel": vel, "grav": grav,
             "fluid_mask": local_mask,
             "box": bpos, "box_normals": bnrm, "box_mask": bmask}
        if model.centralize:
            # global centroid of the base point set (fluid [+ boundary when
            # use_bnds]) — each row counted once (owned rows only)
            own_f = mask
            fsum = jnp.sum(jnp.where(own_f[:, None], pos, 0.0), 0)
            fcnt = jnp.sum(own_f)
            if model.use_bnds:
                fsum = fsum + jnp.sum(jnp.where(bown[:, None], bpos, 0.0), 0)
                fcnt = fcnt + jnp.sum(bown)
            fsum = jax.lax.psum(fsum, axis_name)
            fcnt = jax.lax.psum(fcnt, axis_name)
            s["grid_center"] = fsum / jnp.maximum(fcnt, 1)

        p2, v2, aux = model.apply(params, s, training=training)

        out_aux = {
            "halo_overflow": over,
            "halo_escaped": jnp.sum(
                mask & ((pos[:, axis] < lo - 0.5 * halo_width)
                        | (pos[:, axis] >= hi + 0.5 * halo_width))),
            "neighbor_overflow": aux["neighbor_overflow"],
            "pair_overflow": jnp.asarray(
                aux.get("pair_overflow", -(2 ** 30)), jnp.int32),
            # per-shard dilated voxel counts: every single-device occupied
            # voxel must be counted by at least its owning shard (grids are
            # anchored at the psum'd global center), so per scale
            # sum_over_shards >= single-device count — a structural
            # exactness witness independent of output tolerances
            "scale_counts": aux["scale_counts"],
        }
        return p2[:fcap], v2[:fcap], out_aux

    def body(params, pos, mask, payload, bounds,
             bpos, bnrm, bmask, bown):
        p2, v2, out_aux = step_core(
            params, pos[0], mask[0], payload[0],
            bounds[0, 0], bounds[0, 1],
            bpos[0], bnrm[0], bmask[0], bown[0])
        out_aux = {k: v[None] for k, v in out_aux.items()}
        return p2[None], v2[None], out_aux

    from jax import shard_map

    sharded, repl = P(axis_name), P()
    fn = shard_map(
        body, mesh=mesh,
        in_specs=(repl, sharded, sharded, sharded, sharded,
                  sharded, sharded, sharded, sharded),
        out_specs=(sharded, sharded,
                   {"halo_overflow": sharded, "halo_escaped": sharded,
                    "neighbor_overflow": sharded,
                    "pair_overflow": sharded, "scale_counts": sharded}),
        check_vma=False)

    # --- differentiable scalar loss over owned rows (training path) ---
    # The loss lives INSIDE the shard_map (psum'd to a replicated scalar),
    # so jax.grad of the wrapper differentiates through the collectives:
    # ppermute's transpose routes halo-row cotangents back to the owning
    # shard, the centroid psum's transpose broadcasts, and the replicated
    # params' in_spec P() makes shard_map psum the per-shard param grads —
    # exactly the DP-over-slabs reduction, with no hand-written backward.
    def loss_body(params, target, w_pos, w_vel, pos, mask, payload, bounds,
                  bpos, bnrm, bmask, bown):
        p2, v2, _ = step_core(params, pos[0], mask[0], payload[0],
                              bounds[0, 0], bounds[0, 1],
                              bpos[0], bnrm[0], bmask[0], bown[0])
        m = mask[0][:, None]
        tgt = target[0]
        err = (w_pos * jnp.sum(jnp.where(m, (p2 - tgt[:, 0]) ** 2, 0.0))
               + w_vel * jnp.sum(jnp.where(m, (v2 - tgt[:, 1]) ** 2, 0.0)))
        err = jax.lax.psum(err, axis_name)
        cnt = jax.lax.psum(jnp.sum(mask[0]), axis_name)
        return err / jnp.maximum(cnt, 1)

    loss_fn = shard_map(
        loss_body, mesh=mesh,
        in_specs=(repl, sharded, repl, repl, sharded, sharded, sharded,
                  sharded, sharded, sharded, sharded, sharded),
        out_specs=repl, check_vma=False)

    def loss(params, parts, target, *, w_pos=1.0, w_vel=0.0):
        """Masked MSE of the owned one-step prediction vs ``target``
        ([D, fcap, 2, 3] shard order: target pos ++ target vel), mean over
        owned rows across ALL shards.  Differentiable: use
        ``jax.value_and_grad(step.loss)(params, parts, target)``."""
        return loss_fn(params, target, jnp.asarray(w_pos, jnp.float32),
                       jnp.asarray(w_vel, jnp.float32),
                       parts["pos"], parts["mask"], parts["payload"],
                       parts["bounds"], parts["box"], parts["box_normals"],
                       parts["box_mask"], parts["box_owned"])

    def run(params, parts):
        p, v, aux = fn(params, parts["pos"], parts["mask"],
                       parts["payload"], parts["bounds"],
                       parts["box"], parts["box_normals"],
                       parts["box_mask"], parts["box_owned"])
        return (p.reshape(-1, 3), v.reshape(-1, 3), {
            "halo_overflow": jnp.sum(aux["halo_overflow"]),
            "halo_escaped": jnp.sum(aux["halo_escaped"]),
            "neighbor_overflow": jnp.max(aux["neighbor_overflow"]),
            "pair_overflow": jnp.max(aux["pair_overflow"]),
            "scale_counts": aux["scale_counts"],  # [D, n_scales]
        })

    # --- multi-step rollout: the same step scanned in shard form ---
    # Ownership is slot-stable inside a chunk (owned rows stay in their
    # shard slots; drift degrades halo coverage and is DETECTED via the
    # per-step halo_escaped max) — the host driver (halo_rollout_host)
    # re-partitions between chunks when any step escaped.
    def roll_body(length, params, pos, mask, payload, bounds,
                  bpos, bnrm, bmask, bown):
        pos, mask, payload = pos[0], mask[0], payload[0]
        bp, bn, bm, bo = bpos[0], bnrm[0], bmask[0], bown[0]
        lo, hi = bounds[0, 0], bounds[0, 1]

        def sbody(carry, _):
            p, pay = carry
            p2, v2, aux = step_core(params, p, mask, pay, lo, hi,
                                    bp, bn, bm, bo)
            pay2 = jnp.concatenate([v2, pay[:, 3:]], -1)
            return (p2, pay2), (p2, aux)

        (pf, payf), (traj, auxs) = jax.lax.scan(
            sbody, (pos, payload), None, length=length)
        red = {
            "halo_overflow": jnp.sum(auxs["halo_overflow"]),
            "halo_escaped": jnp.max(auxs["halo_escaped"]),
            "neighbor_overflow": jnp.max(auxs["neighbor_overflow"]),
            "pair_overflow": jnp.max(auxs["pair_overflow"]),
        }
        red = {k: v[None] for k, v in red.items()}
        return (traj[None], pf[None], payf[None], red)

    _roll_cache = {}

    def _get_roll_fn(length):
        if length not in _roll_cache:
            import functools
            _roll_cache[length] = shard_map(
                functools.partial(roll_body, length), mesh=mesh,
                in_specs=(repl, sharded, sharded, sharded, sharded,
                          sharded, sharded, sharded, sharded),
                out_specs=(sharded, sharded, sharded,
                           {"halo_overflow": sharded,
                            "halo_escaped": sharded,
                            "neighbor_overflow": sharded,
                            "pair_overflow": sharded}),
                check_vma=False)
        return _roll_cache[length]

    def run_rollout(params, parts, length):
        """Scan ``length`` steps in shard form.  Returns
        (traj [length, D*fcap, 3] shard order, new_parts, aux) where
        new_parts reuses parts' static arrays with the final pos/payload
        (chainable into the next chunk or a host re-partition)."""
        traj, pf, payf, aux = _get_roll_fn(int(length))(
            params, parts["pos"], parts["mask"], parts["payload"],
            parts["bounds"], parts["box"], parts["box_normals"],
            parts["box_mask"], parts["box_owned"])
        n_dev, L = traj.shape[0], traj.shape[1]
        traj = jnp.swapaxes(traj, 0, 1).reshape(L, -1, 3)
        new_parts = dict(parts, pos=pf, payload=payf)
        return traj, new_parts, {k: (jnp.sum(v) if k == "halo_overflow"
                                     else jnp.max(v))
                                 for k, v in aux.items()}

    run.rollout = run_rollout
    run.loss = loss
    return run


def gather_owned(parts, arr, n_total):
    """Scatter shard-order rows [D*cap, C] back to input order [N, C]."""
    src = np.asarray(parts["src"]).reshape(-1)
    mask = np.asarray(parts["mask"]).reshape(-1)
    out = np.zeros((n_total,) + arr.shape[1:], np.asarray(arr).dtype)
    out[src[mask]] = np.asarray(arr)[mask]
    return out


def halo_rollout_host(model, mesh, params, sample, n_steps, *,
                      chunk=10, halo_width=None, halo_cap=None,
                      safety=1.5, axis=None, bcap_round=1024, log=None):
    """Multi-step slab-decomposed rollout with host-side re-partition.

    The rollout runs in ``chunk``-step compiled scans on the mesh; between
    chunks the per-step ``halo_escaped`` max is checked and, if any owned
    particle drifted past half the halo margin, the final state is gathered
    to the host and re-partitioned into fresh equal-count slabs (the TPU
    equivalent of the reference redistributing particles across ranks).
    Exactness within a chunk holds while drift stays inside the halo
    slack — ``halo_width`` defaults to ``safety`` x the one-step receptive
    field, so ~``(safety-1)*rf / (v_max*dt)`` steps are provably covered;
    pick ``chunk`` below that and the detector enforces it.

    Returns ``(traj [n_steps, N, 3] input order, report dict)``.  N is the
    sample's fluid capacity; rows outside ``sample['fluid_mask']`` hold
    zeros.  Inflow is not supported here (fixed ownership per chunk).

    Reference scope: this is the no-crop large-scene path — each shard
    holds only its boundary slice, so scenes whose FULL boundary exceeds
    one chip's HBM (canyon: 185k rows, run_sample.py:138-177 in the
    reference) run undropped across the mesh.
    """
    rf = receptive_field(model)
    if halo_width is None:
        halo_width = safety * rf
    n_dev = mesh.devices.size
    n_total = int(np.asarray(sample["pos"]).shape[0])
    if axis is None:
        # pin the slab axis up front (largest fluid extent): re-partitions
        # must keep the axis the compiled step was built for
        p0 = np.asarray(sample["pos"])
        m0 = np.asarray(sample["fluid_mask"]).astype(bool)
        ext = p0[m0].max(0) - p0[m0].min(0) if m0.any() else np.ones(3)
        axis = int(np.argmax(ext))

    def partition(smp):
        parts = partition_model_sample(smp, n_dev, halo_width, axis=axis,
                                       bcap_round=bcap_round)
        return shard_model_parts(parts, mesh)

    parts = partition(sample)
    if halo_cap is None:
        # size the exchange buffer from the initial halo-zone occupancy
        # with 2x headroom; overflow is detected per chunk
        pos = np.asarray(parts["pos"])
        msk = np.asarray(parts["mask"])
        bounds = np.asarray(parts["bounds"])
        occ = 1
        for d in range(n_dev):
            lo, hi = bounds[d]
            c, m = pos[d, :, axis], msk[d]
            if np.isfinite(hi):
                occ = max(occ, int(np.sum(m & (c >= hi - halo_width))))
            if np.isfinite(lo):
                occ = max(occ, int(np.sum(m & (c <= lo + halo_width))))
        halo_cap = int(-(-max(2 * occ, 16) // 16) * 16)

    step = make_halo_model_step(model, mesh, halo_width=halo_width,
                                halo_cap=halo_cap, axis=axis)
    grav = np.asarray(sample["grav"])

    frames = []
    report = {"halo_cap": halo_cap, "halo_width": float(halo_width),
              "repartitions": 0, "halo_overflow": 0, "halo_escaped_max": 0,
              "neighbor_overflow": 0, "pair_overflow": -(2 ** 30)}
    done = 0
    while done < n_steps:
        length = min(chunk, n_steps - done)
        traj, parts, aux = step.rollout(params, parts, length)
        traj = np.asarray(traj)
        esc = int(aux["halo_escaped"])
        report["halo_overflow"] += int(aux["halo_overflow"])
        report["halo_escaped_max"] = max(report["halo_escaped_max"], esc)
        report["neighbor_overflow"] = max(report["neighbor_overflow"],
                                          int(aux["neighbor_overflow"]))
        report["pair_overflow"] = max(report["pair_overflow"],
                                      int(aux["pair_overflow"]))
        for i in range(length):
            frames.append(gather_owned(parts, traj[i], n_total))
        done += length
        if esc > 0 and done < n_steps:
            # drift past half the halo margin: gather the final state and
            # cut fresh equal-count slabs before the next chunk
            p_f = gather_owned(parts, np.asarray(parts["pos"]).reshape(-1, 3),
                               n_total)
            v_f = gather_owned(
                parts, np.asarray(parts["payload"]).reshape(
                    -1, parts["payload"].shape[-1])[:, :3], n_total)
            smp = dict(sample, pos=p_f, vel=v_f, grav=grav)
            parts = partition(smp)
            report["repartitions"] += 1
            if log is not None:
                log(f"halo re-partition at step {done} "
                    f"(escaped={esc})")
    return np.stack(frames, 0), report
