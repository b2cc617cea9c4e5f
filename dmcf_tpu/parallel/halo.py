"""Slab-decomposed neighbor search + continuous conv with ppermute halo
exchange (SURVEY §5.7/§5.8: the context-parallel analog for neighborhood
models; the reference has no multi-device execution of any kind).

The GSPMD annotation path (``parallel/spatial.py``) scales per-device
FLOPs ~2.9x on 8 devices but lets the partitioner replicate the sort-based
cell-list build, capping temp-HBM relief at ~1.6x.  This module is the
explicit distributed-memory decomposition: space is split into D slabs
along one axis, each device OWNS the points of its slab, and per step only
the boundary-zone points (within ``halo_width`` = the search radius /
coarsest filter extent, reference utils/convolutions.py:352-373 +
configs/WBC-SPH.yml:19-20) are exchanged with the two neighboring shards
over ICI via ``jax.lax.ppermute``.  Each shard then builds its cell list
and evaluates search + convolutions strictly shard-locally:

    per-device memory  ~ (N/D + 2H) points + (N/D) queries' temporaries
    per-device compute ~ 1/D of the single-device step
    communication      ~ 2H boundary-zone rows, point-to-point over ICI

Correctness: a query owned by slab s only has in-radius neighbors in
[lo_s - r, hi_s + r]; with halo_width >= r and slab width >= halo_width
(asserted at partition time) that region is covered by the owned set plus
the two received halos, so results match the single-device search exactly
(same neighbor sets; conv sums may differ by fp reduction order only).

Scope note (TPU-first honesty): per-POINT state is tiny (100k particles =
~1 MB), so replicating points and sharding only queries is usually enough
on TPU — the halo exchange matters when the per-shard *search structure*
(sort + cell probing over all N points) or the point set itself stops
fitting, and as the building block for multi-scale model steps where each
scale exchanges its own halo.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..ops.grid_search import grid_fixed_radius_search
from ..ops.neighbors import NeighborList, select_k_valid


def slab_partition(points, mask, n_dev, *, axis=None, payload=None):
    """Partition a masked point set into ``n_dev`` equal-count slabs.

    Host-side layout step (numpy): valid points are sorted along ``axis``
    (default: the axis of largest extent) and split into ``n_dev``
    contiguous, equal-count groups; each group is padded to the common
    per-shard capacity.  Returns a dict of stacked per-shard arrays plus
    the slab interval bounds and the permutation back to input order.

    Args:
      points: [N, 3] float array (padded rows allowed, masked out).
      mask: [N] bool validity.
      payload: optional [N, C] per-point features to carry along.

    Returns dict with:
      pos [D, cap, 3], mask [D, cap], src [D, cap] int32 (index into the
      input array; 0 where invalid), bounds [D, 2] (slab [lo, hi) planes,
      -inf/+inf at the ends), payload [D, cap, C] (when given).
    """
    points = np.asarray(points)
    mask = np.asarray(mask).astype(bool)
    valid_idx = np.nonzero(mask)[0]
    n_valid = valid_idx.size
    if axis is None:
        if n_valid:
            ext = points[valid_idx].max(0) - points[valid_idx].min(0)
            axis = int(np.argmax(ext))
        else:
            axis = 0
    order = valid_idx[np.argsort(points[valid_idx, axis], kind="stable")]
    cap = max(-(-n_valid // n_dev), 1)
    cap = int(-(-cap // 8) * 8)  # lane-align per-shard rows

    pos_sh = np.zeros((n_dev, cap, 3), points.dtype)
    mask_sh = np.zeros((n_dev, cap), bool)
    src_sh = np.zeros((n_dev, cap), np.int32)
    pay_sh = None
    if payload is not None:
        payload = np.asarray(payload)
        pay_sh = np.zeros((n_dev, cap) + payload.shape[1:], payload.dtype)
    bounds = np.zeros((n_dev, 2), np.float64)
    # equal-count split of the sorted order
    splits = np.linspace(0, n_valid, n_dev + 1).round().astype(int)
    far = 1e9
    for d in range(n_dev):
        sel = order[splits[d]:splits[d + 1]]
        k = sel.size
        pos_sh[d, :k] = points[sel]
        # padded rows parked far away so shard-local cell hashes never
        # collide with real cells
        pos_sh[d, k:] = far + np.arange(cap - k)[:, None] * 7.0
        mask_sh[d, :k] = True
        src_sh[d, :k] = sel
        if pay_sh is not None:
            pay_sh[d, :k] = payload[sel]
        lo = -np.inf if d == 0 else bounds[d - 1, 1]
        if d == n_dev - 1:
            hi = np.inf
        elif splits[d + 1] < n_valid:
            hi = 0.5 * (points[order[splits[d + 1] - 1], axis]
                        + points[order[splits[d + 1]], axis]) \
                if splits[d + 1] > 0 else -np.inf
        else:
            hi = np.inf
        bounds[d] = (lo, hi)
    out = {"pos": pos_sh, "mask": mask_sh, "src": src_sh,
           "bounds": bounds.astype(np.float32), "axis": axis, "cap": cap}
    if pay_sh is not None:
        out["payload"] = pay_sh
    return out


def min_slab_width(bounds):
    """Smallest finite slab width (halo_width must not exceed it)."""
    b = np.asarray(bounds, np.float64)
    widths = b[:, 1] - b[:, 0]
    finite = np.isfinite(widths)
    return float(widths[finite].min()) if finite.any() else np.inf


def _halo_select(pos, mask, payload, axis, plane, side, h_cap):
    """Compact the points within the halo zone of a slab plane into
    ``h_cap`` fixed slots.  side=+1: zone is [plane - width, plane) i.e.
    the shard's right edge (``plane`` already offset by the caller)."""
    coord = pos[:, axis]
    in_zone = mask & ((coord >= plane) if side > 0 else (coord <= plane))
    idx, m, _, count = select_k_valid(in_zone[None, :], None, h_cap)
    idx, m = idx[0], m[0]
    far = 2e9
    hpos = jnp.where(m[:, None], pos[idx],
                     far + jnp.arange(h_cap, dtype=pos.dtype)[:, None])
    hpay = jnp.where(m[:, None], payload[idx], 0.0)
    return hpos, hpay, m, count[0]


def make_halo_search_conv(mesh, *, radius, k, halo_cap, kernel_shape=None,
                          axis=0, axis_name="sp", cell_cap=32,
                          window_fn=None,
                          coordinate_mapping="ball_to_cube_volume_preserving",
                          interpolation="linear", precision="highest"):
    """Build the shard-mapped halo search(+conv) step.

    Returns ``fn(parts, features, kernel) -> (out, halo_overflow)`` where
    ``parts`` are device arrays shaped like :func:`slab_partition`'s output
    (placed with :func:`shard_parts`), ``features`` rides in
    ``parts['payload']``, and ``out`` is [D*cap, Cout] in shard order
    (``parts['src']`` maps rows back to input order).  When ``kernel`` is
    None the function returns the per-query neighbor count instead (search
    only).  ``halo_overflow`` counts boundary-zone points that exceeded
    ``halo_cap`` (results are exact iff it is 0).
    """
    n_dev = mesh.devices.size
    right = [(i, i + 1) for i in range(n_dev - 1)]
    left = [(i + 1, i) for i in range(n_dev - 1)]

    def body(pos, mask, payload, bounds, kernel):
        # shard_map gives per-shard blocks with a leading [1] shard dim
        pos, mask, payload = pos[0], mask[0], payload[0]
        lo, hi = bounds[0, 0], bounds[0, 1]

        # select boundary-zone rows and exchange with both neighbors
        send_r_pos, send_r_pay, send_r_m, cnt_r = _halo_select(
            pos, mask, payload, axis, hi - radius, +1, halo_cap)
        send_l_pos, send_l_pay, send_l_m, cnt_l = _halo_select(
            pos, mask, payload, axis, lo + radius, -1, halo_cap)
        over = (jnp.maximum(cnt_r - halo_cap, 0)
                + jnp.maximum(cnt_l - halo_cap, 0))

        recv_l_pos = jax.lax.ppermute(send_r_pos, axis_name, right)
        recv_l_pay = jax.lax.ppermute(send_r_pay, axis_name, right)
        recv_r_pos = jax.lax.ppermute(send_l_pos, axis_name, left)
        recv_r_pay = jax.lax.ppermute(send_l_pay, axis_name, left)
        # the sender's validity mask rides along (ADVICE r4): a coordinate
        # zone test against OUR planes is one-sided — the far sentinels of
        # unused halo slots pass ">= lo - r" and leak as mask-True rows —
        # and a two-sided test would drop drifted owned points physically
        # inside our slab.  Unmatched edges receive zeros -> all-False.
        lmask = jax.lax.ppermute(send_r_m, axis_name, right)
        rmask = jax.lax.ppermute(send_l_m, axis_name, left)
        far = 3e9
        recv_l_pos = jnp.where(
            lmask[:, None], recv_l_pos,
            far + jnp.arange(halo_cap, dtype=pos.dtype)[:, None])
        recv_r_pos = jnp.where(
            rmask[:, None], recv_r_pos,
            2 * far + jnp.arange(halo_cap, dtype=pos.dtype)[:, None])

        local_pos = jnp.concatenate([pos, recv_l_pos, recv_r_pos], 0)
        local_mask = jnp.concatenate([mask, lmask, rmask], 0)
        local_pay = jnp.concatenate([payload, recv_l_pay, recv_r_pay], 0)

        nl = grid_fixed_radius_search(
            local_pos, pos, radius, k, points_mask=local_mask,
            queries_mask=mask, cell_cap=cell_cap)

        if kernel is None:
            out = nl.count[:, None].astype(jnp.float32)
        else:
            from ..ops.cconv import continuous_conv
            out = continuous_conv(
                kernel, pos, local_pos, local_pay, nl, 2.0 * radius,
                window_fn=window_fn, coordinate_mapping=coordinate_mapping,
                interpolation=interpolation, precision=precision)
            out = jnp.where(mask[:, None], out, 0.0)
        return out[None], over[None]

    from jax import shard_map

    sharded = P(axis_name)
    repl = P()
    fn = shard_map(
        body, mesh=mesh,
        in_specs=(sharded, sharded, sharded, sharded, repl),
        out_specs=(sharded, sharded), check_vma=False)

    def run(parts, kernel=None):
        out, over = fn(parts["pos"], parts["mask"], parts["payload"],
                       parts["bounds"], kernel)
        return out.reshape((-1,) + out.shape[2:]), jnp.sum(over)

    return run


def shard_parts(parts, mesh, axis_name="sp"):
    """Place slab_partition output on the mesh (shard dim 0)."""
    sh = NamedSharding(mesh, P(axis_name))
    out = dict(parts)
    for key in ("pos", "mask", "src", "bounds", "payload"):
        if key in out:
            out[key] = jax.device_put(jnp.asarray(out[key]), sh)
    return out
