"""Cell-list fixed-radius neighbor search (sort-based, fixed shapes).

The TPU-native analog of Open3D's spatial-hash FixedRadiusSearch for large
scenes: points are binned into cells of edge ``radius`` by sorting their
hashed cell keys; each query probes its 27 (or 9, for planar data) neighbor
cells via vectorized ``searchsorted`` range lookups, gathers up to
``cell_cap`` candidates per cell, exact-filters them, and keeps the K
nearest.  No atomics, no scatters — sort + gather + top_k, all dense.

Complexity: O(N log N) sort + O(Q * n_offsets * cell_cap) candidate work,
vs O(Q * N) for the brute-force scan — the difference between feasible and
not for the 185k-boundary canyon scene.

Exactness: hash collisions cannot corrupt results — candidates are
re-checked against their *exact* integer cell coordinates (which also
dedups), and the final radius test uses true distances.  The only loss mode
is a cell holding more than ``cell_cap`` points (counted and reported via
``cell_overflow``).
"""

from __future__ import annotations

from itertools import product

import jax
import jax.numpy as jnp
import numpy as np

from .neighbors import NeighborList

_KEY_MAX = np.iinfo(np.int32).max


def _hash_cells(c):
    """[..., 3] int32 cell coords -> int32 hash (murmur-style mix)."""
    c = c.astype(jnp.uint32)
    h = (c[..., 0] * np.uint32(73856093)
         ^ c[..., 1] * np.uint32(19349663)
         ^ c[..., 2] * np.uint32(83492791))
    # final avalanche, keep non-negative so the invalid sentinel sorts last
    h = h ^ (h >> np.uint32(13))
    h = h * np.uint32(0x85EBCA6B)
    h = h ^ (h >> np.uint32(16))
    return (h % np.uint32(2147483629)).astype(jnp.int32)


def contact_weight(points, queries, radius, points_mask=None,
                   queries_mask=None):
    """Per-query fluid-contact weight via cell-hash occupancy.

    Bins ``points`` into cells of edge ``radius`` and, for each query, sums
    the point count over its 27-cell neighborhood.  Guarantees
    ``weight > 0`` for every query within ``radius`` of any point (that
    point's cell is among the 27), i.e. ``weight > 0`` is a superset of the
    true contact set (points up to ~2*sqrt(3)*radius away also count; hash
    collisions can add false positives) — exactly what a conservative
    working-set crop needs.  Cost: one sort of the points + 27 searchsorted
    range lookups per query; no per-cell candidate cap, so arbitrarily
    dense point clumps are fine (unlike the full search's ``cell_cap``).

    Returns int32 ``weight`` of shape [Q].
    """
    n = points.shape[0]
    pm = (jnp.ones((n,), bool) if points_mask is None
          else points_mask.astype(bool))
    inv_cell = 1.0 / jnp.asarray(radius, points.dtype)
    key = jnp.where(pm, _hash_cells(
        jnp.floor(points * inv_cell).astype(jnp.int32)), _KEY_MAX)
    skey = jnp.sort(key)

    offsets = jnp.asarray(list(product((-1, 0, 1), repeat=3)), jnp.int32)
    cq = jnp.floor(queries * inv_cell).astype(jnp.int32)
    probe = _hash_cells(cq[:, None, :] + offsets[None, :, :])  # [Q, 27]
    lo = jnp.searchsorted(skey, probe.reshape(-1)).reshape(probe.shape)
    hi = jnp.searchsorted(skey, probe.reshape(-1),
                          side="right").reshape(probe.shape)
    w = jnp.sum(hi - lo, axis=1).astype(jnp.int32)
    if queries_mask is not None:
        w = jnp.where(queries_mask.astype(bool), w, 0)
    return w


def grid_fixed_radius_search(points,
                             queries,
                             radius,
                             k,
                             points_mask=None,
                             queries_mask=None,
                             metric: str = "L2",
                             ignore_query_point: bool = False,
                             cell_cap: int = 32,
                             planar_axis: int | None = None,
                             query_chunk: int = 8192) -> NeighborList:
    """Drop-in alternative to :func:`fixed_radius_search` for big scenes.

    Args:
      cell_cap: max candidates gathered per probed cell.  Must be >= the max
        occupancy of any cell (cell edge = radius; fluids at rest spacing
        r/2 put ~8 (2D) / ~16 (3D, surface-packed) points per cell).
        Violations are reported via the ``cell_overflow`` attribute attached
        to the result's ``count`` semantics (count stays exact up to cap).
      planar_axis: if the data is planar (2D configs store z=0), pass the
        degenerate axis to probe 9 instead of 27 cells.
    """
    n = points.shape[0]
    q = queries.shape[0]
    radius = jnp.asarray(radius, points.dtype)
    thresh = radius * radius if metric == "L2" else radius

    pm = (jnp.ones((n,), bool) if points_mask is None
          else points_mask.astype(bool))
    qm = (jnp.ones((q,), bool) if queries_mask is None
          else queries_mask.astype(bool))

    inv_cell = 1.0 / radius
    cp = jnp.floor(points * inv_cell).astype(jnp.int32)
    key = jnp.where(pm, _hash_cells(cp), _KEY_MAX)
    order = jnp.argsort(key).astype(jnp.int32)
    skey = key[order]

    axes = [(-1, 0, 1)] * 3
    if planar_axis is not None:
        axes[planar_axis] = (0,)
    offsets = np.asarray(list(product(*axes)), np.int32)  # [n_off, 3]
    n_off = offsets.shape[0]

    sorted_points = points[order]
    sorted_cells = cp[order]
    sorted_mask = pm[order]

    def process(args):
        qs, qmask = args  # [C, 3], [C]
        c = qs.shape[0]
        cq = jnp.floor(qs * inv_cell).astype(jnp.int32)  # [C, 3]
        probe_cells = cq[:, None, :] + offsets[None, :, :]  # [C, n_off, 3]
        probe_keys = _hash_cells(probe_cells)  # [C, n_off]
        lo = jnp.searchsorted(skey, probe_keys.reshape(-1)).reshape(
            c, n_off)
        hi = jnp.searchsorted(skey, probe_keys.reshape(-1),
                              side="right").reshape(c, n_off)
        cand_pos = lo[..., None] + jnp.arange(cell_cap,
                                              dtype=jnp.int32)  # [C,O,cap]
        in_range = cand_pos < hi[..., None]
        cell_over = jnp.maximum(hi - lo - cell_cap, 0)  # [C, O]
        cand_pos = jnp.clip(cand_pos, 0, max(n - 1, 0))
        flat = cand_pos.reshape(c, -1)  # [C, O*cap]

        cand_cells = sorted_cells[flat].reshape(c, n_off, cell_cap, 3)
        # exact-cell check: kills hash-collision junk and duplicates
        exact = jnp.all(cand_cells == probe_cells[:, :, None, :], axis=-1)
        valid = in_range & exact
        valid = valid.reshape(c, -1)
        valid &= sorted_mask[flat]

        cand_xyz = sorted_points[flat]  # [C, O*cap, 3]
        d = qs[:, None, :] - cand_xyz
        if metric == "L2":
            dist = jnp.sum(d * d, axis=-1)
        elif metric == "L1":
            dist = jnp.sum(jnp.abs(d), axis=-1)
        else:
            dist = jnp.max(jnp.abs(d), axis=-1)
        valid &= dist <= thresh
        if ignore_query_point:
            valid &= dist > 0
        valid &= qmask[:, None]

        from .neighbors import _recompute_dist, select_k_valid
        sel, mask_k, _, count = select_k_valid(valid, None, k)
        idx = jnp.where(mask_k,
                        order[jnp.take_along_axis(flat, sel, axis=1)], 0)
        dist_k = _recompute_dist(points, qs, idx, mask_k, metric)
        return idx, mask_k, dist_k, count, jnp.sum(cell_over, axis=1)

    if q <= query_chunk:
        idx, mask_k, dist_k, count, cell_over = process((queries, qm))
    else:
        chunk = query_chunk
        n_chunks = -(-q // chunk)
        pad = n_chunks * chunk - q
        qs = jnp.pad(queries, ((0, pad), (0, 0)))
        qmask_p = jnp.pad(qm, (0, pad))
        qs = qs.reshape(n_chunks, chunk, 3)
        qmask_p = qmask_p.reshape(n_chunks, chunk)
        idx, mask_k, dist_k, count, cell_over = jax.lax.map(
            process, (qs, qmask_p))
        idx = idx.reshape(-1, k)[:q]
        mask_k = mask_k.reshape(-1, k)[:q]
        dist_k = dist_k.reshape(-1, k)[:q]
        count = count.reshape(-1)[:q]
        cell_over = cell_over.reshape(-1)[:q]

    return NeighborList(idx=idx.astype(jnp.int32), mask=mask_k, dist=dist_k,
                        count=count, cell_overflow=cell_over)
