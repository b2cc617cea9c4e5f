"""TPU-native cell-list neighbor search v2: sorted-window formulation.

Replaces :mod:`grid_search`'s hash-probe formulation for large scenes.  A
round-2 canyon-scale profile (185k boundary, scripts/profile_canyon.py)
showed ~99% of the 5.7 s simulation step inside the hash search: scattered
element gathers (``sorted_mask[flat]``: 1.7 s/step for a *bool* gather;
candidate position/cell gathers ~0.8 s/step) and ``jnp.searchsorted``'s
default sequential binary-search while-loops (~1.4 s/step).  TPUs do
contiguous DMA and sorts well and scattered element gathers terribly, so
v2 restructures the search around exactly that:

* **Lexicographic linear cell ids, no hashing.**  Cell coords are shifted
  by the scene's min cell (so probe offsets never go negative) and packed
  into one int32 ``((cz * G) + cy) * G + cx`` with G=1024.  After ONE sort
  by id, every (cz, cy, cx-1..cx+1) x-run of 3 cells is a CONTIGUOUS range
  of the sorted array — a query's 27-cell neighborhood is 9 contiguous
  windows.  Membership in a window proves cell membership: no candidate
  cell/mask gathers, no hash-collision filtering.  Scenes wider than G-2
  cells per axis are detected and reported (``cell_overflow``).
* **searchsorted(method='sort')** for the window bounds: one bitonic sort
  of (ids ++ probes) instead of a 15-iteration sequential gather loop.
* **Query blocks, not per-query probes.**  Queries are sorted by cell id
  and processed in blocks of ``block_q`` consecutive rows; one block
  shares 9 windows (the union over its queries' cells).  No query is ever
  dropped: a sparse block just reads a slightly wider window; a dense
  cell spans multiple exact-window blocks.
* **Gather-of-slices, not gather-of-elements.**  Candidate windows are
  fetched with a vmapped ``lax.dynamic_slice`` (one contiguous [W, 3] DMA
  per (block, offset)) — the dominant data movement of the search.
* **Dense per-block distance tiles.**  [block_q, 9*W] squared distances,
  plain VPU work, chunked over blocks to bound memory.

Exactness: identical result contract as grid_search (true in-radius sets,
capped at K with ``count`` reporting overflow).  The one capacity knob is
``occ_cap`` (window budget W = 3*occ_cap candidate slots per probe): a
window needing more than W slots loses candidates and reports it through
``cell_overflow`` — same semantics as grid_search's per-cell candidate
cap.

Reference parity anchor: Open3D FixedRadiusSearch (reference
utils/convolutions.py:352-373) — same radius/K semantics as
:func:`dmcf_tpu.ops.neighbors.fixed_radius_search`.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from .neighbors import NeighborList, _recompute_dist, select_k_valid

_G = 1024  # virtual grid cells per axis (scene must fit G-2 per axis)
_INVALID_ID = np.int32(2 ** 30)


def _cells(pos, inv_cell):
    return jnp.floor(pos * inv_cell).astype(jnp.int32)


def _linear_ids(c):
    return (c[..., 2] * _G + c[..., 1]) * _G + c[..., 0]


def cell_fixed_radius_search(points,
                             queries,
                             radius,
                             k,
                             points_mask=None,
                             queries_mask=None,
                             metric: str = "L2",
                             ignore_query_point: bool = False,
                             occ_cap: int = 64,
                             block_q: int = 32,
                             block_chunk: int = 1024) -> NeighborList:
    """Fixed-radius search via the sorted-window cell list (see module
    docstring).  Drop-in alternative to ``grid_fixed_radius_search``.

    Args:
      occ_cap: candidate budget per probed 3-cell window is W=3*occ_cap;
        a window with more in-range sorted rows loses the excess and
        reports it via ``cell_overflow`` (set >= the max point count of
        any 3 consecutive x-cells, plus slack for what a sparse block's
        window union spans).
      block_q: queries per processing block (sorted order).
      block_chunk: blocks per ``lax.map`` chunk (memory bound).
    """
    n = points.shape[0]
    q = queries.shape[0]
    radius = jnp.asarray(radius, points.dtype)
    thresh = radius * radius if metric == "L2" else radius

    pm = (jnp.ones((n,), bool) if points_mask is None
          else points_mask.astype(bool))
    qm = (jnp.ones((q,), bool) if queries_mask is None
          else queries_mask.astype(bool))

    w = 3 * occ_cap
    n_blocks = -(-q // block_q)
    q_pad = n_blocks * block_q

    inv_cell = 1.0 / radius
    cp = _cells(points, inv_cell)
    cq = _cells(queries, inv_cell)

    # shift by the joint min cell - 1: all in-data coords land in
    # [1, span+1] and probe offsets of -1 never go negative -> no
    # wraparound ambiguity anywhere inside the data
    big = jnp.int32(np.iinfo(np.int32).max)
    cmin = jnp.minimum(
        jnp.min(jnp.where(pm[:, None], cp, big), axis=0),
        jnp.min(jnp.where(qm[:, None], cq, big), axis=0)) - 1
    cmax = jnp.maximum(
        jnp.max(jnp.where(pm[:, None], cp, -big), axis=0),
        jnp.max(jnp.where(qm[:, None], cq, -big), axis=0))
    # span per axis must fit the virtual grid; otherwise ids collide and
    # neighbors can be MISSED -> report loudly via cell_overflow
    span_bad = jnp.any((cmax - cmin) >= (_G - 1))
    cp = cp - cmin
    cq = cq - cmin

    # --- sort points by cell id (invalid rows sort to the end) ---
    pkey = jnp.where(pm, _linear_ids(cp), _INVALID_ID)
    order = jnp.argsort(pkey).astype(jnp.int32)
    skey = pkey[order]
    far = jnp.asarray(2e9, points.dtype)
    spts_pad = jnp.concatenate(
        [points[order],
         far + jnp.arange(w, dtype=points.dtype)[:, None]
         * jnp.ones((1, 3), points.dtype)], axis=0)

    # --- sort queries by cell id, pad to whole blocks ---
    qkey = jnp.where(qm, _linear_ids(cq), _INVALID_ID)
    qorder = jnp.argsort(qkey).astype(jnp.int32)
    sqk = jnp.pad(qkey[qorder], (0, q_pad - q),
                  constant_values=_INVALID_ID)
    sqry = jnp.pad(queries[qorder], ((0, q_pad - q), (0, 0)),
                   constant_values=2e9)

    kb = sqk.reshape(n_blocks, block_q)
    bvalid = kb < _INVALID_ID
    first = jnp.min(jnp.where(bvalid, kb, _INVALID_ID), axis=1)  # [B]
    last = jnp.max(jnp.where(bvalid, kb, -1), axis=1)            # [B]

    # --- window bounds: 9 (dz, dy) offsets x the block's x-run union ---
    offs = np.asarray([(dz * _G + dy) * _G
                       for dz in (-1, 0, 1) for dy in (-1, 0, 1)],
                      np.int32)
    lo_id = first[:, None] + offs[None, :] - 1          # [B, 9]
    hi_id = last[:, None] + offs[None, :] + 2           # exclusive
    probes = jnp.concatenate([lo_id.reshape(-1), hi_id.reshape(-1)])
    bounds = jnp.searchsorted(skey, probes, side="left",
                              method="sort").astype(jnp.int32)
    lo = bounds[:n_blocks * 9].reshape(n_blocks, 9)
    hi = jnp.maximum(bounds[n_blocks * 9:].reshape(n_blocks, 9), lo)
    cnt = hi - lo
    win_over = jnp.sum(jnp.maximum(cnt - w, 0), axis=1)  # [B]
    cnt = jnp.minimum(cnt, w)

    jw = jnp.arange(w, dtype=jnp.int32)
    sq_blocks = sqry.reshape(n_blocks, block_q, 3)

    def process(args):
        lo_c, cnt_c, qblk, qv = args  # [bc,9] [bc,9] [bc,bq,3] [bc,bq]
        bc = lo_c.shape[0]
        cand = jax.vmap(jax.vmap(
            lambda s: jax.lax.dynamic_slice(
                spts_pad, (s, jnp.int32(0)), (w, 3))))(lo_c)  # [bc,9,W,3]
        cand = cand.reshape(bc, 1, 9 * w, 3)
        d = qblk[:, :, None, :] - cand
        if metric == "L2":
            dist = jnp.sum(d * d, axis=-1)
        elif metric == "L1":
            dist = jnp.sum(jnp.abs(d), axis=-1)
        else:
            dist = jnp.max(jnp.abs(d), axis=-1)
        in_win = (jw[None, None, :] < cnt_c[:, :, None])
        # sparse blocks span several (z,y) rows, so a later offset's union
        # window can re-cover rows of an earlier one -> the same point
        # would enter twice (double-counted neighbors, double-summed
        # convs).  Window starts are ascending in offset order, so an
        # occurrence at sorted position p in window o is a duplicate iff
        # p < max_{o'<o}(lo+cnt): one running max kills all duplicates.
        pos_w = lo_c[:, :, None] + jw[None, None, :]
        m = jax.lax.cummax(lo_c + cnt_c, axis=1)
        m = jnp.concatenate(
            [jnp.full((bc, 1), -1, jnp.int32), m[:, :-1]], axis=1)
        in_win &= pos_w >= m[:, :, None]
        in_win = in_win.reshape(bc, 1, 9 * w)
        valid = in_win & (dist <= thresh)
        if ignore_query_point:
            valid &= dist > 0
        valid &= qv[:, :, None]
        sel, kmask, _, count = select_k_valid(
            valid.reshape(bc * block_q, 9 * w), None, k)
        # selected flat window slot -> position in the sorted point array
        off_sel = sel // w
        pos_sorted = (jnp.take_along_axis(
            jnp.repeat(lo_c, block_q, axis=0), off_sel, axis=1)
            + sel % w)
        return (pos_sorted.reshape(bc, block_q, k),
                kmask.reshape(bc, block_q, k),
                count.reshape(bc, block_q))

    args = (lo, cnt, sq_blocks, bvalid)
    if n_blocks <= block_chunk:
        pos_sorted, kmask, count = process(args)
    else:
        n_chunks = -(-n_blocks // block_chunk)
        pad = n_chunks * block_chunk - n_blocks
        args = tuple(jnp.pad(a, ((0, pad),) + ((0, 0),) * (a.ndim - 1))
                     for a in args)
        args = tuple(a.reshape((n_chunks, block_chunk) + a.shape[1:])
                     for a in args)
        pos_sorted, kmask, count = jax.lax.map(process, args)
        pos_sorted = pos_sorted.reshape(-1, block_q, k)[:n_blocks]
        kmask = kmask.reshape(-1, block_q, k)[:n_blocks]
        count = count.reshape(-1, block_q)[:n_blocks]

    # --- de-permute rows back to the original query order ---
    iperm = jnp.zeros((q,), jnp.int32).at[qorder].set(
        jnp.arange(q, dtype=jnp.int32))
    idx_sorted = pos_sorted.reshape(q_pad, k)[iperm]
    mask_k = kmask.reshape(q_pad, k)[iperm] & qm[:, None]
    count_q = jnp.where(qm, count.reshape(q_pad)[iperm], 0)

    idx = jnp.where(mask_k, order[jnp.clip(idx_sorted, 0, n - 1)], 0)
    dist_k = _recompute_dist(points, queries, idx, mask_k, metric)

    # overflow reporting: the query's block window overflow, plus the
    # hard grid-span failure mode
    hard = jnp.where(span_bad, jnp.int32(1 << 20), 0)
    cell_over = jnp.where(
        qm, win_over[iperm // block_q] + hard, 0).astype(jnp.int32)

    return NeighborList(idx=idx.astype(jnp.int32), mask=mask_k,
                        dist=dist_k, count=count_q.astype(jnp.int32),
                        cell_overflow=cell_over)


def contact_weight_dense(points, queries, radius, points_mask=None,
                         queries_mask=None, chunk=16384):
    """Exact per-query count of ``points`` within ``radius`` — the
    boundary-crop working-set weight (replaces grid_search.contact_weight's
    hash-probe occupancy sum, whose searchsorted while-loops cost ~0.8
    s/step at canyon scale).

    Chunked dense distance blocks: [chunk, N] direct-difference squared
    distances, reduced to a count — XLA fuses subtract/square/reduce so
    only the [chunk] counts materialize.  Exact (no 27-cell superset, no
    hash false positives): weight > 0 iff a point lies within radius.
    """
    n = points.shape[0]
    q = queries.shape[0]
    pm = (jnp.ones((n,), bool) if points_mask is None
          else points_mask.astype(bool))
    r2 = jnp.asarray(radius, points.dtype) ** 2

    def count_chunk(qs):
        d = qs[:, None, :] - points[None, :, :]
        d2 = jnp.sum(d * d, axis=-1)
        return jnp.sum((d2 <= r2) & pm[None, :], axis=1,
                       dtype=jnp.int32)

    if q <= chunk:
        wgt = count_chunk(queries)
    else:
        n_chunks = -(-q // chunk)
        pad = n_chunks * chunk - q
        qs = jnp.pad(queries, ((0, pad), (0, 0)))
        wgt = jax.lax.map(count_chunk,
                          qs.reshape(n_chunks, chunk, 3)).reshape(-1)[:q]
    if queries_mask is not None:
        wgt = jnp.where(queries_mask.astype(bool), wgt, 0)
    return wgt
