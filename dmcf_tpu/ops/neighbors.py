"""Fixed-radius neighbor search with fixed-shape padded neighbor lists.

TPU-native replacement for Open3D-ML's ``FixedRadiusSearch`` /
``RadiusSearch`` (reference call sites: utils/convolutions.py:207-216,
models/pointnet.py:131, utils/tools/losses.py:296).  Instead of the
reference's ragged CSR lists (dynamic shapes => retrace pressure), we emit a
padded ``[Q, K]`` neighbor index matrix plus validity mask — exact as long as
K >= the true max neighbor count, which we expose via ``count`` so pipelines
can track overflow (the analog of the reference's ``_avg_neighbors`` stat).

The default implementation is a chunked brute-force scan: each chunk computes
a dense [Q, C] distance block (pure VPU work that XLA tiles well) and folds it
into a running top-K via ``lax.top_k``.  For the scene sizes of all shipped
configs (1e3..1e5 points) this is fast on TPU and fully static; a Pallas
cell-list kernel can swap in underneath without changing the interface.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

_FILL = jnp.inf


class DensePair(NamedTuple):
    """Dense [Q, N] pair field for the no-neighbor-list conv path
    (ops/cconv.continuous_conv_dense): every source point is a candidate,
    out-of-radius pairs carry zero weight.  Exact with NO K budget —
    used for downsampling trunk pairs whose in-radius counts are a sizable
    fraction of the source set (where padded-K lists pay sorts + short-row
    gathers for sparse bookkeeping that isn't actually sparse).

    rel:   [Q, N, 3] displacement (src - query) scaled by 1/radius.
    qnorm: [Q, N] squared distance / radius^2 (window argument).
    valid: [Q, N] in-radius & both-masks validity.
    count: [Q] true in-radius neighbor count (for aux stats).
    """

    rel: jax.Array
    qnorm: jax.Array
    valid: jax.Array
    count: jax.Array


class LazyDensePair(NamedTuple):
    """Deferred-geometry form of :class:`DensePair` for canyon-scale pairs.

    Carries only the two point sets; the [Q, N] pair geometry (rel planes,
    window argument, validity) is recomputed per source chunk inside
    :func:`ops.cconv.continuous_conv_dense_lazy`, so nothing
    O(Q*N)-shaped ever becomes resident in HBM — at 12k x 12k a cached
    eager DensePair's four fp32 [Q, N] planes alone are ~2.3 GB *per
    pair*, and the trunk holds up to 8 dense pairs live at once.  The
    recompute is one fused subtract/compare per chunk, far below the tap
    build it feeds.  Semantics are identical to the eager path (same
    sanitization, same window fold): exact, no K budget.

    src_pos/src_mask: [N, 3] / [N] source points and validity.
    dst_pos/dst_mask: [Q, 3] / [Q] query points and validity.
    radius: python float search/window radius.
    """

    src_pos: jax.Array
    src_mask: jax.Array
    dst_pos: jax.Array
    dst_mask: jax.Array
    radius: float


class NeighborList(NamedTuple):
    """Padded fixed-K neighbor list.

    idx:   [Q, K] int32 indices into the point array (0 where invalid).
    mask:  [Q, K] bool validity.
    dist:  [Q, K] squared distance for metric L2, plain distance for L1/Linf
           (matching Open3D's return_distances convention); 0 where invalid.
    count: [Q] int32 true number of in-radius neighbors (before K capping);
           count > K indicates overflow (lost neighbors).
    cell_overflow: optional [Q] int32 — number of candidate slots dropped by
           the grid search's per-cell cap (grid_search.py); > 0 means
           potentially lost neighbors even when count <= K.  None for
           searches without cell structure.
    disp:  optional [Q, K, 3] displacement ``points[idx] - queries`` (0
           where invalid).  The search gathers neighbor positions anyway to
           compute exact distances; keeping the displacements lets every
           downstream consumer (tap tensors for each window, density
           kernels) reuse them — [Q, K, 3] row gathers are the hottest
           non-matmul op of a step on TPU (~6 ns/row), and their VJP is a
           scatter-add, which is worse.  None when the producing search
           skipped it (chunked/grid paths).
    """

    idx: jax.Array
    mask: jax.Array
    dist: jax.Array
    count: jax.Array
    cell_overflow: jax.Array = None
    disp: jax.Array = None

    @property
    def overflow(self):
        return self.count > self.idx.shape[-1]


def _pairwise_dist(queries, points, metric):
    d = queries[:, None, :] - points[None, :, :]
    if metric == "L2":
        return jnp.sum(d * d, axis=-1)
    if metric == "L1":
        return jnp.sum(jnp.abs(d), axis=-1)
    if metric == "Linf":
        return jnp.max(jnp.abs(d), axis=-1)
    raise NotImplementedError(f"unknown metric: {metric}")


def select_k_valid(valid, dist, k, method=None):
    """Compact the first K valid entries of each row into K slots.

    TPU-fast alternative to distance-top_k for neighbor selection: the conv
    only needs the in-radius set (any order), so pick the (j+1)-th valid
    column per row via a row cumsum + vectorized binary search — memory-
    bound instead of sort-bound (top_k over wide rows costs ~ms on TPU;
    this costs ~the cumsum).  On per-query overflow (count > K) an
    arbitrary K-subset survives (overflow is tracked and is an error
    condition regardless).

    For WIDE budgets (K past ~128 — the per-pair exactness budgets of 3D
    coarse pairs reach K~1400) the compare-all search costs K*N per row;
    there the 'sort' method compacts via one ascending sort of
    ``where(valid, col, BIG)`` (~log^2 N * N per row), ~K/log^2(N) times
    cheaper.  Chosen automatically; override via ``method``.

    ``dist`` may be None to skip the per-element distance gather — profiling
    shows ``take_along_axis`` element-gathers from the wide [Q, N] distance
    matrix are the single hottest op of a simulation step (~1.6 ms per
    search at WaterRamps scale); callers that know the point coordinates
    recompute the K selected distances from [N, 3] row gathers instead
    (~12x cheaper).

    Returns (idx [Q,K] int32 column indices, mask [Q,K], dist_k [Q,K]|None,
    count [Q]).
    """
    n = valid.shape[1]
    count = jnp.sum(valid, axis=1, dtype=jnp.int32)
    targets = jnp.arange(1, k + 1, dtype=jnp.int32)
    mask = targets[None, :] <= count[:, None]
    if method is None:
        method = "sort" if k > 128 else "searchsorted"
    if method == "sort":
        cols = jnp.broadcast_to(jnp.arange(n, dtype=jnp.int32),
                                valid.shape)
        keys = jnp.where(valid, cols, jnp.asarray(n, jnp.int32))
        idx = jnp.sort(keys, axis=1)[:, :k]
        if k > n:
            idx = jnp.pad(idx, ((0, 0), (0, k - n)))
    else:
        csum = jnp.cumsum(valid.astype(jnp.int32), axis=1)
        # on TPU 'compare_all' lowers to dense VPU compares + reductions
        # and beats the sequential 'scan' binary search ~10x; on CPU it is
        # the other way around (measured 2.5 s vs 0.25 s at [16k,864]xk=64)
        ss = ("compare_all" if jax.default_backend() == "tpu" else "scan")
        idx = jax.vmap(lambda row: jnp.searchsorted(row, targets,
                                                    method=ss))(csum)
    idx = jnp.where(mask, idx, 0).astype(jnp.int32)
    if dist is None:
        return idx, mask, None, count
    dist_k = jnp.where(mask, jnp.take_along_axis(dist, idx, axis=1), 0.0)
    return idx, mask, dist_k, count


def _recompute_dist(points, queries, idx, mask, metric,
                    chunk_elems=2 * 1024 * 1024):
    """Exact per-neighbor distance from gathered positions (squared for L2,
    matching Open3D's return convention).

    The [Q, K, 3] position gather is the fast form on TPU (one descriptor
    per row; take_along_axis from the wide candidate matrix measured ~12x
    slower) — but its output tiles with the minor dim 3 padded to 128
    lanes, a 42.7x HBM blow-up that OOMs at huge Q*K (canyon demo (0,2)
    pair: Q=23104 x K=1856 -> 21.9 GB).  Past ``chunk_elems`` the gather
    runs K-chunked under lax.map, bounding the padded transient (~512 B
    per element -> ~1 GB at the default) while keeping the same per-row
    gather form."""
    q, k = idx.shape

    def dist_of(idx_c, q_c):
        d = points[idx_c] - q_c[:, None, :]
        if metric == "L2":
            return jnp.sum(d * d, axis=-1)
        elif metric == "L1":
            return jnp.sum(jnp.abs(d), axis=-1)
        return jnp.max(jnp.abs(d), axis=-1)

    if q * k <= chunk_elems:
        dist = dist_of(idx, queries)
    else:
        kc = max(chunk_elems // max(q, 1), 8)
        nc = -(-k // kc)
        idx_p = jnp.pad(idx, ((0, 0), (0, nc * kc - k)))
        idx_ch = jnp.moveaxis(idx_p.reshape(q, nc, kc), 1, 0)
        dist = jnp.moveaxis(
            jax.lax.map(lambda ic: dist_of(ic, queries), idx_ch),
            0, 1).reshape(q, nc * kc)[:, :k]
    return jnp.where(mask, dist, 0.0)


def fixed_radius_search(points,
                        queries,
                        radius,
                        k,
                        points_mask=None,
                        queries_mask=None,
                        metric: str = "L2",
                        ignore_query_point: bool = False,
                        chunk: int = 4096,
                        fast_path_max: int = 8192) -> NeighborList:
    """All points within ``radius`` of each query, capped at K per query.

    Args:
      points: [N, 3] candidate positions (padded entries masked out via
        ``points_mask``).
      queries: [Q, 3] query positions.
      radius: scalar search radius.  For metric 'L2' the comparison and the
        returned distances are *squared* (Open3D convention).
      k: static max neighbors per query.
      ignore_query_point: drop candidates coinciding exactly with the query
        position (Open3D ``ignore_query_point`` semantics).
      fast_path_max: for N up to this, use the single-shot dense path with
        cumsum selection (no top_k); beyond it, the chunked running-top_k
        scan bounds memory (and :func:`search` prefers the grid method).
    """
    n = points.shape[0]
    q = queries.shape[0]
    radius = jnp.asarray(radius, dtype=points.dtype)
    thresh = radius * radius if metric == "L2" else radius

    if n <= fast_path_max:
        pm = (jnp.ones((n,), bool)
              if points_mask is None else points_mask.astype(bool))
        if metric == "L2":
            # |q - p|^2 via the expansion: the cross term rides the MXU.
            # Cancellation noise (~1e-8 absolute) only matters at the radius
            # boundary where windows vanish, and for exact-zero self pairs,
            # which get a small epsilon guard below.
            qn = jnp.sum(queries * queries, axis=-1)
            pn = jnp.sum(points * points, axis=-1)
            cross = jnp.matmul(queries, points.T, precision="highest",
                               preferred_element_type=points.dtype)
            d = jnp.maximum(qn[:, None] + pn[None, :] - 2.0 * cross, 0.0)
        else:
            d = _pairwise_dist(queries, points, metric)  # [Q, N]
        valid = (d <= thresh) & pm[None, :]
        if ignore_query_point:
            # exact coincident-position test (Open3D semantics); the
            # expansion-form d carries ~1e-8 cancellation noise at zero
            same = jnp.all(queries[:, None, :] == points[None, :, :],
                           axis=-1)
            valid &= jnp.logical_not(same)
        if queries_mask is not None:
            valid &= queries_mask.astype(bool)[:, None]
        idx, mask, _, count = select_k_valid(valid, None, k)
        d3 = points[idx] - queries[:, None, :]
        if metric == "L2":
            dist = jnp.sum(d3 * d3, axis=-1)
        elif metric == "L1":
            dist = jnp.sum(jnp.abs(d3), axis=-1)
        else:
            dist = jnp.max(jnp.abs(d3), axis=-1)
        dist = jnp.where(mask, dist, 0.0)
        disp = jnp.where(mask[..., None], d3, 0.0)
        return NeighborList(idx=idx, mask=mask, dist=dist, count=count,
                            disp=disp)

    chunk = min(chunk, max(n, 1))
    n_chunks = -(-n // chunk)
    n_pad = n_chunks * chunk
    if n_pad != n:
        points = jnp.pad(points, ((0, n_pad - n), (0, 0)))
        pm = jnp.zeros((n_pad,), bool).at[:n].set(
            True if points_mask is None else points_mask)
    else:
        pm = (jnp.ones((n,), bool)
              if points_mask is None else points_mask.astype(bool))

    points_r = points.reshape(n_chunks, chunk, 3)
    pm_r = pm.reshape(n_chunks, chunk)

    def body(carry, inp):
        best_d, best_i, count = carry
        pts, mask_c, base = inp
        d = _pairwise_dist(queries, pts, metric)  # [Q, C]
        valid = (d <= thresh) & mask_c[None, :]
        if ignore_query_point:
            valid &= d > 0
        count = count + jnp.sum(valid, axis=1, dtype=jnp.int32)
        d_m = jnp.where(valid, d, _FILL)
        idx_c = base + jnp.arange(chunk, dtype=jnp.int32)[None, :]
        cat_d = jnp.concatenate([best_d, d_m], axis=1)
        cat_i = jnp.concatenate([best_i, jnp.broadcast_to(idx_c, d.shape)],
                                axis=1)
        neg_top, arg = jax.lax.top_k(-cat_d, k)
        best_d = -neg_top
        best_i = jnp.take_along_axis(cat_i, arg, axis=1)
        return (best_d, best_i, count), None

    init = (jnp.full((q, k), _FILL, dtype=points.dtype),
            jnp.zeros((q, k), jnp.int32), jnp.zeros((q,), jnp.int32))
    bases = (jnp.arange(n_chunks, dtype=jnp.int32) * chunk)
    (best_d, best_i, count), _ = jax.lax.scan(body, init,
                                              (points_r, pm_r, bases))

    mask = jnp.isfinite(best_d)
    if queries_mask is not None:
        qm = queries_mask.astype(bool)
        mask &= qm[:, None]
        count = jnp.where(qm, count, 0)
    idx = jnp.where(mask, best_i, 0)
    dist = jnp.where(mask, best_d, 0.0)
    return NeighborList(idx=idx, mask=mask, dist=dist, count=count)


def batched_fixed_radius_search(points, queries, radii, k,
                                points_mask=None, queries_mask=None,
                                metric: str = "L2") -> NeighborList:
    """One fused search over P stacked (points, queries, radius) problems.

    ``points`` [P, N, 3], ``queries`` [P, Q, 3], ``radii`` [P].  Returns a
    NeighborList with leading pair dimension ([P, Q, K] idx/mask/dist,
    [P, Q] count).  Semantically identical to P independent
    :func:`fixed_radius_search` calls (same selection order), but the
    whole pair set runs as a handful of large batched ops instead of
    P × ~40 small ones — at small/medium scene sizes a simulation step is
    bound by per-op sequencer overhead, not FLOPs, so the multi-scale
    trunk's ~9-16 pair searches dominate the step when issued one by one
    (the reference issues one FixedRadiusSearch op launch per conv,
    utils/convolutions.py:352-373; this is the opposite design point).
    """
    radii = jnp.asarray(radii, dtype=points.dtype)

    def one(pts, qs, r, pm, qm):
        return fixed_radius_search(pts, qs, r, k, points_mask=pm,
                                   queries_mask=qm, metric=metric,
                                   fast_path_max=pts.shape[0])

    pm = (jnp.ones(points.shape[:2], bool) if points_mask is None
          else points_mask.astype(bool))
    qm = (jnp.ones(queries.shape[:2], bool) if queries_mask is None
          else queries_mask.astype(bool))
    return jax.vmap(one)(points, queries, radii, pm, qm)


def search(points, queries, radius, k, *, method="auto", points_mask=None,
           queries_mask=None, metric="L2", ignore_query_point=False,
           cell_cap=32, planar_axis=None, occ_cap=128):
    """Dispatching fixed-radius search: 'brute' (chunked O(QN) scan, fastest
    for small/medium scenes on TPU), 'cell' (sorted-window cell lists —
    the TPU-fast large-scene path, see ops/cell_search.py), 'grid'
    (the older hash-probe cell list, kept for comparison), or 'auto' by
    problem size."""
    if method == "auto":
        method = ("cell" if points.shape[0] * queries.shape[0] > 3e7
                  else "brute")
    if method == "cell":
        from .cell_search import cell_fixed_radius_search
        return cell_fixed_radius_search(
            points, queries, radius, k, points_mask=points_mask,
            queries_mask=queries_mask, metric=metric,
            ignore_query_point=ignore_query_point, occ_cap=occ_cap)
    if method == "grid":
        from .grid_search import grid_fixed_radius_search
        return grid_fixed_radius_search(
            points, queries, radius, k, points_mask=points_mask,
            queries_mask=queries_mask, metric=metric,
            ignore_query_point=ignore_query_point, cell_cap=cell_cap,
            planar_axis=planar_axis)
    return fixed_radius_search(points, queries, radius, k,
                               points_mask=points_mask,
                               queries_mask=queries_mask, metric=metric,
                               ignore_query_point=ignore_query_point)


def invert_neighbors_list(nl: NeighborList, num_points: int,
                          k_out: int) -> NeighborList:
    """Transpose a padded neighbor list: for each input point, the output
    points that reference it (TPU-native equivalent of Open3D's CSR
    ``invert_neighbors_list``, reference utils/convolutions.py:844).

    Sort-based, fixed shapes: pairs are sorted by input index; each input's
    run of pairs becomes its padded row (capped at ``k_out``; the true count
    is returned for overflow tracking).  Distances carry over unchanged
    (symmetric); displacements flip sign (``disp`` is points - queries).

    Because an L2 ball is symmetric, ``invert(search(A->B)) == search(B->A)``
    exactly whenever the forward list did not overflow its K — the
    SearchCache uses this to derive each trunk (j, i) pair search from its
    already-computed (i, j) transpose with one small sort over Q*K pairs
    instead of a second O(Q*N) distance pass.
    """
    q, k = nl.idx.shape
    flat_idx = jnp.where(nl.mask, nl.idx, num_points).reshape(-1)
    rows = (jnp.arange(q * k, dtype=jnp.int32) // k)
    dists = nl.dist.reshape(-1)

    order = jnp.argsort(flat_idx)
    sorted_idx = flat_idx[order]
    sorted_rows = rows[order]
    sorted_dist = dists[order]

    targets = jnp.arange(num_points)
    starts = jnp.searchsorted(sorted_idx, targets, side="left")
    ends = jnp.searchsorted(sorted_idx, targets, side="right")
    counts = (ends - starts).astype(jnp.int32)

    gather = starts[:, None] + jnp.arange(k_out)[None, :]
    valid = jnp.arange(k_out)[None, :] < counts[:, None]
    gather = jnp.clip(gather, 0, q * k - 1)
    out_idx = jnp.where(valid, sorted_rows[gather], 0)
    out_dist = jnp.where(valid, sorted_dist[gather], 0.0)
    disp = None
    if nl.disp is not None:
        sorted_disp = nl.disp.reshape(q * k, -1)[order]
        disp = jnp.where(valid[..., None], -sorted_disp[gather], 0.0)
    return NeighborList(idx=out_idx.astype(jnp.int32), mask=valid,
                        dist=out_dist, count=counts, disp=disp)


def radius_search(points,
                  queries,
                  radii,
                  k,
                  points_mask=None,
                  queries_mask=None,
                  metric: str = "L2",
                  ignore_query_point: bool = False,
                  normalize_distances: bool = True) -> NeighborList:
    """Per-query-radius variant (Open3D ``RadiusSearch``).

    Brute force over all points (this path is only used when ``extents`` is
    rank-1, which no shipped config exercises).  Distances are optionally
    normalized by the per-query radius (squared for L2), matching Open3D's
    ``normalize_distances``.
    """
    d = _pairwise_dist(queries, points, metric)  # [Q, N]
    radii = jnp.asarray(radii)
    thresh = radii * radii if metric == "L2" else radii
    valid = d <= thresh[:, None]
    if points_mask is not None:
        valid &= points_mask.astype(bool)[None, :]
    if queries_mask is not None:
        valid &= queries_mask.astype(bool)[:, None]
    if ignore_query_point:
        valid &= d > 0
    count = jnp.sum(valid, axis=1, dtype=jnp.int32)
    if normalize_distances:
        d = d / jnp.maximum(thresh[:, None], 1e-20)
    d_m = jnp.where(valid, d, _FILL)
    neg_top, idx = jax.lax.top_k(-d_m, k)
    best_d = -neg_top
    mask = jnp.isfinite(best_d)
    idx = jnp.where(mask, idx, 0)
    dist = jnp.where(mask, best_d, 0.0)
    return NeighborList(idx=idx.astype(jnp.int32), mask=mask, dist=dist,
                        count=count)
