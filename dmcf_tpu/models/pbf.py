"""PBF physics scaffold: everything shared by the learned-SPH model family.

TPU-native redesign of the reference's ``PBFNet`` (models/pbf_model.py:31-517):
advection integrator, global transform stack (translate/scale/gravity-
equivariant rotation), feature assembly, scale-0 fluid/boundary convolutions,
multi-scale position pyramid, density features/normalization, output
postprocessing (neighbor counts, out_scale, re-integration).

Key TPU-first differences from the reference:

* **Fixed shapes + masks.**  A sample is padded fluid/boundary arrays with
  validity masks; padded particles sit at far sentinel positions and all ops
  are mask-exact.  The whole step is jit/vmap/scan/grad-compatible.
* **One neighbor search per (point-set pair, radius) per step**, shared by
  every conv via a trace-time cache; the scale-0 all->all search additionally
  serves the fluid->all and box->all convs (and density / ASCC / equivariant
  paths) by *subsetting* the padded neighbor lists — the reference re-runs
  FixedRadiusSearch inside every conv call (utils/convolutions.py:352-373).
* **Boundary cropping is a fixed-slot compaction** (reference
  models/pbf_model.py:330-336 physically shrinks the array): by default no
  crop is needed — out-of-range boundary particles simply have no fluid
  neighbors — and for huge scenes ``boundary_crop_max`` compacts the
  in-range boundary into a static working set inside the jitted step.
"""

from __future__ import annotations

from typing import Any, Dict, NamedTuple, Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from jax.ad_checkpoint import checkpoint_name

from ..ops import (align_vector, compute_pressure,
                   compute_transformed_dx, get_dilated_pos, masked_positions,
                   point_sampling)
from ..ops.cconv import build_tap_tensor
from ..ops.neighbors import (DensePair, LazyDensePair, NeighborList,
                             batched_fixed_radius_search)
from ..ops.windows import get_window_func
from .layers import ContinuousConv, Dense


def _name_nl(nl: NeighborList, name: str) -> NeighborList:
    """Tag a neighbor list's arrays as named rematerialization targets so
    ``make_train_step``'s ``save_only_these_names`` checkpoint policy can
    keep them across the forward/backward boundary — no gradient flows
    through the search's sort/cumsum machinery, so recomputing it in the
    backward pass (the default ``jax.checkpoint`` behavior) is pure waste."""
    return NeighborList(
        idx=checkpoint_name(nl.idx, name), mask=checkpoint_name(nl.mask,
                                                                name),
        dist=checkpoint_name(nl.dist, name), count=nl.count,
        cell_overflow=nl.cell_overflow,
        disp=None if nl.disp is None else checkpoint_name(nl.disp, name))


def _pad_rows(x, n):
    return x if x.shape[0] == n else jnp.pad(x, ((0, n - x.shape[0]),)
                                             + ((0, 0),) * (x.ndim - 1))


def subset_neighbors(nl: NeighborList, keep) -> NeighborList:
    """Restrict a padded neighbor list to neighbors satisfying ``keep(idx,
    dist)`` — e.g. carve fluid->all and box->all lists out of one all->all
    search instead of re-searching."""
    mask = nl.mask & keep(nl.idx, nl.dist)
    return NeighborList(idx=jnp.where(mask, nl.idx, 0), mask=mask,
                        dist=jnp.where(mask, nl.dist, 0.0),
                        count=jnp.sum(mask, axis=1, dtype=jnp.int32),
                        disp=None if nl.disp is None else
                        jnp.where(mask[..., None], nl.disp, 0.0))


def drop_coincident(nl: NeighborList, points, queries) -> NeighborList:
    """Derive the ``ignore_query_point`` variant of a neighbor list by
    exact position equality (cheap on the K-wide padded list; stored
    distances may carry expansion-form noise at zero)."""
    if nl.disp is not None:
        # disp == 0 exactly <=> coincident (disp is points[idx] - queries)
        same = nl.mask & jnp.all(nl.disp == 0.0, axis=-1)
    else:
        same = jnp.all(points[nl.idx] == queries[:, None, :], axis=-1)
    mask = nl.mask & jnp.logical_not(same)
    return NeighborList(idx=jnp.where(mask, nl.idx, 0), mask=mask,
                        dist=jnp.where(mask, nl.dist, 0.0),
                        count=jnp.sum(mask, axis=1, dtype=jnp.int32),
                        disp=None if nl.disp is None else
                        jnp.where(mask[..., None], nl.disp, 0.0))


class SearchCache:
    """Trace-time cache: one fixed-radius search per (src, dst, radius) and
    one conv tap tensor per (pair, radius, window, filter size) — every conv
    over the same geometry reuses both (the reference re-searches and
    re-interpolates inside every conv call, utils/convolutions.py:352-379)."""

    def __init__(self, k: int, method: str = "auto", occ_cap: int = 128,
                 transpose_reuse: bool = False):
        self.k = k
        self.method = method
        self.occ_cap = occ_cap
        self.transpose_reuse = transpose_reuse
        self._cache: Dict[Tuple, NeighborList] = {}
        self._taps: Dict[Tuple, jax.Array] = {}

    def get_dense(self, src_name, dst_name, radius, points, pmask, queries,
                  qmask, lazy=False):
        """Dense pair field (see DensePair) per (src, dst, radius).

        With ``lazy=True`` (canyon-scale pairs, chosen by
        PBFNet.dense_lazy_min_elems) the geometry is NOT materialized —
        a LazyDensePair carries the point sets and the conv recomputes the
        [Q, N] field per source chunk (ops/cconv.continuous_conv_dense_lazy),
        keeping HBM residency O(Q + N) instead of O(Q*N)."""
        key = ("dense", src_name, dst_name, float(radius))
        if lazy:
            if key not in self._cache:
                self._cache[key] = LazyDensePair(
                    src_pos=points, src_mask=pmask.astype(bool),
                    dst_pos=queries, dst_mask=qmask.astype(bool),
                    radius=float(radius))
            return self._cache[key]
        if key not in self._cache:
            radius = jnp.asarray(radius, points.dtype)
            rel = points[None, :, :] - queries[:, None, :]  # [Q, N, 3]
            d2 = jnp.sum(rel * rel, axis=-1)
            r2 = radius * radius
            valid = (d2 <= r2) & pmask[None, :].astype(bool) \
                & qmask[:, None].astype(bool)
            # Sanitize invalid pairs BEFORE any downstream math: padded
            # rows sit at far sentinel positions (and can drift to ~1e8
            # through integration of garbage rows), and although the
            # forward is masked by a == 0, VJPs of window/mapping terms
            # evaluated at such magnitudes overflow fp32 — the where-VJP
            # then multiplies 0 x inf = NaN into position/feature grads.
            # Invalid pairs are pinned to a harmless constant geometry
            # (just outside the ball) so every grad path through them is
            # finite and exactly zeroed by the where.
            rel = jnp.where(valid[..., None], rel * (1.0 / radius), 1.0)
            qnorm = jnp.where(valid, d2 * (1.0 / r2), 2.0)
            self._cache[key] = DensePair(
                rel=rel,
                qnorm=qnorm,
                valid=valid,
                count=jnp.sum(valid, axis=1, dtype=jnp.int32))
        return self._cache[key]

    def get(self, src_name, dst_name, radius, points, pmask, queries, qmask,
            occ_cap=None, k=None):
        key = (src_name, dst_name, float(radius))
        if key not in self._cache:
            tkey = (dst_name, src_name, float(radius))
            if (self.transpose_reuse and src_name != dst_name
                    and tkey in self._cache):
                # the L2 ball is symmetric: derive this pair from its
                # already-searched transpose with one sort over Q*K pairs
                # instead of a second O(Q*N) distance pass.  Exact unless
                # the forward list overflowed its K (surfaced via
                # aux['pair_overflow'] — an error condition regardless).
                from ..ops.neighbors import invert_neighbors_list
                self._cache[key] = _name_nl(invert_neighbors_list(
                    self._cache[tkey], queries.shape[0], k or self.k),
                    "dmcf_nbr")
            else:
                from ..ops.neighbors import search
                self._cache[key] = _name_nl(search(
                    points, queries, radius, k or self.k,
                    method=self.method, points_mask=pmask,
                    queries_mask=qmask,
                    occ_cap=occ_cap or self.occ_cap), "dmcf_nbr")
        return self._cache[key]

    def taps(self, key, builder):
        if key not in self._taps:
            self._taps[key] = builder()
        return self._taps[key]


class PBFNet(nn.Module):
    """Physics scaffold base module.

    Subclasses implement ``setup_net`` (build the trunk) and ``forward``.
    Config knob names mirror the reference's YAML surface
    (models/pbf_model.py:32-74) so shipped configs translate 1:1.
    """

    kernel_size: Sequence[int] = (4, 4, 4)
    channels: int = 16
    strides: Sequence[int] = (1,)
    particle_radii: Sequence[float] = (0.05,)
    coordinate_mapping: str = "ball_to_cube_volume_preserving"
    interpolation: str = "linear"
    window: Optional[str] = None
    window_dens: Optional[str] = None
    ignore_query_points: bool = False
    grav: float = -9.81
    transformation: Optional[Dict[str, Any]] = None
    timestep: float = 0.01
    dens_radius: Optional[Sequence[float]] = None
    circular: bool = False
    dens_feats: bool = False
    pres_feats: bool = False
    equivar: bool = False
    use_vel: bool = True
    use_acc: bool = True
    use_feats: bool = False
    use_box_feats: bool = True
    use_pre_adv: bool = False
    use_bnds: bool = True
    dens_norm: bool = False
    rest_dens: float = 3.5
    stiffness: float = 20.0
    voxel_size: Optional[Sequence[float]] = None
    centralize: bool = False
    out_scale: Sequence[float] = (0.01, 0.01, 0.01)
    sample_pad: int = 0
    sample_hyst: float = 0.1
    part_scale: float = 1.0
    sym_axis: int = 2  # accepted here so configs pass through uniformly
    # --- TPU-specific knobs ---
    neighbor_k: int = 64
    # Per-scale-gap neighbor budgets for cross-scale (downsampling) trunk
    # pairs: K for a conv from scale i to scale j > i is
    # ``neighbor_k_gaps[min(j - i - 1, len - 1)]``.  A coarse query at
    # radius r_j sees ~(stride_j / stride_i)^dim points of scale i, so one
    # global K either silently truncates downsampling pairs (the reference
    # consumes ALL in-radius neighbors via ragged lists,
    # utils/convolutions.py:352-373) or overpays same-scale ones.  Measured
    # on the WaterRamps bench scene (K=32): pair (0,1) peaks at 49 and
    # (0,2) at 197 true neighbors — 32 dropped up to 85% of the mass.
    # None (default) keeps the single ``neighbor_k`` everywhere.
    # Truncation on ANY trunk pair is surfaced via aux['pair_overflow'].
    neighbor_k_gaps: Any = None
    # Full per-pair K matrix ``neighbor_k_pairs[src_scale][dst_scale]``
    # (wins over neighbor_k_gaps).  In 3D the gap heuristic is not enough:
    # coarse voxel scales are denser *relative to their radius* than the
    # fluid itself (Liquid3d canyon, measured: same-scale pair (1,1) holds
    # up to 174 true neighbors and (0,2) up to 1056 vs neighbor_k=64 —
    # truncating up to 94% of the neighbor mass the reference's ragged
    # lists consume).  Rows/cols clamp to the last entry.
    neighbor_k_pairs: Any = None
    # Derive each (j, i) trunk pair search from its already-computed
    # (i, j) transpose (one sort over Q*K pairs) instead of a second
    # O(Q*N) distance pass — the L2 ball is symmetric, so the derived
    # list is exact whenever the forward list didn't overflow.  Saves
    # ~30% of a step's search volume on 3-scale trunks.
    transpose_search_reuse: bool = False
    # K-chunked conv evaluation for huge-K pairs (see
    # layers.ContinuousConv.k_chunk); 0 = off
    conv_k_chunk: int = 0
    # neighbor-feature gather implementation for bf16 trunk convs:
    # 'row' (native row gather) or 'onehot' (one-hot MXU matmul —
    # value-exact for bf16 features, faster where short rows gather
    # poorly; see ops/cconv._onehot_gather)
    conv_gather: str = "row"
    # Trunk pairs whose K budget (k_for_pair) is >= this threshold are
    # evaluated DENSELY over all source points instead of through padded-K
    # neighbor lists (ops/cconv.continuous_conv_dense): no search/select/
    # gather at all, exact with no K budget to overflow — the TPU answer
    # for downsampling pairs where "sparse" occupancy is 5-50% of the
    # source set and the padded-K machinery (selection sorts, short-row
    # gathers) costs more than dense MXU work.  0 = off.
    dense_pair_min_k: int = 0
    # bound the dense path's [Q, chunk, S] tap transient by scanning the
    # source dim in slices this wide (ops/cconv.continuous_conv_dense
    # n_chunk); 0 = off.  Required for vmapped training batches (batch 16
    # WaterRamps OOMs one chip with unchunked [Q, N, S] fields) and for
    # canyon-scale dense pairs.  Applies to TRAINING steps; eval/rollout
    # steps run unchunked unless dense_n_chunk_eval is set (see
    # dense_chunk_for).
    dense_n_chunk: int = 0
    dense_n_chunk_eval: Optional[int] = None
    # dense pairs whose static Q*N reaches this many elements skip the
    # eager cached [Q, N] geometry (SearchCache.get_dense) and carry a
    # LazyDensePair instead: the conv recomputes the pair field per source
    # chunk, so residency stays O(Q + N).  At canyon scale the eager
    # fp32 planes are ~2.3 GB per pair with up to 8 pairs live; below the
    # threshold the eager cache wins (geometry shared across the pair's
    # convs).  The lazy conv always source-chunks (default 512).
    dense_lazy_min_elems: int = 1 << 24
    # fixed-shape analog of the reference's per-step boundary AABB crop
    # (models/pbf_model.py:330-336): when > 0 and smaller than the padded
    # boundary array, the step compacts the boundary particles inside the
    # fluid AABB (+ coarsest filter extent) into this many slots before any
    # search/conv — huge scenes (canyon: 185k boundary) only pay for the
    # working set.  Overflow (more in-range boundary points than slots) is
    # reported via aux['boundary_crop_count'].
    boundary_crop_max: int = 0
    # 'contact' (keep boundary within the coarsest extent of any fluid,
    # most-contacted first) or 'aabb' (reference AABB semantics)
    boundary_crop_mode: str = "contact"
    # padded point-budget for coarse pyramid scales, as a fraction of the
    # scale-0 size; scalar or per-scale list.  Truncation is tracked via
    # aux['scale_counts'] (counts exceeding the cap mean lost voxels).
    scale_size_factor: Any = 1.0
    # trunk conv matmul precision: 'default' = single-pass bf16 MXU passes
    # (fast path; ~1e-3 rel. error — fine for learned features), 'highest' =
    # fp32-exact multi-pass.  Conservation-critical convs (the ASCC output
    # stack) pin 'highest' regardless — see SymNet.setup_net.
    precision: str = "default"
    search_method: str = "auto"  # brute | cell | grid | auto (by size)
    # Batch the trunk's whole (scale-pair) search set into ONE vmapped
    # dense search + ONE vmapped tap build per step.  At small/medium scene
    # sizes the step is bound by per-op sequencer overhead, not FLOPs, so
    # collapsing ~9-16 per-pair search blocks into one is the main
    # single-chip throughput lever.  Auto-disabled when the stacked
    # problem exceeds ``prefetch_max_elems`` (large scenes use the cell
    # search per pair instead).  NOTE: under a vmapped training batch the
    # stacked intermediates additionally scale with batch size — for very
    # large per-sample scenes trained at large batch, turn this off.
    batch_pair_searches: bool = True
    # 16 pairs x 2816^2 (the WaterRamps eval capacity) is ~127M stacked
    # distance elements = ~0.5 GB fp32 transient - fine on a 16 GB chip,
    # and the regime where batching matters most (op-bound small scenes).
    prefetch_max_elems: int = 192 * 1024 * 1024
    # The prefetch pads every pair to the LARGEST pair's (n, q); its win
    # (fewer op launches) only beats its cost (padding-inflated row
    # gathers) while the step is op-count-bound.  Measured on TPU: column
    # valid rollout (448 rows) 19.9 -> 29.3 steps/s with prefetch, but the
    # WaterRamps bench scene (2816 rows) 137 -> 54 steps/s — past ~1k rows
    # the inflated gathers dominate.  Gate on the padded row count.
    prefetch_max_q: int = 1024
    # 'cell' search window budget per probed 3-cell run (W = 3*occ_cap),
    # scalar or per-scale list indexed by the search radius.  Finest-radius
    # cells are physically occupancy-bounded (fluid at rest spacing r/2
    # ~27/cell; canyon boundary measured max 24) so they get a small cheap
    # window; coarse-radius searches see raw point sets many-per-cell and
    # need a bigger budget (canyon boundary in 0.2-cells peaks at 94).
    # The search cost scales linearly with the cap; window overflow is
    # surfaced via aux['cell_overflow'].  None = [48, 128, 128, ...].
    cell_occ_cap: Any = None

    # ------------------------------------------------------------------
    # setup
    # ------------------------------------------------------------------

    def setup(self):
        self._win = get_window_func(self.window)
        self._win_dens = get_window_func(self.window_dens)
        self._radii = tuple(float(r) for r in self.particle_radii)
        self._dens_radii = (tuple(float(r) for r in self.dens_radius)
                            if self.dens_radius is not None else self._radii)
        self._transform_cfg = dict(self.transformation or {})

        if self._use_scale0_convs():
            self.fluid_convs = self.make_cconv("fluid_obs", self.channels,
                                               window_func=self.window)
            self.fluid_dense = Dense(self.channels, name="fluid_dense")
            self.obs_convs = self.make_cconv("obs_conv", self.channels,
                                             window_func=self.window)
            self.obs_dense = Dense(self.channels, name="obs_dense")

        if self.use_pre_adv:
            self.adv_convs = [
                self.make_cconv("adv_conv0", self.channels,
                                window_func=self.window),
                self.make_cconv("adv_conv1", self.channels,
                                window_func=self.window),
            ]
            self.adv_dense = [Dense(self.channels, name="adv_dense0"),
                              Dense(self.channels, name="adv_dense1")]

        if self.equivar:
            self.scale_dens = Dense(1, name="scale")
            self.rot_dens = Dense(4, name="rot")

        self.setup_net()

    def setup_net(self):
        raise NotImplementedError

    def _crop_boundary(self, pos, fluid_mask, box, bfeats, box_mask, ext):
        """Compact the relevant boundary particles into
        ``boundary_crop_max`` fixed slots (the fixed-shape analog of the
        reference's dynamic AABB crop, models/pbf_model.py:330-336).

        Mode 'contact' (default): keep boundary within ~``ext`` of any
        fluid particle (cell-hash occupancy test) — a *tighter* superset of
        the physically coupled set than the reference's AABB (boundary
        farther than the coarsest filter extent from all fluid cannot enter
        any conv), and on capacity overflow the most-contacted points
        survive, so truncation degrades where the fluid isn't.  Mode 'aabb'
        reproduces the reference's AABB semantics (first-K on overflow —
        spatially arbitrary, only safe while the in-AABB count fits)."""
        k = self.boundary_crop_max
        if self.boundary_crop_mode == "contact":
            # exact dense count (MXU/VPU-friendly; the hash-probe
            # contact_weight's searchsorted loops cost ~0.8 s/step at
            # canyon scale — see ops/cell_search.py docstring)
            from ..ops.cell_search import contact_weight_dense
            w = contact_weight_dense(pos, box, ext, points_mask=fluid_mask,
                                     queries_mask=box_mask)
            order = jnp.argsort(-w).astype(jnp.int32)
            idx = order[:k]
            mask = w[idx] > 0
            count = jnp.sum(w > 0, dtype=jnp.int32)
        else:
            from ..ops.neighbors import select_k_valid
            big = jnp.asarray(jnp.inf, pos.dtype)
            p = jnp.where(fluid_mask[:, None], pos, big)
            fluid_min = jnp.min(p, axis=0) - ext
            p = jnp.where(fluid_mask[:, None], pos, -big)
            fluid_max = jnp.max(p, axis=0) + ext
            in_range = box_mask & jnp.all((box >= fluid_min) &
                                          (box <= fluid_max), axis=-1)
            idx, mask, _, count = select_k_valid(in_range[None, :], None, k)
            idx, mask, count = idx[0], mask[0], count[0]
        return box[idx], bfeats[idx], mask, count

    def _use_scale0_convs(self):
        """Whether preprocess runs the scale-0 fluid/boundary convs
        (PointNet skips them — reference models/pointnet.py:38-125)."""
        return True

    def make_cconv(self,
                   name,
                   filters,
                   kernel_size=None,
                   ignore_query_points=None,
                   window_func=None,
                   normalize=False,
                   symmetric=False,
                   sym_axis=2,
                   use_bias=True,
                   circular=None,
                   precision=None):
        """Conv factory mirroring reference ``get_cconv``
        (models/pbf_model.py:197-224).

        ``precision`` defaults to the model-level knob; the ASCC output
        convs pin ``'highest'`` explicitly so the momentum guarantee holds
        even when the trunk runs single-pass bf16 MXU matmuls.
        """
        return ContinuousConv(
            name=name,
            filters=filters,
            kernel_size=tuple(kernel_size or self.kernel_size),
            use_bias=use_bias,
            align_corners=True,
            interpolation=self.interpolation,
            coordinate_mapping=self.coordinate_mapping,
            normalize=normalize,
            window_function=get_window_func(window_func),
            symmetric=symmetric,
            sym_axis=sym_axis,
            circular=self.circular if circular is None else circular,
            precision=precision if precision is not None else self.precision,
            k_chunk=self.conv_k_chunk,
            gather_mode=self.conv_gather,
        )

    def dense_chunk_for(self, training):
        """Effective dense-path source-chunk width: training steps chunk
        (vmapped batches multiply the [Q, N, S] tap fields), eval steps
        run unchunked unless ``dense_n_chunk_eval`` opts in (canyon-scale
        scenes)."""
        if training:
            return self.dense_n_chunk
        return (self.dense_n_chunk_eval
                if self.dense_n_chunk_eval is not None else 0)

    def k_for_pair(self, inp_scale, out_scale):
        """Neighbor budget for a trunk conv from ``inp_scale`` to
        ``out_scale`` (see ``neighbor_k_pairs`` / ``neighbor_k_gaps``)."""
        i, j = int(inp_scale), int(out_scale)
        if self.neighbor_k_pairs is not None:
            m = self.neighbor_k_pairs
            row = m[min(i, len(m) - 1)]
            return int(row[min(j, len(row) - 1)])
        gap = j - i
        if gap <= 0 or self.neighbor_k_gaps is None:
            return self.neighbor_k
        gaps = self.neighbor_k_gaps
        if not isinstance(gaps, (list, tuple)):
            return int(gaps)
        return int(gaps[min(gap - 1, len(gaps) - 1)])

    def occ_for_radius(self, radius):
        """Resolve the 'cell' search window budget for a search radius
        (see ``cell_occ_cap``)."""
        caps = self.cell_occ_cap
        if caps is None:
            caps = [48] + [128] * max(len(self._radii) - 1, 0)
        if not isinstance(caps, (list, tuple)):
            return int(caps)
        idx = int(np.argmin([abs(float(radius) - r) for r in self._radii]))
        return int(caps[min(idx, len(caps) - 1)])

    # cap on a cached tap tensor's size: sharing taps across convs forces
    # XLA to materialize the full [Q, K, S] array (the inline form fuses
    # into the conv einsum and never exists whole).  Worth it at bench
    # scales (~20 MB), fatal at canyon scale (~0.7 GB per pair) — above the
    # cap convs build taps inline.
    tap_cache_max_elems: int = 32 * 1024 * 1024

    def pair_taps(self, cache, src_name, dst_name, nl, extents, inp_pos,
                  out_pos, window_name=None, filter_size=None,
                  ignore_query=False, dtype=None):
        """Memoized conv tap tensor for a (pair, radius, window, filter-size)
        combination — shared by every conv of the step over that geometry.
        Returns None (= build inline, fused) when the tensor would exceed
        ``tap_cache_max_elems``.

        ``dtype``: tap storage dtype.  Default-precision trunk convs cast
        taps to bf16 at use anyway (ops/cconv.py fast path), so caching
        them in bf16 is value-identical while halving tap HBM traffic and
        residency; precision-pinned consumers (the ASCC momentum stack)
        pass float32 explicitly."""
        fsz = tuple(int(x) for x in (filter_size or self.kernel_size))
        q, k = nl.idx.shape
        if q * k * fsz[0] * fsz[1] * fsz[2] > self.tap_cache_max_elems:
            return None
        if dtype is None:
            dtype = (jnp.bfloat16 if self.precision in (None, "default")
                     else jnp.float32)
        key = (src_name, dst_name, float(extents), window_name, fsz,
               bool(ignore_query), jnp.dtype(dtype).name)
        return cache.taps(key, lambda: checkpoint_name(build_tap_tensor(
            out_pos, inp_pos, nl, extents, fsz,
            window_fn=get_window_func(window_name),
            coordinate_mapping=self.coordinate_mapping,
            interpolation=self.interpolation, align_corners=True,
            dtype=dtype),
            "dmcf_taps"))

    def trunk_pairs(self):
        """Static (inp_scale, out_scale) pair set the trunk will request
        this step — overridden by HRNet; used to prefetch all pair
        searches in one batched op."""
        return []

    def _prefetch_pairs(self, cache, dpos, dmask):
        """Run the trunk's whole pair-search set as ONE batched dense
        search (and one batched tap build) and seed the SearchCache, so
        ``_pair_neighbors`` hits the cache for every pair.  Exactness: the
        batched path vmaps the same dense search the lazy path would run,
        so seeded lists are bitwise-identical to per-pair calls."""
        pairs = self.trunk_pairs()
        if not pairs or not self.batch_pair_searches:
            return
        # pairs with a non-default K budget (neighbor_k_gaps) can't join the
        # fixed-K stacked search; they fall back to the lazy per-pair path.
        # Dense-path pairs don't use neighbor lists at all.
        pairs = [(i, j) for i, j in pairs
                 if self.k_for_pair(i, j) == self.neighbor_k
                 and not (0 < self.dense_pair_min_k
                          <= self.k_for_pair(i, j))]
        if not pairs:
            return
        sizes = [int(p.shape[0]) for p in dpos]
        if any(i >= len(sizes) or j >= len(sizes) for i, j in pairs):
            return
        nmax = max(sizes[i] for i, _ in pairs)
        qmax = max(sizes[j] for _, j in pairs)
        if len(pairs) * nmax * qmax > self.prefetch_max_elems:
            return
        if max(nmax, qmax) > self.prefetch_max_q:
            return
        # lazy 'auto' would switch to the cell search past this size; keep
        # the prefetched lists identical to what lazy calls would return
        if self.search_method == "auto" and nmax * qmax > 3e7:
            return
        if self.search_method not in ("auto", "brute"):
            return
        src = jnp.stack([_pad_rows(dpos[i], nmax) for i, _ in pairs])
        srcm = jnp.stack([_pad_rows(dmask[i], nmax) for i, _ in pairs])
        dst = jnp.stack([_pad_rows(dpos[j], qmax) for _, j in pairs])
        dstm = jnp.stack([_pad_rows(dmask[j], qmax) for _, j in pairs])
        radii = [float(self._radii[max(i, j)]) for i, j in pairs]
        nls = batched_fixed_radius_search(
            src, dst, np.asarray(radii, np.float32), cache.k,
            points_mask=srcm, queries_mask=dstm)
        nls = _name_nl(nls, "dmcf_nbr")
        for p, (i, j) in enumerate(pairs):
            qj = sizes[j]
            cache._cache[(f"dilated{i}", f"dilated{j}", radii[p])] = \
                NeighborList(idx=nls.idx[p, :qj], mask=nls.mask[p, :qj],
                             dist=nls.dist[p, :qj], count=nls.count[p, :qj],
                             disp=None if nls.disp is None else
                             nls.disp[p, :qj])

        fsz = tuple(int(x) for x in self.kernel_size)
        if qmax * cache.k * fsz[0] * fsz[1] * fsz[2] > \
                self.tap_cache_max_elems:
            return
        # same-scale pairs are requested with ignore_query=True when
        # ignore_query_points is set (different tap key — coincident
        # neighbors dropped); don't build taps that won't be reused
        tap_sel = [p for p, (i, j) in enumerate(pairs)
                   if not (self.ignore_query_points and i == j)]
        if not tap_sel:
            return
        win = get_window_func(self.window)
        sel = np.asarray(tap_sel)
        tdtype = (jnp.bfloat16 if self.precision in (None, "default")
                  else jnp.float32)
        A = jax.vmap(lambda op, ip, nl, e: build_tap_tensor(
            op, ip, nl, e, fsz, window_fn=win,
            coordinate_mapping=self.coordinate_mapping,
            interpolation=self.interpolation, align_corners=True,
            dtype=tdtype))(
            dst[sel], src[sel],
            jax.tree.map(lambda x: x[sel], nls),
            jnp.asarray(np.asarray(radii, np.float32)[sel] * 2.0))
        A = checkpoint_name(A, "dmcf_taps")
        for a, p in enumerate(tap_sel):
            i, j = pairs[p]
            key = (f"dilated{i}", f"dilated{j}", float(2.0 * radii[p]),
                   self.window, fsz, False, jnp.dtype(tdtype).name)
            cache._taps[key] = A[a, :sizes[j]]

    # ------------------------------------------------------------------
    # physics
    # ------------------------------------------------------------------

    def _gravity(self, like):
        g = jnp.asarray([0.0, self.grav, 0.0], like.dtype)
        return jnp.broadcast_to(g, like.shape)

    def integrate_pos_vel(self, pos1, vel1, acc1=None):
        """Semi-implicit Euler advection (reference
        models/pbf_model.py:234-240)."""
        dt = self.timestep
        acc = acc1 if acc1 is not None else self._gravity(vel1)
        vel2 = vel1 + dt * acc
        pos2 = pos1 + dt * vel2
        return pos2, vel2

    def compute_new_pos_vel(self, pos1, vel1, pos2, vel2, pos_correction):
        """Apply the predicted correction; velocity from position delta
        (reference models/pbf_model.py:242-250)."""
        pos = pos2 + pos_correction
        vel = (pos - pos1) / self.timestep
        return pos, vel

    # ------------------------------------------------------------------
    # transform stack
    # ------------------------------------------------------------------

    def transform(self, sample):
        """Global translate/scale/gravity-equivariant rotation (reference
        models/pbf_model.py:252-280).  Returns (sample', rotation|None)."""
        cfg = self._transform_cfg
        s = dict(sample)
        R = None
        if "translate" in cfg:
            t = jnp.asarray(cfg["translate"], jnp.float32)
            s["pos"] = s["pos"] + t
            s["box"] = s["box"] + t
            if s.get("grid_center") is not None:
                s["grid_center"] = s["grid_center"] + t
        if "scale" in cfg:
            sc = jnp.asarray(cfg["scale"], jnp.float32)
            s["pos"] = s["pos"] * sc
            s["box"] = s["box"] * sc
            s["vel"] = s["vel"] * sc
            if s.get("grav") is not None:
                s["grav"] = s["grav"] * sc
            if s.get("grid_center") is not None:
                s["grid_center"] = s["grid_center"] * sc
        if "grav_eqvar" in cfg:
            target = jnp.asarray(cfg["grav_eqvar"], jnp.float32)
            # same gravity for all particles of a sequence (row 0 is valid)
            R = align_vector(target, s["grav"][0])
            for k in ("pos", "vel", "grav", "box", "box_normals",
                      "grid_center"):
                if s.get(k) is not None:
                    s[k] = s[k] @ R
        return s, R

    def inv_transform(self, pos, vel, R):
        cfg = self._transform_cfg
        if "grav_eqvar" in cfg and R is not None:
            Rt = R.T
            pos = pos @ Rt
            vel = vel @ Rt
        if "scale" in cfg:
            sc = jnp.maximum(jnp.asarray(cfg["scale"], jnp.float32), 1e-5)
            pos = pos / sc
            vel = vel / sc
        if "translate" in cfg:
            t = jnp.asarray(cfg["translate"], jnp.float32)
            pos = pos - t
        return pos, vel

    # ------------------------------------------------------------------
    # main step
    # ------------------------------------------------------------------

    def __call__(self, sample, training=True, vel_corr=None):
        """One simulation step.

        Args:
          sample: dict with padded arrays ``pos`` [N,3], ``vel`` [N,3],
            optional ``grav`` [N,3], optional ``feats`` [N,F], ``box`` [B,3],
            ``box_normals`` [B,3], ``fluid_mask`` [N], ``box_mask`` [B].
          vel_corr: optional externally-corrected velocity (training
            ``iterations`` loop; gradient is stopped, reference
            models/pbf_model.py:314-316).

        Returns:
          (pos, vel, aux) — corrected next state plus auxiliary outputs
          (num_fluid_neighbors, pos_correction, neighbor overflow stats).
        """
        data, R = self.transform(sample)
        ctx = self.preprocess(data, training=training, vel_corr=vel_corr)
        out = self.forward(ctx, data, training=training)
        pos, vel, aux = self.postprocess(out, ctx, data, training=training,
                                         vel_corr=vel_corr)
        pos, vel = self.inv_transform(pos, vel, R)
        # keep padded rows pinned at their sentinel positions
        fm = data["fluid_mask"]
        pos = jnp.where(fm[:, None], pos, sample["pos"])
        vel = jnp.where(fm[:, None], vel, 0.0)
        return pos, vel, aux

    def forward(self, ctx, data, training=True):
        raise NotImplementedError

    # ------------------------------------------------------------------

    def preprocess(self, data, training=True, vel_corr=None):
        """Advect, assemble features, run the scale-0 convs, build the
        position pyramid (reference models/pbf_model.py:303-438)."""
        _pos = data["pos"]
        _vel = data["vel"]
        acc = data.get("grav")
        feats_in = data.get("feats")
        box, bfeats = data["box"], data["box_normals"]
        fluid_mask = data["fluid_mask"].astype(bool)
        box_mask = data["box_mask"].astype(bool)
        n_fluid = _pos.shape[0]

        if vel_corr is not None:
            vel = jax.lax.stop_gradient(vel_corr)
            pos = _pos + vel * self.timestep
        else:
            pos, vel = self.integrate_pos_vel(_pos, _vel, acc)

        filter_extent = tuple(2.0 * r for r in self._radii)
        r0 = self._radii[0]

        pos = masked_positions(pos, fluid_mask)

        crop_count = None
        if 0 < self.boundary_crop_max < box.shape[0]:
            box, bfeats, box_mask, crop_count = self._crop_boundary(
                pos, fluid_mask, box, bfeats, box_mask,
                filter_extent[-1])
        box_pos = masked_positions(box, box_mask)
        all_pos = jnp.concatenate([pos, box_pos], axis=0)
        all_mask = jnp.concatenate([fluid_mask, box_mask], axis=0)

        cache = SearchCache(self.neighbor_k, method=self.search_method,
                            occ_cap=self.occ_for_radius(self._radii[-1]),
                            transpose_reuse=self.transpose_search_reuse)

        # Multi-scale position pyramid — built FIRST so the trunk's whole
        # pair-search set (including the scale-0 all->all pair) can run as
        # one batched op.
        if self.use_bnds:
            base_pos, base_mask = all_pos, all_mask
        else:
            base_pos, base_mask = pos, fluid_mask
        all_max = base_pos.shape[0]
        if isinstance(self.scale_size_factor, (list, tuple)):
            factors = list(self.scale_size_factor)
        else:
            factors = [float(self.scale_size_factor)] * len(self.strides)
        out_maxes = [all_max if s == 1 else
                     max(8, int(np.ceil(all_max * factors[si])))
                     for si, s in enumerate(self.strides)]
        vox = (None if self.voxel_size is None
               else np.asarray(self.voxel_size, np.float32))
        dpos, dmask, dcount, didx = get_dilated_pos(
            base_pos, base_mask, list(self.strides), out_maxes,
            voxel_size=vox, centralize=self.centralize, pad=self.sample_pad,
            hyst=self.sample_hyst,
            # spatial decomposition: the halo runner supplies the GLOBAL
            # centroid so every shard's voxel pyramid anchors identically
            # (shard-local centroids would misalign grids across slabs)
            center=data.get("grid_center"))

        alias0 = self.strides[0] == 1 and self.use_bnds
        # Batched prefetch only on the inference/rollout path: it wins
        # ~1.5x forward throughput (sequencer-overhead-bound regime), but
        # under BPTT the VJP of the stacked search/tap build costs more
        # than the per-pair ops it replaced — measured A/B on TPU
        # (scripts/probe_train_variants.py): train step 774 ms (lazy) vs
        # 1080 ms (prefetched) at the wide-column scene.
        if alias0 and not training:
            self._prefetch_pairs(cache, dpos, dmask)

        # One all->all search at the finest radius serves the fluid->all and
        # box->all convs (by index subsetting), densities, the equivariant
        # displacement, and the ASCC output layer.  When scale 0 of the
        # pyramid IS all_pos (stride 1), this is the prefetched
        # dilated0->dilated0 pair (cache hit); either way the two share one
        # list (the reference re-searches per conv call).
        if alias0:
            nl_all0 = cache.get("dilated0", "dilated0", r0, all_pos,
                                all_mask, all_pos, all_mask,
                                occ_cap=self.occ_for_radius(r0))
        else:
            nl_all0 = cache.get("all", "all", r0, all_pos, all_mask,
                                all_pos, all_mask,
                                occ_cap=self.occ_for_radius(r0))
        nl_fluid0 = subset_neighbors(nl_all0, lambda i, d: i < n_fluid)
        nl_box0 = subset_neighbors(nl_all0, lambda i, d: i >= n_fluid)

        # features
        fluid_feats = [jnp.where(fluid_mask[:, None], 1.0, 0.0)]
        if self.use_vel:
            fluid_feats.append(vel)
        if self.use_acc:
            fluid_feats.append(acc if acc is not None
                               else self._gravity(vel))
        if self.use_feats and feats_in is not None:
            fluid_feats.append(feats_in)
        box_feats = [jnp.where(box_mask[:, None], 1.0, 0.0)]
        if self.use_box_feats:
            box_feats.append(bfeats)

        dens = None
        if self.dens_feats or self.dens_norm or self.pres_feats:
            if self._dens_radii[0] == r0:
                nl_dens = nl_all0
            else:
                nl_dens = cache.get(
                    "all", "all", self._dens_radii[0], all_pos, all_mask,
                    all_pos, all_mask,
                    occ_cap=self.occ_for_radius(self._dens_radii[0]))
            q = nl_dens.dist / (self._dens_radii[0] ** 2)
            win = self._win_dens if self._win_dens is not None else (
                lambda x: x)
            dens = jnp.sum(jnp.where(nl_dens.mask, win(q), 0.0), axis=1)
            if self.dens_feats:
                fluid_feats.append(dens[:n_fluid, None])
                box_feats.append(dens[n_fluid:, None])
            if self.pres_feats:
                pres = compute_pressure(dens, self.rest_dens, self.stiffness)
                fluid_feats.append(pres[:n_fluid, None])
                box_feats.append(pres[n_fluid:, None])

        fluid_feats = jnp.concatenate(fluid_feats, axis=-1)
        box_feats = jnp.concatenate(box_feats, axis=-1)
        fluid_feats = jnp.where(fluid_mask[:, None], fluid_feats, 0.0)
        box_feats = jnp.where(box_mask[:, None], box_feats, 0.0)

        if not self._use_scale0_convs():
            # PointNet path: raw fluid features, no scale-0 convs
            feats = fluid_feats
        else:
            conv_kw = dict(extents=filter_extent[0])
            # one tap tensor for the all->all pair; the fluid->all and
            # box->all convs carve their subsets out by mask (the pair
            # geometry/window values are identical)
            taps_all0 = self.pair_taps(cache, "all", "all", nl_all0,
                                       filter_extent[0], all_pos, all_pos,
                                       window_name=self.window)
            taps_fluid0 = (taps_all0 * nl_fluid0.mask[..., None]
                           if taps_all0 is not None else None)
            taps_box0 = (taps_all0 * nl_box0.mask[..., None]
                         if taps_all0 is not None else None)
            ans_conv = self.fluid_convs(fluid_feats * self.part_scale, pos,
                                        all_pos, neighbors=nl_fluid0,
                                        taps=taps_fluid0, **conv_kw)
            ans_dense = self.fluid_dense(fluid_feats)
            ans_obs = self.obs_convs(box_feats * self.part_scale, box_pos,
                                     all_pos, neighbors=nl_box0,
                                     taps=taps_box0, **conv_kw)
            ans_dense_obs = self.obs_dense(box_feats)
            ans_dense = jnp.concatenate([ans_dense, ans_dense_obs], axis=0)

            if self.use_pre_adv:
                # pre-advection branch: conv over the *un-advected* positions
                # (reference models/pbf_model.py:388-409)
                _pos_m = masked_positions(_pos, fluid_mask)
                pre_feats = [jnp.where(fluid_mask[:, None], 1.0, 0.0)]
                if self.use_vel:
                    pre_feats.append(_vel)
                pre_feats = jnp.concatenate(pre_feats, axis=-1)
                pre_feats = jnp.where(fluid_mask[:, None], pre_feats, 0.0)
                nl_pre = cache.get("pre", "all", r0, _pos_m, fluid_mask,
                                   all_pos, all_mask,
                                   occ_cap=self.occ_for_radius(r0))
                ans_adv = self.adv_convs[0](pre_feats * self.part_scale,
                                            _pos_m, all_pos,
                                            neighbors=nl_pre, **conv_kw)
                ans_dens_adv = self.adv_dense[0](pre_feats)
                ans_dens_adv = jnp.concatenate([ans_dens_adv, ans_dense_obs],
                                               axis=0)
                feats = jnp.concatenate(
                    [ans_conv, ans_obs, ans_adv, ans_dense, ans_dens_adv],
                    axis=-1)
            else:
                feats = jnp.concatenate([ans_conv, ans_obs, ans_dense],
                                        axis=-1)
            feats = jnp.where(all_mask[:, None], feats, 0.0)

        dens_pyramid = None
        if self.dens_norm:
            d0 = dens if self.use_bnds else dens[:n_fluid]
            dens_pyramid = [jnp.where(base_mask, jnp.maximum(d0, 1e-2),
                                      1.0)[:, None]]
            for scale in range(1, len(self._dens_radii)):
                ext_s = self._dens_radii[scale]
                nl_s = cache.get(f"dilated{scale - 1}", f"dilated{scale}",
                                 ext_s / 2.0, dpos[scale - 1],
                                 dmask[scale - 1], dpos[scale], dmask[scale],
                                 occ_cap=self.occ_for_radius(ext_s / 2.0),
                                 k=self.k_for_pair(scale - 1, scale))
                d = point_sampling(dens_pyramid[-1], nl_s, ext_s,
                                   window_fn=self._win_dens, normalize=True)
                d = jnp.maximum(d, 1e-2)
                dens_pyramid.append(
                    jnp.where(dmask[scale][:, None], d, 1.0))

        return {
            "cache": cache,
            "boundary_crop_count": crop_count,
            "all_pos": all_pos,
            "all_mask": all_mask,
            "pos_adv": pos,
            "vel_adv": vel,
            "n_fluid": n_fluid,
            "filter_extent": filter_extent,
            "feats": feats,
            "dilated_pos": dpos,
            "dilated_mask": dmask,
            "dilated_count": dcount,
            "dilated_caps": out_maxes,
            "dilated_idx": didx,
            "dens_pyramid": dens_pyramid,
            "nl_all0": nl_all0,
            "nl_fluid0": nl_fluid0,
            "dens": dens,
        }

    # ------------------------------------------------------------------

    def postprocess(self, out, ctx, data, training=True, vel_corr=None):
        """Scale the net output into a position correction and re-integrate
        (reference models/pbf_model.py:440-489)."""
        pos, vel = data["pos"], data["vel"]
        acc = data.get("grav")
        fluid_mask = data["fluid_mask"].astype(bool)
        n_fluid = ctx["n_fluid"]

        # fluid-neighbor count per fluid particle (loss importance weights;
        # reference models/pbf_model.py:450-453)
        num_fluid_neighbors = jnp.sum(
            ctx["nl_fluid0"].mask, axis=1).astype(jnp.float32)[:n_fluid]

        if self.equivar:
            scale = self.scale_dens(out)
            out = compute_transformed_dx(ctx["all_pos"], ctx["all_mask"],
                                         scale=scale, rot=None,
                                         radius=self._radii[0],
                                         k=self.neighbor_k)

        if out.shape[-1] == 1:
            out = jnp.repeat(out, 3, axis=-1)
        elif out.shape[-1] == 2:
            out = jnp.concatenate([out, out[:, :1]], axis=-1)

        out_scale = jnp.asarray(self.out_scale, jnp.float32)
        pos_correction = out_scale * out[:n_fluid]
        pos_correction = jnp.where(fluid_mask[:, None], pos_correction, 0.0)

        if vel_corr is not None:
            vel2 = jax.lax.stop_gradient(vel_corr)
            pos2 = pos + vel2 * self.timestep
        else:
            pos2, vel2 = self.integrate_pos_vel(pos, vel, acc)

        pos_out, vel_out = self.compute_new_pos_vel(pos, vel, pos2, vel2,
                                                    pos_correction)

        # neighbor stats: the analog of the reference's per-conv
        # _avg_neighbors debug stat (utils/convolutions.py:384-388); also
        # feeds padded-K bucket monitoring (overflow = lost neighbors)
        n_valid = jnp.maximum(jnp.sum(ctx["all_mask"]), 1)
        # worst per-pair truncation across every search of the step:
        # max(count - K) > 0 means a conv silently dropped neighbors on
        # some pair (the gap the per-pair budgets exist to close)
        pair_over = jnp.asarray(0, jnp.int32)
        pair_over_detail = {}
        for ckey, nl in ctx["cache"]._cache.items():
            if isinstance(nl, LazyDensePair):
                # no [Q, N] field exists to reduce over; dense pairs
                # cannot overflow by construction, so nothing to report
                continue
            if isinstance(nl, DensePair):
                # dense pairs cannot overflow (budget == source set); the
                # detail entry still reports max true count - N as the
                # (always <= 0) margin for the sizing tool
                excess = jnp.max(nl.count) - nl.valid.shape[1]
                dkey = f"{ckey[1]}>{ckey[2]}@{ckey[3]:g}(dense)"
                pair_over_detail[dkey] = jnp.maximum(
                    pair_over_detail.get(
                        dkey, jnp.asarray(-(1 << 20), jnp.int32)), excess)
                continue
            excess = jnp.max(nl.count) - nl.idx.shape[1]
            pair_over = jnp.maximum(pair_over, excess)
            # per-pair excess keyed "src>dst@radius" so callers can size
            # neighbor_k_pairs exactly instead of guessing from the max
            dkey = f"{ckey[0]}>{ckey[1]}@{ckey[2]:g}"
            pair_over_detail[dkey] = jnp.maximum(
                pair_over_detail.get(dkey, jnp.asarray(-(1 << 20), jnp.int32)),
                excess)
        aux = {
            "num_fluid_neighbors": num_fluid_neighbors,
            "pos_correction": pos_correction,
            "neighbor_overflow": jnp.max(ctx["nl_all0"].count),
            "pair_overflow": pair_over,
            "pair_overflow_detail": pair_over_detail,
            "avg_neighbors": jnp.sum(jnp.where(
                ctx["all_mask"], ctx["nl_all0"].count, 0)) / n_valid,
            "scale_counts": jnp.stack([jnp.asarray(c, jnp.int32)
                                       for c in ctx["dilated_count"]]),
            # static padded capacities per scale: a scale whose TRUE voxel
            # count (scale_counts) exceeds its capacity silently dropped
            # voxels — callers gate on counts <= caps (run_sample reports
            # it over whole rollouts, same protocol as pair_overflow)
            "scale_caps": jnp.asarray(ctx["dilated_caps"], jnp.int32),
        }
        if ctx["nl_all0"].cell_overflow is not None:
            aux["cell_overflow"] = jnp.max(ctx["nl_all0"].cell_overflow)
        if ctx.get("boundary_crop_count") is not None:
            aux["boundary_crop_count"] = ctx["boundary_crop_count"]
        return pos_out, vel_out, aux
