"""Fused continuous convolution for TPU.

TPU-native reimplementation of Open3D-ML's ``continuous_conv`` op and the
reference's antisymmetric variant (tum-pbs/DMCF utils/convolutions.py:277-470).

The op computes, for each output point i,

    y_i = 1/psi_i * sum_{j in N(i)} a_ij * f_j * g(Lambda((x_j - x_i)/r))

with ``g`` a filter array interpolated at mapped coordinates and ``a_ij`` an
optional radial window.  Instead of the reference's
gather->interpolate->accumulate CUDA kernel over ragged neighbor lists, we
factorize the (at most 8) trilinear taps per neighbor into per-axis weight
vectors, build the dense per-neighbor tap tensor

    A[i, k, s] = a_ik * wz[i,k,sz] * wy[i,k,sy] * wx[i,k,sx]      (outer prod)

and evaluate the conv as two dense matmuls that map straight onto the MXU:

    T[i]   = A[i]^T @ F[i]          # [S, K] x [K, Cin]  (batched over i)
    y_i    = vec(T[i]) @ W          # [Q, S*Cin] x [S*Cin, Cout]

No scatters, no ragged shapes; everything is jit/vmap/grad friendly and XLA
fuses the elementwise tap construction into the first matmul.

The antisymmetric (``symmetric=True``) path additionally adds the self term
``f_i * sum_j a_ij g(x_j - x_i)`` inside the same tap tensor so the pairwise
momentum exchange cancels in the executed arithmetic (reference:
utils/convolutions.py:433-458).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from .coords import (axis_interp_weights,
                     compute_centered_filter_coordinates)
from .neighbors import NeighborList


def build_symmetric_kernel(half_kernel, sym_axis):
    """Full antisymmetric kernel from a half kernel.

    ``concat([-flip(K, all axes), K], axis=sym_axis)`` — reference
    utils/convolutions.py:410-412.  The result satisfies
    ``G(-x) = -G(x)`` under the filter-coordinate mirror.
    """
    flipped = half_kernel[::-1, ::-1, ::-1]
    return jnp.concatenate([-flipped, half_kernel], axis=sym_axis)


def build_circular_kernel(radial_kernel, kernel_size, symmetric=False):
    """Expand a radial weight stack [R, Cin, Cout] to a full 3D kernel.

    Rotation-invariant kernels: each cube cell gathers the radial weight whose
    index is the max |centered coordinate| (reference
    utils/convolutions.py:395-409).  With ``symmetric=True`` the kernel is
    multiplied by the normalized signed coordinate (requires Cout == 3),
    yielding an odd (antisymmetric) vector field.
    """
    ks = tuple(int(s) for s in kernel_size)
    zr, yr, xr = jnp.meshgrid(jnp.arange(ks[0]), jnp.arange(ks[1]),
                              jnp.arange(ks[2]), indexing="ij")
    grid = jnp.stack([xr, yr, zr], axis=-1).astype(jnp.float32)
    ks_rev = jnp.asarray([ks[2], ks[1], ks[0]], jnp.float32)
    grid = grid - ks_rev / 2.0 + 0.5
    mask = grid * 2.0 / ks_rev
    idx = jnp.max(jnp.floor(jnp.abs(grid)), axis=-1).astype(jnp.int32)
    kernel = radial_kernel[idx]  # [kz, ky, kx, Cin, Cout]
    if symmetric:
        kernel = kernel * mask[..., None, :]
    return kernel


def _tap_weights(rel, filter_size, mapping, interpolation, align_corners,
                 offset):
    """[..., 3] unit-ball offsets -> per-axis tap weights (wz, wy, wx)."""
    tz, ty, tx = compute_centered_filter_coordinates(rel, filter_size,
                                                     mapping, align_corners,
                                                     offset)
    wz = axis_interp_weights(tz, filter_size[0], interpolation)
    wy = axis_interp_weights(ty, filter_size[1], interpolation)
    wx = axis_interp_weights(tx, filter_size[2], interpolation)
    return wz, wy, wx


def build_tap_tensor(out_positions,
                     inp_positions,
                     neighbors: NeighborList,
                     extents,
                     filter_size,
                     *,
                     window_fn=None,
                     coordinate_mapping: str = "ball_to_cube_volume_preserving",
                     interpolation: str = "linear",
                     align_corners: bool = True,
                     offset=None,
                     inp_importance=None,
                     dtype=jnp.float32):
    """Dense per-neighbor tap tensor ``A[q, k, s] = a_qk * w_qk(s)``.

    The geometry-only half of :func:`continuous_conv`: it depends on the
    neighbor list, positions, extent, window and filter size — NOT on the
    features or the kernel.  All convolutions of a step sharing a
    (point-set pair, radius, window) therefore share one tap tensor; callers
    cache it and pass it via ``continuous_conv(..., taps=A)``, which avoids
    re-gathering neighbor positions and re-deriving interpolation weights
    per conv (a dominant cost of the HRNet trunk, which evaluates up to
    ~24 convs over ~9 distinct pairs per step; the reference rebuilds — and
    re-searches — per conv call, utils/convolutions.py:352-379).
    """
    fz, fy, fx = (int(filter_size[0]), int(filter_size[1]),
                  int(filter_size[2]))
    s_total = fz * fy * fx
    idx, mask = neighbors.idx, neighbors.mask
    q, k = idx.shape

    extents = jnp.asarray(extents, dtype=inp_positions.dtype)
    radius = 0.5 * extents
    if extents.ndim == 0:
        rel_scale = 1.0 / radius
        r_sq = radius * radius
    else:
        rel_scale = (1.0 / radius)[:, None, None]
        r_sq = (radius * radius)[:, None]

    if neighbors.disp is not None:
        # the search kept points[idx] - queries: no re-gather (and no
        # scatter-add VJP) for the tap geometry
        rel = neighbors.disp * rel_scale
    else:
        nbr_pos = inp_positions[idx]  # [Q, K, 3]
        rel = (nbr_pos - out_positions[:, None, :]) * rel_scale

    wz, wy, wx = _tap_weights(rel, (fz, fy, fx), coordinate_mapping,
                              interpolation, align_corners, offset)

    a = mask.astype(dtype)
    if window_fn is not None:
        q_norm = neighbors.dist / r_sq  # L2: squared dist / r^2
        a = a * window_fn(q_norm).astype(dtype)
    if inp_importance is not None:
        a = a * inp_importance[idx].astype(dtype)

    wzy = wz[..., :, None] * wy[..., None, :]
    A = (wzy.reshape(q, k, fz * fy)[..., :, None]
         * wx[..., None, :]).reshape(q, k, s_total)
    return (A * a[..., None]).astype(dtype)


def _onehot_gather(features, idx, dtype):
    """Neighbor-feature gather as a one-hot matmul on the MXU.

    ``one_hot(idx) @ features`` is value-exact (each output row sums exactly
    one feature row multiplied by 1.0) and, at step scale, beats the native
    row gather on TPU: short feature rows (Cin*2 bytes) read HBM at ~1/16
    transaction efficiency, while the one-hot contraction rides the MXU and
    never materializes the [Q*K, N] operand (XLA fuses the iota-compare
    into the matmul tiles).  Measured via scripts/bench_ab.py on the
    WaterRamps bench scene; see docs/ROOFLINE.md.
    """
    q, k = idx.shape
    n = features.shape[0]
    oh = jax.nn.one_hot(idx.reshape(-1), n, dtype=dtype)
    return jnp.matmul(oh, features.astype(dtype),
                      preferred_element_type=dtype).reshape(
                          q, k, features.shape[-1])


def continuous_conv(kernel,
                    out_positions,
                    inp_positions,
                    inp_features,
                    neighbors: NeighborList,
                    extents,
                    *,
                    window_fn=None,
                    coordinate_mapping: str = "ball_to_cube_volume_preserving",
                    interpolation: str = "linear",
                    align_corners: bool = True,
                    normalize: bool = False,
                    offset=None,
                    inp_importance=None,
                    symmetric: bool = False,
                    query_features=None,
                    out_dtype=None,
                    precision="highest",
                    taps=None,
                    gather_mode: str = "row"):
    """Evaluate the continuous convolution at ``out_positions``.

    Args:
      kernel: [kz, ky, kx, Cin, Cout] filter array (already expanded for
        symmetric/circular variants).
      out_positions: [Q, 3].
      inp_positions: [N, 3].
      inp_features: [N, Cin].
      neighbors: padded NeighborList of inp points per out point (metric L2).
      extents: scalar filter extent (diameter; radius = extents / 2) or [Q]
        per-output extents.
      window_fn: optional window applied to d^2/r^2 (neighbor importance).
      normalize: divide by the per-point importance sum (or neighbor count).
      inp_importance: optional [N] per-input importance.
      symmetric: add the antisymmetric self term; requires
        ``query_features`` ([Q, Cin], the features at the output points —
        for the ASCC layer queries == points so these are ``inp_features``).
      out_dtype: accumulation/output dtype (default: feature dtype).
      precision: matmul precision.  On TPU, fp32 matmuls default to a single
        bf16 MXU pass (~1e-3 relative error) which visibly breaks the ASCC
        momentum budget; 'highest' (bf16x6 / fp32-exact) keeps the pairwise
        cancellation at fp32 accuracy.  Set to None/'default' to trade
        accuracy for MXU throughput on non-conservation-critical convs.
      taps: optional precomputed tap tensor from :func:`build_tap_tensor`
        (shared across convs over the same pair/radius/window).  When given,
        the geometry inputs (positions, window_fn, mapping, interpolation,
        offset, inp_importance) are ignored — the caller guarantees they
        match the ones the taps were built with.  Incompatible with
        ``normalize`` (the per-pair importances are already folded in).

    Returns:
      [Q, Cout] output features.
    """
    ksz = kernel.shape
    filter_size = (ksz[0], ksz[1], ksz[2])
    cin, cout = ksz[3], ksz[4]
    s_total = filter_size[0] * filter_size[1] * filter_size[2]
    dtype = out_dtype or inp_features.dtype

    idx, mask = neighbors.idx, neighbors.mask
    q, k = idx.shape

    # DEFAULT matmul precision on TPU rounds both operands to bf16 for a
    # single MXU pass anyway — doing the conversion *explicitly* (features
    # before the gather, taps once at build) halves the neighbor-gather HBM
    # traffic and kills the per-conv convert copies the profiler shows.
    # Accumulation stays f32 via preferred_element_type.  The momentum-
    # critical path ('highest') is untouched.
    fast_bf16 = precision in (None, "default") and dtype == jnp.float32

    if taps is not None:
        if normalize:
            raise ValueError("taps= is incompatible with normalize=True")
        A = taps.astype(jnp.bfloat16 if fast_bf16 else dtype)
        a = None
    else:
        extents = jnp.asarray(extents, dtype=inp_positions.dtype)
        radius = 0.5 * extents
        if extents.ndim == 0:
            rel_scale = 1.0 / radius
            r_sq = radius * radius
        else:
            rel_scale = (1.0 / radius)[:, None, None]
            r_sq = (radius * radius)[:, None]

        if neighbors.disp is not None:
            rel = neighbors.disp * rel_scale
        else:
            nbr_pos = inp_positions[idx]  # [Q, K, 3]
            rel = (nbr_pos - out_positions[:, None, :]) * rel_scale

        wz, wy, wx = _tap_weights(rel, filter_size, coordinate_mapping,
                                  interpolation, align_corners, offset)

        # per-pair importance a_ik
        a = mask.astype(dtype)
        if window_fn is not None:
            q_norm = neighbors.dist / r_sq  # L2: squared dist / r^2
            a = a * window_fn(q_norm).astype(dtype)
        if inp_importance is not None:
            a = a * inp_importance[idx].astype(dtype)

        # dense tap tensor A: [Q, K, S]
        wzy = wz[..., :, None] * wy[..., None, :]
        A = (wzy.reshape(q, k, filter_size[0] * filter_size[1])[..., :, None]
             * wx[..., None, :]).reshape(q, k, s_total)
        A = A * a[..., None]

    if fast_bf16:
        A = A.astype(jnp.bfloat16)
        if gather_mode == "onehot":
            f = _onehot_gather(inp_features, idx, jnp.bfloat16)
        else:
            # convert the [N, C] features once, THEN gather: bf16 rows
            # halve the gather's HBM traffic
            f = inp_features.astype(jnp.bfloat16)[idx]  # [Q, K, Cin]
        mm_precision = None
        mm_dtype = jnp.bfloat16
    else:
        f = inp_features[idx].astype(dtype)  # [Q, K, Cin]
        mm_precision = precision
        mm_dtype = dtype

    # T[i] = A[i]^T @ F[i]  -> [Q, S, Cin]
    T = jnp.einsum("qks,qkc->qsc", A, f, precision=mm_precision,
                   preferred_element_type=jnp.float32).astype(mm_dtype)

    if symmetric:
        if query_features is None:
            raise ValueError("symmetric conv requires query_features")
        # self term: f_i * sum_k A[i,k,s] folded into the same contraction
        t1 = jnp.sum(A.astype(dtype), axis=1)  # [Q, S]
        T = (T.astype(dtype) +
             t1[:, :, None] * query_features.astype(dtype)[:, None, :])
        mm_dtype = dtype
        mm_precision = precision

    out = jnp.matmul(T.reshape(q, s_total * cin),
                     kernel.reshape(s_total * cin, cout).astype(mm_dtype),
                     precision=mm_precision,
                     preferred_element_type=jnp.float32).astype(dtype)

    if normalize:
        if window_fn is not None or inp_importance is not None:
            denom = jnp.sum(a, axis=1)
        else:
            denom = jnp.sum(mask, axis=1).astype(dtype)
        out = jnp.where(denom[:, None] > 1e-9, out / denom[:, None], 0.0)

    return out


def _dense_contract(rel_c, a_c, f_c, *, filter_size, coordinate_mapping,
                    interpolation, align_corners, offset, fast_bf16,
                    mm_precision, dtype):
    """Shared inner contraction of the dense conv paths:
    ``T_c[q, s, c] = sum_n (a[q, n] * w[q, n, s]) f[n, c]`` for one source
    slice.  The [q, nc, s] tap field is the dominant transient; everything
    fuses into the einsum's operand read."""
    q, nc_ = a_c.shape
    s_total = filter_size[0] * filter_size[1] * filter_size[2]
    wz, wy, wx = _tap_weights(rel_c, filter_size, coordinate_mapping,
                              interpolation, align_corners, offset)
    wzy = wz[..., :, None] * wy[..., None, :]
    A = (wzy.reshape(q, nc_, filter_size[0] * filter_size[1])
         [..., :, None] * wx[..., None, :]).reshape(q, nc_, s_total)
    A = A * a_c[..., None]
    if fast_bf16:
        A = A.astype(jnp.bfloat16)
        f_c = f_c.astype(jnp.bfloat16)
    else:
        f_c = f_c.astype(dtype)
    return jnp.einsum("qns,nc->qsc", A, f_c, precision=mm_precision,
                      preferred_element_type=jnp.float32)


def continuous_conv_dense(kernel,
                          rel,
                          a,
                          inp_features,
                          *,
                          filter_scale=1.0,
                          coordinate_mapping: str =
                          "ball_to_cube_volume_preserving",
                          interpolation: str = "linear",
                          align_corners: bool = True,
                          offset=None,
                          out_dtype=None,
                          precision="default",
                          n_chunk: int = 0):
    """Continuous conv evaluated densely over ALL source points.

    TPU-native alternative to the padded-K neighbor-list path for pairs
    whose in-radius neighbor count is a sizable fraction of the source set
    (the multi-scale trunk's downsampling pairs: a coarse query at radius
    r_j covers up to ~(stride_j/stride_i)^dim fine points — measured up to
    197 of 2688 on WaterRamps, 1100+ on Liquid3d).  Instead of
    search -> select-K -> gather (sorts and short-row gathers that run on
    the scalar/vector units), we keep the full [Q, N] pair field dense:

        T[q, s, c] = sum_n (a[q, n] * w[q, n, s]) f[n, c]
        y[q]       = vec(T[q]) @ W

    Everything is elementwise + two matmuls, so XLA fuses the tap
    construction into the first contraction's operand read and the whole
    conv rides the MXU.  Exactness: out-of-radius pairs carry a == 0, so
    the result equals the ragged-exact semantics of the reference's CSR
    lists (utils/convolutions.py:352-373) with NO K budget to overflow.

    Args:
      kernel: [kz, ky, kx, Cin, Cout].
      rel: [Q, N, 3] displacement ``src - query`` ALREADY scaled by
        1/radius (unit-ball coordinates).
      a: [Q, N] combined validity * window * importance weights (zero for
        out-of-radius or masked pairs).
      inp_features: [N, Cin].
      filter_scale: kept for interface symmetry (rel is pre-scaled).
      n_chunk: when > 0 and N > n_chunk, the source dimension is processed
        in ``n_chunk``-wide slices under a ``lax.scan``, bounding the
        dominant [Q, chunk, S] tap-field transient (and its VJP residuals)
        instead of materializing [Q, N, S] — the dense analog of the
        K-list path's ``conv_k_chunk``.  The accumulator is fp32, so the
        result matches the unchunked path to fp-summation-order tolerance.
        Needed when the pair field is huge (canyon coarse pairs) or the
        conv runs under a vmapped training batch (batch 16 x window 3
        WaterRamps: 16 x [1344, 2688, 64] bf16 tap fields OOM one chip
        unchunked).
    """
    ksz = kernel.shape
    filter_size = (ksz[0], ksz[1], ksz[2])
    cin, cout = ksz[3], ksz[4]
    s_total = filter_size[0] * filter_size[1] * filter_size[2]
    dtype = out_dtype or inp_features.dtype
    q, n = a.shape

    fast_bf16 = precision in (None, "default") and dtype == jnp.float32
    if fast_bf16:
        mm_precision = None
        mm_dtype = jnp.bfloat16
    else:
        mm_precision = precision
        mm_dtype = dtype

    def taps_times_feats(rel_c, a_c, f_c):
        """T_c[q, s, c] for one source slice — the [q, nc, s] tap field is
        the dominant transient; everything fuses into the contraction."""
        return _dense_contract(rel_c, a_c, f_c, filter_size=filter_size,
                               coordinate_mapping=coordinate_mapping,
                               interpolation=interpolation,
                               align_corners=align_corners, offset=offset,
                               fast_bf16=fast_bf16,
                               mm_precision=mm_precision, dtype=dtype)

    if 0 < n_chunk < n:
        nchunks = -(-n // n_chunk)
        npad = nchunks * n_chunk - n
        f_in = inp_features
        # slice the pair field per coordinate PLANE: dynamic_slice forces
        # its operand to materialize, and a materialized [Q, N, 3] array
        # pads its minor dim 3 to the 128-lane TPU tile — a 42.7x HBM
        # blow-up (batch-16 WaterRamps training: 16 x 1.85 GB).  Plane
        # extraction stays fused into get_dense's broadcast-subtract, so
        # only well-tiled [Q, N] planes ever exist.
        rel_p = tuple(rel[..., c] for c in range(3))
        if npad:
            # padded sources carry a == 0 and harmless in-ball geometry
            # (mirrors SearchCache.get_dense's invalid-pair sanitization,
            # keeping every VJP path through them finite)
            rel_p = tuple(jnp.pad(r, ((0, 0), (0, npad)),
                                  constant_values=1.0) for r in rel_p)
            a = jnp.pad(a, ((0, 0), (0, npad)))
            f_in = jnp.pad(f_in, ((0, npad), (0, 0)))

        # remat the chunk body: without it the scan's VJP saves each
        # chunk's [q, n_chunk, s] tap field A as a stacked residual —
        # re-materializing the full [q, n, s] field the chunking exists
        # to avoid.  Recomputing taps in the backward pass is the trade.
        @jax.checkpoint
        def chunk_T(rel_c, a_c, f_c):
            return taps_times_feats(rel_c, a_c, f_c)

        def body(T, i):
            start = i * n_chunk
            rel_c = tuple(jax.lax.dynamic_slice_in_dim(r, start, n_chunk, 1)
                          for r in rel_p)
            a_c = jax.lax.dynamic_slice_in_dim(a, start, n_chunk, 1)
            f_c = jax.lax.dynamic_slice_in_dim(f_in, start, n_chunk, 0)
            return T + chunk_T(rel_c, a_c, f_c), None

        T = jnp.zeros((q, s_total, cin), jnp.float32)
        T, _ = jax.lax.scan(body, T, jnp.arange(nchunks, dtype=jnp.int32))
        T = T.astype(mm_dtype)
    else:
        T = taps_times_feats(rel, a, inp_features).astype(mm_dtype)

    out = jnp.matmul(T.reshape(q, s_total * cin),
                     kernel.reshape(s_total * cin, cout).astype(mm_dtype),
                     precision=mm_precision,
                     preferred_element_type=jnp.float32).astype(dtype)
    return out


def continuous_conv_dense_lazy(kernel,
                               src_pos,
                               src_mask,
                               dst_pos,
                               dst_mask,
                               radius,
                               inp_features,
                               *,
                               window_fn=None,
                               coordinate_mapping: str =
                               "ball_to_cube_volume_preserving",
                               interpolation: str = "linear",
                               align_corners: bool = True,
                               offset=None,
                               out_dtype=None,
                               precision="default",
                               n_chunk: int = 512):
    """:func:`continuous_conv_dense` with deferred pair geometry.

    Instead of consuming a precomputed [Q, N] pair field (rel planes /
    window argument / validity), the geometry is recomputed per
    ``n_chunk``-wide source slice inside the scan — one fused
    subtract/compare/window per chunk, so NOTHING O(Q*N)-shaped is ever
    resident in HBM.  This is what lets canyon-scale pairs (12k x 12k)
    run dense: an eager DensePair's cached fp32 planes are ~2.3 GB per
    pair there, and the trunk holds up to 8 pairs live at once.

    Exactness matches the eager path bit-for-bit on valid pairs: same
    unit-ball scaling, same invalid-pair sanitization (rel pinned to 1.0 /
    qnorm to 2.0 outside the ball so every VJP stays finite — see
    SearchCache.get_dense), same ragged-exact semantics as the reference's
    CSR lists (utils/convolutions.py:352-373) with no K budget to overflow.

    Args mirror :func:`continuous_conv_dense` except geometry comes as
    (src_pos [N,3], src_mask [N], dst_pos [Q,3], dst_mask [Q], radius) and
    the window fold happens inside.  ``n_chunk`` <= 0 falls back to 512
    (the lazy path exists for scales where unchunked [Q, N, S] cannot fit).
    """
    ksz = kernel.shape
    filter_size = (ksz[0], ksz[1], ksz[2])
    cin, cout = ksz[3], ksz[4]
    s_total = filter_size[0] * filter_size[1] * filter_size[2]
    dtype = out_dtype or inp_features.dtype
    q = dst_pos.shape[0]
    n = src_pos.shape[0]
    if n_chunk <= 0:
        n_chunk = 512
    n_chunk = min(n_chunk, n)

    fast_bf16 = precision in (None, "default") and dtype == jnp.float32
    if fast_bf16:
        mm_precision = None
        mm_dtype = jnp.bfloat16
    else:
        mm_precision = precision
        mm_dtype = dtype

    inv_r = jnp.asarray(1.0 / radius, dst_pos.dtype)
    dmask = dst_mask.astype(bool)
    # per-plane query coordinates (a [Q, 3] slice is cheap; the [Q, N, 3]
    # broadcast it feeds must stay plane-form — minor dim 3 pads to the
    # 128-lane TPU tile, a 42.7x HBM blow-up if materialized)
    dst_p = tuple(dst_pos[:, c] for c in range(3))

    r2 = jnp.asarray(radius, dst_pos.dtype) ** 2
    inv_r2 = jnp.asarray(1.0 / (radius * radius), dst_pos.dtype)

    def chunk_T(src_c, smask_c, f_c):
        rel_u = tuple(src_c[:, c][None, :] - dst_p[c][:, None]
                      for c in range(3))
        d2 = rel_u[0] * rel_u[0] + rel_u[1] * rel_u[1] + rel_u[2] * rel_u[2]
        # validity in UNSCALED space (d2 <= r^2), exactly as the eager
        # SearchCache.get_dense computes it — same borderline inclusion
        valid = (d2 <= r2) & smask_c[None, :].astype(bool) & dmask[:, None]
        # invalid pairs pinned to harmless geometry just outside the ball:
        # padded rows sit at far sentinels whose window/mapping VJPs
        # overflow fp32, and the where-VJP would turn 0 x inf into NaN
        rel = tuple(jnp.where(valid, r * inv_r, 1.0) for r in rel_u)
        qn = jnp.where(valid, d2 * inv_r2, 2.0)
        a = valid.astype(jnp.float32)
        if window_fn is not None:
            a = a * jnp.where(valid, window_fn(qn), 0.0)
        # plane order (x, y, z) — _tap_weights' tuple convention
        return _dense_contract((rel[0], rel[1], rel[2]), a, f_c,
                               filter_size=filter_size,
                               coordinate_mapping=coordinate_mapping,
                               interpolation=interpolation,
                               align_corners=align_corners, offset=offset,
                               fast_bf16=fast_bf16,
                               mm_precision=mm_precision, dtype=dtype)

    if n_chunk < n:
        nchunks = -(-n // n_chunk)
        npad = nchunks * n_chunk - n
        f_in = inp_features
        if npad:
            src_pos = jnp.pad(src_pos, ((0, npad), (0, 0)))
            src_mask = jnp.pad(src_mask, (0, npad))
            f_in = jnp.pad(f_in, ((0, npad), (0, 0)))

        # remat: without it the scan's VJP saves each chunk's [q, nc, s]
        # tap field as a stacked residual — re-materializing the full
        # [q, n, s] field the chunking exists to avoid
        body_fn = jax.checkpoint(chunk_T)

        def body(T, i):
            start = i * n_chunk
            src_c = jax.lax.dynamic_slice_in_dim(src_pos, start, n_chunk, 0)
            sm_c = jax.lax.dynamic_slice_in_dim(src_mask, start, n_chunk, 0)
            f_c = jax.lax.dynamic_slice_in_dim(f_in, start, n_chunk, 0)
            return T + body_fn(src_c, sm_c, f_c), None

        T = jnp.zeros((q, s_total, cin), jnp.float32)
        T, _ = jax.lax.scan(body, T, jnp.arange(nchunks, dtype=jnp.int32))
        T = T.astype(mm_dtype)
    else:
        T = chunk_T(src_pos, src_mask, inp_features).astype(mm_dtype)

    out = jnp.matmul(T.reshape(q, s_total * cin),
                     kernel.reshape(s_total * cin, cout).astype(mm_dtype),
                     precision=mm_precision,
                     preferred_element_type=jnp.float32).astype(dtype)
    return out


def point_sampling(inp_features,
                   neighbors: NeighborList,
                   extents,
                   *,
                   window_fn=None,
                   normalize: bool = True):
    """Windowed scatter/average between point sets (reference PointSampling,
    utils/convolutions.py:888-1061: an identity-kernel CConv).

    Reduces to a (window-)weighted masked mean of neighbor features.
    """
    idx, mask = neighbors.idx, neighbors.mask
    dtype = inp_features.dtype
    a = mask.astype(dtype)
    if window_fn is not None:
        extents = jnp.asarray(extents, dtype=dtype)
        radius = 0.5 * extents
        r_sq = radius * radius if extents.ndim == 0 else (radius * radius)[:, None]
        a = a * window_fn(neighbors.dist / r_sq).astype(dtype)
    f = inp_features[idx]  # [Q, K, C]
    out = jnp.einsum("qk,qkc->qc", a, f)
    if normalize:
        denom = jnp.sum(a, axis=1)
        out = jnp.where(denom[:, None] > 1e-9, out / denom[:, None], 0.0)
    return out


def reduce_neighbor_count(neighbors: NeighborList, num_out: Optional[int] = None):
    """Per-output valid neighbor count as float (reference
    ``reduce_subarrays_sum`` over ones, models/pbf_model.py:450-453)."""
    cnt = jnp.sum(neighbors.mask, axis=1).astype(jnp.float32)
    if num_out is not None:
        cnt = cnt[:num_out]
    return cnt
