"""Pallas TPU kernel for the fused continuous convolution.

Fuses the per-neighbor tap construction, window scaling, tap contraction
and the final filter matmul (+ the ASCC self term) into one kernel over
(query-tile, neighbor-slot) grid steps.  The XLA path materializes the
[Q, K, S] tap tensor in HBM (tens of MB per conv) and runs Q tiny batched
matmuls; here the tap tensor lives in a persistent VMEM accumulator.

Mosaic shape discipline drives the layout:
  * everything is computed TRANSPOSED, queries on the lane (last) axis —
    per-pair scalars arrive as [K, 1, Q] blocks of (1, 1, TQ);
  * outer products are matmuls against constant 0/1 repeat/tile expansion
    matrices (vector layouts cannot collapse minor dims);
  * the inner grid dimension walks the K neighbor slots, accumulating
    T^T [S*Cin, TQ] in scratch (keeps live temporaries to one slot), and
    the final W^T @ T^T matmul has proper MXU shape [Cout, S*Cin] x
    [S*Cin, TQ].

The ball->cube coordinate mapping runs OUTSIDE the kernel (atan has no
Mosaic lowering; XLA fuses it into the neighbor gathers anyway).

STATUS — RETIRED to experimental/ (VERDICT r1 item 7).  On v5e at
Q=3072 K=32 S=64 Cin=32 Cout=16 this kernel measures 1.37 ms vs 0.55 ms
for the XLA formulation in ops/cconv.py; the model path uses ops/cconv.py.
Still exact to ~2e-7 vs the XLA path (tests/test_pallas_kernel.py runs it
in interpret mode), kept as a worked example of Mosaic shape discipline.

LEARNINGS (why XLA wins here, and what a viable v2 would need):
1. The conv is HBM-bound, not FLOP-bound: per conv the traffic is the
   neighbor-feature gather (Q*K*Cin), the tap tensor (Q*K*S), and the
   contraction intermediates — ~20-30 MB at bench shapes, ~30 us of HBM
   time.  XLA already fuses the elementwise tap math into the gather
   consumers and keeps the batched [S,K]@[K,Cin] matmuls resident, so the
   theoretical fusion headroom is small (<30% of the 0.55 ms).
2. This kernel's losing cost is layout repair: with queries on lanes,
   flattening per-neighbor outer products needs two expansion matmuls
   ([S*Cin, S] @ [S, TQ]) per neighbor slot — O(K) MXU passes that dwarf
   the saved HBM traffic.  Mosaic cannot collapse minor dims of vector
   layouts, so the expansions cannot be folded away in this layout.
3. A viable v2 must put K on the lane axis: tap construction becomes a
   [TQ*S, K] layout built with segment reductions (one pass, no expansion
   matmuls), contracted against gathered features [K, Cin] per query tile.
   That turns the inner loop into one [S, K] @ [K, Cin] MXU pass per query
   tile — but the gather of K neighbor features per query is then a
   dynamic-index load pattern Pallas-TPU only supports via
   PrefetchScalarGridSpec row gathers, which serialize per sublane; on
   this stack the projected gather cost alone exceeds XLA's whole conv.
   Revisit if/when Mosaic grows vectorized dynamic gathers.
4. General rule confirmed twice this project: on TPU, sort/gather-shaped
   irregular ops (neighbor search, list inversion) and small-K batched
   contractions are better expressed as dense XLA ops (sort, searchsorted,
   batched matmul) than as hand kernels; Pallas pays off for *regular*
   tiled compute with reuse XLA cannot see, which this op does not have
   once the tap tensor fits the fused gather path.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..ops.coords import apply_coordinate_mapping

TQ = 128  # query tile


def _expand_mats(n_outer, n_inner):
    """REP[n_outer, n_outer*n_inner] repeats each outer element n_inner
    times; TILE[n_inner, n_outer*n_inner] tiles the inner vector n_outer
    times.  flatten(outer(a, b)) == (a @ REP) * (b @ TILE)."""
    rep = np.zeros((n_outer, n_outer * n_inner), np.float32)
    tile = np.zeros((n_inner, n_outer * n_inner), np.float32)
    for j in range(n_outer):
        rep[j, j * n_inner:(j + 1) * n_inner] = 1.0
        tile[:, j * n_inner:(j + 1) * n_inner] = np.eye(n_inner)
    return rep, tile


def _axis_hats_t(t, size):
    """Transposed hat weights: t [1, TQ] -> [size, TQ] of
    relu(1 - |t - p_i|) over centered taps ('linear' clamped mode; see
    ops/coords.axis_interp_weights)."""
    half = 0.5 * (size - 1)
    taps = jax.lax.broadcasted_iota(jnp.int32, (size, 1),
                                    0).astype(jnp.float32) - half
    t = jnp.clip(t, -half, half)
    return jnp.maximum(1.0 - jnp.abs(t - taps), 0.0)


def _kernel(relx_ref, rely_ref, relz_ref, a_ref, f_ref, qf_ref, wt_ref,
            rep_y_ref, tile_y_ref, rep_x_ref, tile_x_ref, rep_c_ref,
            tile_c_ref, o_ref, acc_ref, *, filter_size, align_corners,
            symmetric, k):
    sz, sy, sx = filter_size
    kk = pl.program_id(1)

    def centered(u, size):
        scale = 0.5 * (size - 1) if align_corners else 0.5 * size
        return u * scale

    def dot(a, b):
        return jax.lax.dot_general(a, b, (((1,), (0,)), ((), ())),
                                   preferred_element_type=jnp.float32)

    @pl.when(kk == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    x = relx_ref[0]             # [1, TQ]
    y = rely_ref[0]
    z = relz_ref[0]
    a = a_ref[0]                # [1, TQ]
    wz = _axis_hats_t(centered(z, sz), sz)   # [Sz, TQ]
    wy = _axis_hats_t(centered(y, sy), sy)   # [Sy, TQ]
    wx = _axis_hats_t(centered(x, sx), sx)   # [Sx, TQ]
    # A^T [S, TQ] via transposed expansion matmuls
    wzy = dot(rep_y_ref[:], wz) * dot(tile_y_ref[:], wy)   # [Sz*Sy, TQ]
    A = dot(rep_x_ref[:], wzy) * dot(tile_x_ref[:], wx)    # [S, TQ]
    A = A * a
    fk = f_ref[0]                                          # [Cin, TQ]
    if symmetric:
        fk = fk + qf_ref[:]
    # T^T [S*Cin, TQ] accumulation
    acc_ref[:] += dot(rep_c_ref[:], A) * dot(tile_c_ref[:], fk)

    @pl.when(kk == k - 1)
    def _():
        o_ref[:] = dot(wt_ref[:], acc_ref[:])  # [Cout, TQ]


def pallas_continuous_conv(kernel,
                           rel,
                           a,
                           feats,
                           query_feats=None,
                           *,
                           coordinate_mapping="ball_to_cube_volume_preserving",
                           align_corners=True,
                           symmetric=False,
                           interpret=False):
    """Fused conv over pre-gathered neighbor data.

    Args:
      kernel: [kz, ky, kx, Cin, Cout] filter array.
      rel: [Q, K, 3] (nbr - query) / radius, zero where invalid.
      a: [Q, K] per-pair importance (window * validity), 0 where invalid.
      feats: [Q, K, Cin] gathered neighbor features (zero where invalid).
      query_feats: [Q, Cin] (required when symmetric; a==0 on invalid slots
        also kills their self-term contribution).
    Returns: [Q, Cout] float32.
    """
    kz, ky, kx, cin, cout = kernel.shape
    q, k = a.shape
    assert q % TQ == 0, f"Q must be a multiple of {TQ} (got {q})"
    s_total = kz * ky * kx
    if query_feats is None:
        query_feats = jnp.zeros((q, cin), feats.dtype)

    # ball->cube mapping outside the kernel (atan has no Mosaic lowering)
    mx, my, mz = apply_coordinate_mapping(rel[..., 0], rel[..., 1],
                                          rel[..., 2], coordinate_mapping)

    # transposed layouts: queries on the lane axis
    def kq(x):  # [Q, K] -> [K, 1, Q]
        return x.T[:, None, :]

    f_t = jnp.transpose(feats, (1, 2, 0))      # [K, Cin, Q]
    qf_t = query_feats.T                       # [Cin, Q]
    w_t = kernel.reshape(s_total * cin, cout).T  # [Cout, S*Cin]

    rep_y, tile_y = _expand_mats(kz, ky)
    rep_x, tile_x = _expand_mats(kz * ky, kx)
    rep_c, tile_c = _expand_mats(s_total, cin)
    consts = [jnp.asarray(m.T) for m in (rep_y, tile_y, rep_x, tile_x,
                                         rep_c, tile_c)]

    body = functools.partial(_kernel, filter_size=(kz, ky, kx),
                             align_corners=align_corners,
                             symmetric=symmetric, k=k)
    grid = (q // TQ, k)
    sc_spec = pl.BlockSpec((1, 1, TQ), lambda i, j: (j, 0, i),
                           memory_space=pltpu.VMEM)

    def full_spec(arr):
        return pl.BlockSpec(arr.shape, lambda i, j: (0,) * arr.ndim,
                            memory_space=pltpu.VMEM)

    out_t = pl.pallas_call(
        body,
        grid=grid,
        in_specs=[
            sc_spec, sc_spec, sc_spec, sc_spec,
            pl.BlockSpec((1, cin, TQ), lambda i, j: (j, 0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((cin, TQ), lambda i, j: (0, i),
                         memory_space=pltpu.VMEM),
            full_spec(w_t),
        ] + [full_spec(m) for m in consts],
        out_specs=pl.BlockSpec((cout, TQ), lambda i, j: (0, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((cout, q), jnp.float32),
        scratch_shapes=[pltpu.VMEM((s_total * cin, TQ), jnp.float32)],
        interpret=interpret,
    )(kq(mx), kq(my), kq(mz), kq(a), f_t, qf_t, w_t, *consts)
    return out_t.T