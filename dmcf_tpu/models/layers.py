"""Flax layer wrappers around the fused conv ops.

The reference wraps Open3D's ops in Keras layers (utils/convolutions.py:34);
here the parameters (filter arrays) live in flax modules while the math stays
in ``dmcf_tpu.ops`` pure functions.
"""

from __future__ import annotations

from typing import Callable, Optional, Sequence

import flax.linen as nn
import jax.numpy as jnp
import numpy as np

from ..ops import (build_circular_kernel, build_symmetric_kernel,
                   continuous_conv)
from ..ops.cconv import continuous_conv_dense, continuous_conv_dense_lazy
from ..ops.neighbors import DensePair, LazyDensePair, NeighborList


def _uniform_init(scale=0.05):
    def init(key, shape, dtype=jnp.float32):
        import jax
        return jax.random.uniform(key, shape, dtype, -scale, scale)
    return init


class ContinuousConv(nn.Module):
    """Continuous convolution layer (reference utils/convolutions.py:34-473).

    Kernel variants:
      * dense: [kz, ky, kx, Cin, Cout] parameter.
      * symmetric (ASCC): parameter is the half kernel along ``sym_axis``;
        the full antisymmetric kernel is built at call time and the self term
        is fused into the conv (momentum-conserving output layer).
      * circular: parameter is a radial stack; expanded to the cube by
        max-|coordinate| gather.

    The layer takes a precomputed ``NeighborList`` — neighbor searches are
    hoisted out so one search is shared by all convs over the same point-set
    pair per step (the reference re-searches per conv call; see SURVEY §7).
    """

    filters: int
    kernel_size: Sequence[int]
    activation: Optional[Callable] = None
    use_bias: bool = True
    align_corners: bool = True
    coordinate_mapping: str = "ball_to_cube_volume_preserving"
    interpolation: str = "linear"
    normalize: bool = False
    window_function: Optional[Callable] = None
    symmetric: bool = False
    sym_axis: int = 2
    circular: bool = False
    kernel_init: Callable = _uniform_init()
    # matmul precision for the conv contractions.  'highest' = fp32-exact
    # (required for the ASCC momentum guarantee); 'default' = single-pass
    # bf16 MXU (fast path for trunk convs, ~1e-3 rel. error).
    precision: Optional[str] = "highest"
    # neighbor-feature gather implementation for the bf16 fast path:
    # 'row' = native row gather, 'onehot' = one-hot MXU matmul (value-
    # exact for bf16 features; faster where short feature rows gather
    # poorly — see ops/cconv._onehot_gather)
    gather_mode: str = "row"
    # when > 0 and the (uncached-taps) neighbor list is wider than this,
    # evaluate the conv in K-chunks via lax.scan and sum — the conv is
    # linear in the neighbor axis, so the result is identical while the
    # [Q, K, S] tap / [Q, K, Cin] gather transients shrink to chunk width
    # (huge-K pairs: the Liquid3d canyon's (0,2) pair carries K=1376,
    # a ~1.5 GB transient unchunked at full-scene Q)
    k_chunk: int = 0
    # dense-path analog of k_chunk: when > 0, the DensePair conv scans the
    # SOURCE dimension in n_chunk slices, bounding the [Q, chunk, S] tap
    # field (ops/cconv.continuous_conv_dense n_chunk) — required for
    # vmapped training batches and canyon-scale dense pairs
    n_chunk: int = 0

    @nn.compact
    def __call__(self,
                 inp_features,
                 inp_positions,
                 out_positions,
                 extents,
                 neighbors: NeighborList,
                 inp_importance=None,
                 query_features=None,
                 taps=None,
                 n_chunk=None):
        cin = inp_features.shape[-1]
        ks = tuple(int(k) for k in self.kernel_size)

        if self.circular:
            r = int(np.ceil(max(ks) / 2))
            radial = self.param("kernel", self.kernel_init,
                                (r, cin, self.filters))
            kernel = build_circular_kernel(radial, ks,
                                           symmetric=self.symmetric)
        elif self.symmetric:
            assert ks[self.sym_axis] % 2 == 0, \
                "symmetric kernel size must be even along sym_axis"
            half = list(ks)
            half[self.sym_axis] //= 2
            half_kernel = self.param("kernel", self.kernel_init,
                                     (*half, cin, self.filters))
            kernel = build_symmetric_kernel(half_kernel, self.sym_axis)
        else:
            kernel = self.param("kernel", self.kernel_init,
                                (*ks, cin, self.filters))

        symmetric_conv = self.symmetric and not self.circular

        if isinstance(neighbors, LazyDensePair):
            # deferred-geometry dense path (canyon-scale pairs): the [Q, N]
            # pair field is recomputed per source chunk inside the conv, so
            # nothing O(Q*N) is ever resident (see LazyDensePair)
            assert not symmetric_conv and not self.normalize, \
                "dense conv path covers plain trunk convs only"
            assert inp_importance is None, \
                "lazy dense path folds importance into features"
            lp = neighbors
            out = continuous_conv_dense_lazy(
                kernel, lp.src_pos, lp.src_mask, lp.dst_pos, lp.dst_mask,
                lp.radius, inp_features,
                window_fn=self.window_function,
                coordinate_mapping=self.coordinate_mapping,
                interpolation=self.interpolation,
                align_corners=self.align_corners,
                precision=self.precision,
                n_chunk=(self.n_chunk if n_chunk is None else n_chunk))
            if self.use_bias:
                out = out + self.param("bias", nn.initializers.zeros,
                                       (self.filters,))
            if self.activation is not None:
                out = self.activation(out)
            return out

        if isinstance(neighbors, DensePair):
            # dense no-neighbor-list path (exact, no K budget): window +
            # validity fold into the per-pair weight field
            assert not symmetric_conv and not self.normalize, \
                "dense conv path covers plain trunk convs only"
            dp = neighbors
            a = dp.valid.astype(inp_features.dtype)
            if self.window_function is not None:
                a = a * jnp.where(dp.valid,
                                  self.window_function(dp.qnorm), 0.0)
            if inp_importance is not None:
                a = a * inp_importance[None, :].astype(a.dtype)
            out = continuous_conv_dense(
                kernel, dp.rel, a, inp_features,
                coordinate_mapping=self.coordinate_mapping,
                interpolation=self.interpolation,
                align_corners=self.align_corners,
                precision=self.precision,
                n_chunk=self.n_chunk if n_chunk is None else n_chunk)
            if self.use_bias:
                out = out + self.param("bias", nn.initializers.zeros,
                                       (self.filters,))
            if self.activation is not None:
                out = self.activation(out)
            return out

        conv_kw = dict(
            window_fn=self.window_function,
            coordinate_mapping=self.coordinate_mapping,
            interpolation=self.interpolation,
            align_corners=self.align_corners,
            normalize=self.normalize,
            inp_importance=inp_importance,
            symmetric=symmetric_conv,
            query_features=(query_features if query_features is not None
                            else (inp_features if symmetric_conv else None)),
            precision=self.precision,
            gather_mode=self.gather_mode,
        )
        k = neighbors.idx.shape[1]
        if taps is None and 0 < self.k_chunk < k and not self.normalize:
            import jax

            kc = self.k_chunk
            nc = -(-k // kc)
            pad = nc * kc - k

            def split(x, fill=0):
                if x is None:
                    return None
                if pad:
                    widths = ((0, 0), (0, pad)) + ((0, 0),) * (x.ndim - 2)
                    x = jnp.pad(x, widths, constant_values=fill)
                x = x.reshape(x.shape[0], nc, kc, *x.shape[2:])
                return jnp.moveaxis(x, 1, 0)  # [nc, Q, kc, ...]

            chunks = NeighborList(
                idx=split(neighbors.idx), mask=split(neighbors.mask),
                dist=split(neighbors.dist), count=None,
                disp=split(neighbors.disp))

            def body(acc, ch):
                nl = NeighborList(idx=ch.idx, mask=ch.mask, dist=ch.dist,
                                  count=None, disp=ch.disp)
                y = continuous_conv(kernel, out_positions, inp_positions,
                                    inp_features, nl, extents, **conv_kw)
                return acc + y, None

            init = jnp.zeros((neighbors.idx.shape[0], self.filters),
                             inp_features.dtype)
            # remat each chunk: without it, reverse-mode AD stacks every
            # chunk's gathered-feature/tap residuals [nc, Q, kc, ...] across
            # the scan — the exact transient k_chunk exists to bound
            # (measured: batch-16 window-3 BPTT wanted 184 GB with plain
            # scan; chunk bodies recompute in the backward instead)
            out, _ = jax.lax.scan(jax.checkpoint(body), init, chunks)
        else:
            out = continuous_conv(
                kernel, out_positions, inp_positions, inp_features,
                neighbors, extents, taps=taps, **conv_kw)

        if self.use_bias:
            bias = self.param("bias", nn.initializers.zeros,
                              (self.filters,))
            out = out + bias
        if self.activation is not None:
            out = self.activation(out)
        return out


class SparseConv(nn.Module):
    """Voxel-grid sparse convolution (reference utils/convolutions.py:476-
    675): points on a regular grid, Linf-radius search of
    ``kernel_size * voxel_size * 0.51``, identity coordinate mapping,
    nearest-neighbor interpolation.  Part of the layer-library surface; the
    shipped models do not call it.
    """

    filters: int
    kernel_size: Sequence[int]
    activation: Optional[Callable] = None
    use_bias: bool = True
    normalize: bool = False
    offset: Optional[Sequence[float]] = None
    kernel_init: Callable = _uniform_init()
    neighbor_k: int = 32

    def _offset(self):
        if self.offset is not None:
            return np.asarray(self.offset, np.float32)
        if self.kernel_size[0] % 2:
            return np.zeros(3, np.float32)
        return np.full(3, -0.5, np.float32)

    @nn.compact
    def __call__(self, inp_features, inp_positions, out_positions,
                 voxel_size, inp_mask=None, out_mask=None,
                 inp_importance=None):
        from ..ops.neighbors import fixed_radius_search

        cin = inp_features.shape[-1]
        ks = tuple(int(k) for k in self.kernel_size)
        kernel = self.param("kernel", self.kernel_init,
                            (*ks, cin, self.filters))
        offset = self._offset()
        radius = ks[-1] * voxel_size * 0.51
        nl = fixed_radius_search(
            inp_positions, out_positions - offset * voxel_size, radius,
            self.neighbor_k, points_mask=inp_mask, queries_mask=out_mask,
            metric="Linf")
        out = continuous_conv(
            kernel, out_positions - offset * voxel_size, inp_positions,
            inp_features, nl, voxel_size * ks[-1],
            coordinate_mapping="identity",
            interpolation="nearest_neighbor", align_corners=False,
            normalize=self.normalize, inp_importance=inp_importance)
        if self.use_bias:
            out = out + self.param("bias", nn.initializers.zeros,
                                   (self.filters,))
        if self.activation is not None:
            out = self.activation(out)
        return out


class SparseConvTranspose(nn.Module):
    """Transposed voxel-grid sparse convolution (reference
    utils/convolutions.py:678-886).  The reference searches out->inp then
    CSR-inverts the list; here we search inp-queries over out-points and
    invert the padded list with :func:`invert_neighbors_list`."""

    filters: int
    kernel_size: Sequence[int]
    activation: Optional[Callable] = None
    use_bias: bool = True
    normalize: bool = False
    offset: Optional[Sequence[float]] = None
    kernel_init: Callable = _uniform_init()
    neighbor_k: int = 32

    def _offset(self):
        if self.offset is not None:
            return np.asarray(self.offset, np.float32)
        if self.kernel_size[0] % 2:
            return np.zeros(3, np.float32)
        return np.full(3, -0.5, np.float32)

    @nn.compact
    def __call__(self, inp_features, inp_positions, out_positions,
                 voxel_size, inp_mask=None, out_mask=None,
                 out_importance=None):
        from ..ops.neighbors import (fixed_radius_search,
                                     invert_neighbors_list)

        cin = inp_features.shape[-1]
        ks = tuple(int(k) for k in self.kernel_size)
        kernel = self.param("kernel", self.kernel_init,
                            (*ks, cin, self.filters))
        offset = self._offset()
        radius = ks[-1] * voxel_size * 0.51
        nl_inp = fixed_radius_search(
            out_positions, inp_positions - offset * voxel_size, radius,
            self.neighbor_k, points_mask=out_mask, queries_mask=inp_mask,
            metric="Linf")
        nl = invert_neighbors_list(nl_inp, out_positions.shape[0],
                                   self.neighbor_k)
        out = continuous_conv(
            kernel, out_positions, inp_positions - offset * voxel_size,
            inp_features, nl, voxel_size * ks[-1],
            coordinate_mapping="identity",
            interpolation="nearest_neighbor", align_corners=False,
            normalize=self.normalize, inp_importance=out_importance)
        if self.use_bias:
            out = out + self.param("bias", nn.initializers.zeros,
                                   (self.filters,))
        if self.activation is not None:
            out = self.activation(out)
        return out


class PointSampling(nn.Module):
    """Windowed scatter/average between point sets (reference
    utils/convolutions.py:888-1061) as a parameterless flax layer."""

    window_function: Optional[Callable] = None
    normalize: bool = True
    neighbor_k: int = 32

    @nn.compact
    def __call__(self, inp_features, inp_positions, out_positions, extents,
                 inp_mask=None, out_mask=None):
        from ..ops import point_sampling
        from ..ops.neighbors import fixed_radius_search

        nl = fixed_radius_search(inp_positions, out_positions,
                                 float(extents) / 2.0, self.neighbor_k,
                                 points_mask=inp_mask,
                                 queries_mask=out_mask)
        return point_sampling(inp_features, nl, extents,
                              window_fn=self.window_function,
                              normalize=self.normalize)


class Dense(nn.Module):
    """Per-point dense layer (glorot uniform, like keras Dense defaults)."""

    units: int
    use_bias: bool = True
    activation: Optional[Callable] = None

    @nn.compact
    def __call__(self, x):
        y = nn.Dense(self.units, use_bias=self.use_bias,
                     kernel_init=nn.initializers.glorot_uniform())(x)
        if self.activation is not None:
            y = self.activation(y)
        return y
