"""HRNet: multi-scale high-resolution network over particle scales.

Reference: models/hrnet.py:12-133.  A grid of continuous convolutions
``layer_channels[layer][scale][conv_idx]``: each layer computes every output
scale from every input scale (cross-scale convs with the coarser pair's
radius), merges by sum or concat, and runs optional extra per-scale convs.
Scale transitions use the shared voxel pyramid (or FPS gather/scatter when
``voxel_size`` is None).

All neighbor searches go through the step's SearchCache, so each
(scale-pair, radius) is searched once per step regardless of depth — the
reference searches once per conv call.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import jax.numpy as jnp

from .layers import Dense
from .pbf import PBFNet

relu = jax.nn.relu


def _act(name):
    if name == "tanh":
        return jnp.tanh
    if name is None:
        return lambda x: x
    raise NotImplementedError(f"unknown out_activation: {name}")


class HRNet(PBFNet):
    layer_channels: Sequence = ((16,), (32,), (32,), (3,))
    add_merge: bool = False
    out_activation: Optional[str] = None

    def setup_net(self):
        lc = self.layer_channels
        convs, denses = [], []
        for i in range(1, len(lc)):
            convs_i, denses_i = [], []
            for j in range(len(lc[i])):
                convs_j, denses_j = [], []
                for k in range(len(lc[i][j])):
                    ch = lc[i][j][k]
                    convs_k, denses_k = [], []
                    n_inp = len(lc[i - 1]) if k == 0 else 1
                    for l in range(n_inp):
                        convs_k.append(self.make_cconv(
                            f"conv{i}{j}{k}_{l}",
                            filters=ch,
                            window_func=self.window,
                            ignore_query_points=self.ignore_query_points
                            and (j == l or k > 0)))
                        denses_k.append(Dense(ch,
                                              name=f"dense{i}{j}{k}_{l}"))
                    convs_j.append(convs_k)
                    denses_j.append(denses_k)
                convs_i.append(convs_j)
                denses_i.append(denses_j)
            convs.append(convs_i)
            denses.append(denses_i)
        self.convs = convs
        self.denses = denses

    # ------------------------------------------------------------------

    def trunk_pairs(self):
        """Static (inp_scale, out_scale) set the forward grid will request
        at the standard radius ``_radii[max(i, j)]`` — drives the one-shot
        batched pair-search prefetch (PBFNet._prefetch_pairs).  The extra
        per-scale convs (conv_idx >= 1) reuse the last inner-loop extent
        (the reference quirk, models/hrnet.py:120-123) so their radius can
        differ; those fall back to lazy per-pair search."""
        lc = self.layer_channels
        pairs = []
        prev = 1
        for i in range(1, len(lc)):
            for j in range(len(lc[i])):
                for l in range(prev):
                    if (l, j) not in pairs:
                        pairs.append((l, j))
            prev = len(lc[i])
        return pairs

    def _pair_neighbors(self, ctx, inp_scale, out_scale, radius,
                        ignore_query=False):
        """Neighbor list + shared tap tensor for a scale pair — both cached
        per step, so the trunk's ~N convs over ~9 distinct pairs pay for
        search and interpolation geometry once per pair.

        Pairs whose K budget reaches ``dense_pair_min_k`` skip neighbor
        lists entirely and return a DensePair for the dense conv path
        (exact, no K budget — see PBFNet.dense_pair_min_k)."""
        if (0 < self.dense_pair_min_k
                <= self.k_for_pair(inp_scale, out_scale)
                and not ignore_query):
            n = ctx["dilated_pos"][inp_scale].shape[0]
            q = ctx["dilated_pos"][out_scale].shape[0]
            dp = ctx["cache"].get_dense(
                f"dilated{inp_scale}", f"dilated{out_scale}", radius,
                ctx["dilated_pos"][inp_scale],
                ctx["dilated_mask"][inp_scale],
                ctx["dilated_pos"][out_scale],
                ctx["dilated_mask"][out_scale],
                lazy=q * n >= self.dense_lazy_min_elems)
            return dp, None
        nl = ctx["cache"].get(
            f"dilated{inp_scale}", f"dilated{out_scale}", radius,
            ctx["dilated_pos"][inp_scale], ctx["dilated_mask"][inp_scale],
            ctx["dilated_pos"][out_scale], ctx["dilated_mask"][out_scale],
            occ_cap=self.occ_for_radius(radius),
            k=self.k_for_pair(inp_scale, out_scale))
        if ignore_query:
            from .pbf import drop_coincident
            nl = drop_coincident(nl, ctx["dilated_pos"][inp_scale],
                                 ctx["dilated_pos"][out_scale])
        taps = self.pair_taps(
            ctx["cache"], f"dilated{inp_scale}", f"dilated{out_scale}", nl,
            2.0 * radius, ctx["dilated_pos"][inp_scale],
            ctx["dilated_pos"][out_scale], window_name=self.window,
            ignore_query=ignore_query)
        return nl, taps

    def forward(self, ctx, data, training=True):
        pos = ctx["dilated_pos"]
        masks = ctx["dilated_mask"]
        idx = ctx["dilated_idx"]
        dens = ctx["dens_pyramid"]
        feats = ctx["feats"]

        if not self.use_bnds:
            feats = feats[:ctx["n_fluid"]]

        filter_extent = ctx["filter_extent"]
        # dense-pair source chunking: on for training (vmapped batches
        # multiply the [Q, N, S] tap transients), off for eval unless
        # opted in (PBFNet.dense_chunk_for)
        nck = self.dense_chunk_for(training)

        ans_convs = [[feats]]
        for layer in range(len(self.convs)):
            ans = []
            for scale in range(len(self.convs[layer])):
                importance = self.part_scale if scale == 0 else 1.0
                inp = []
                ext = filter_extent[0]
                for inp_scale in range(len(ans_convs[-1])):
                    f = relu(ans_convs[-1][inp_scale])
                    ext = filter_extent[max(inp_scale, scale)]
                    if self.dens_norm and dens is not None and \
                            inp_scale < len(dens):
                        f = jnp.concatenate(
                            [f, f / dens[inp_scale] ** 2], axis=-1)
                    f = jnp.where(masks[inp_scale][:, None], f, 0.0)
                    conv = self.convs[layer][scale][0][inp_scale]
                    nl, taps = self._pair_neighbors(
                        ctx, inp_scale, scale, ext / 2.0,
                        ignore_query=self.ignore_query_points
                        and scale == inp_scale)
                    ans_conv = conv(f * importance, pos[inp_scale],
                                    pos[scale], ext, neighbors=nl,
                                    taps=taps, n_chunk=nck)
                    if layer < len(self.denses):
                        if scale == inp_scale:
                            ans_conv = ans_conv + self.denses[layer][scale][
                                0][inp_scale](f)
                            if ans_conv.shape[-1] == \
                                    ans_convs[-1][scale].shape[-1]:
                                ans_conv = ans_conv + ans_convs[-1][scale]
                        elif self.voxel_size is None:
                            # FPS index transitions (reference
                            # models/hrnet.py:100-113)
                            if scale > inp_scale:
                                g = f
                                for i in range(inp_scale, scale):
                                    g = g[idx[i + 1]]
                                ans_conv = ans_conv + self.denses[
                                    layer][scale][0][inp_scale](g)
                            else:
                                ind = idx[scale + 1]
                                for i in range(scale + 1, inp_scale):
                                    ind = ind[idx[i + 1]]
                                d = self.denses[layer][scale][0][inp_scale](f)
                                ans_conv = ans_conv.at[ind].add(
                                    jnp.where(
                                        masks[inp_scale][:, None], d, 0.0))
                    inp.append(ans_conv)
                if self.add_merge:
                    merged = inp[0]
                    for t in inp[1:]:
                        merged = merged + t
                else:
                    merged = jnp.concatenate(inp, axis=-1)
                ans.append(merged)

                # extra per-scale convs (conv_idx >= 1); note: the reference
                # reuses the *last* inner-loop extent here (models/hrnet.py:
                # 120-123) — reproduced deliberately
                for k in range(1, len(self.convs[layer][scale])):
                    f = jnp.where(masks[scale][:, None], ans[-1], 0.0)
                    conv = self.convs[layer][scale][k][0]
                    nl, taps = self._pair_neighbors(
                        ctx, scale, scale, ext / 2.0,
                        ignore_query=self.ignore_query_points)
                    ans_conv = conv(f * importance, pos[scale], pos[scale],
                                    ext, neighbors=nl, taps=taps,
                                    n_chunk=nck)
                    ans_conv = ans_conv + self.denses[layer][scale][k][0](
                        ans[-1])
                    if len(ans_convs[-1]) > scale and \
                            ans_conv.shape[-1] == \
                            ans_convs[-1][scale].shape[-1]:
                        ans_conv = ans_conv + ans_convs[-1][scale]
                    ans[-1] = ans_conv

            ans_convs.append(ans)

        return _act(self.out_activation)(ans_convs[-1][0])
