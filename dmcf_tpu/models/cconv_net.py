"""CConv baseline: plain single-scale continuous-conv residual stack
(the Ummenhofer & Koltun ICLR 2020 architecture).

Reference: models/cconv.py:12-69.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import jax.numpy as jnp

from .hrnet import _act
from .layers import Dense
from .pbf import PBFNet, drop_coincident

relu = jax.nn.relu


class CConv(PBFNet):
    layer_channels: Sequence[int] = (32, 64, 64, 3)
    out_activation: Optional[str] = None

    def setup_net(self):
        self.convs = [
            self.make_cconv(f"conv{i}",
                            filters=self.layer_channels[i],
                            window_func=self.window,
                            ignore_query_points=self.ignore_query_points)
            for i in range(1, len(self.layer_channels))
        ]
        self.denses = [Dense(self.layer_channels[i], name=f"dense{i}")
                       for i in range(1, len(self.layer_channels))]

    def forward(self, ctx, data, training=True):
        pos = ctx["dilated_pos"][0]
        mask = ctx["dilated_mask"][0]
        n_fluid = ctx["n_fluid"]
        feats = ctx["feats"][:pos.shape[0]]

        # single scale: fluid-only queries (reference models/cconv.py:50-53
        # crops feats to the fluid count)
        pos = pos[:n_fluid]
        mask = mask[:n_fluid]
        feats = feats[:n_fluid]
        ext = ctx["filter_extent"][0]

        nl = ctx["cache"].get("fluid_only", "fluid_only", ext / 2.0, pos,
                              mask, pos, mask)
        if self.ignore_query_points:
            nl = drop_coincident(nl, pos, pos)

        ans_convs = [feats]
        for conv, dense in zip(self.convs, self.denses):
            f = relu(ans_convs[-1])
            f = jnp.where(mask[:, None], f, 0.0)
            ans_conv = conv(f, pos, pos, ext, neighbors=nl)
            ans_dense = dense(f)
            if ans_dense.shape[-1] == ans_convs[-1].shape[-1]:
                ans = ans_conv + ans_dense + ans_convs[-1]
            else:
                ans = ans_conv + ans_dense
            ans_convs.append(ans)

        out = _act(self.out_activation)(ans_convs[-1])
        # postprocess slices [:n_fluid]; fluid-only output already aligned
        return out
