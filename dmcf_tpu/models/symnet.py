"""SymNet: HRNet trunk + antisymmetric continuous-conv (ASCC) output stack.

Reference: models/sym_net.py:12-69.  The flagship momentum-conserving model
("DMCF"): the trunk's finest-scale output is passed through one or more
antisymmetric convolutions over all particles (fluid + boundary) at the
finest radius, giving a position correction whose pairwise exchanges cancel
exactly.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import jax.numpy as jnp

from .hrnet import HRNet, _act


class SymNet(HRNet):
    sym_kernel_size: Sequence[int] = (6, 6, 6)
    window_sym: Optional[str] = None

    # Note on config surface: the reference consumes layer_channels[:-1] as
    # the HRNet trunk and layer_channels[-1][-1] as the ASCC channel list
    # (models/sym_net.py:25,34-37).  The config loader (models/__init__.py
    # build_model) performs that split before instantiating this module, so
    # here ``layer_channels`` is already the trunk and ``sym_channels`` the
    # ASCC stack.
    sym_channels: Sequence[int] = (3,)

    def setup_net(self):
        super().setup_net()
        self.sym_convs = [
            self.make_cconv(f"sym_conv{i}",
                            filters=ch,
                            use_bias=False,
                            symmetric=True,
                            kernel_size=self.sym_kernel_size,
                            ignore_query_points=True,
                            window_func=self.window_sym,
                            sym_axis=self.sym_axis,
                            # momentum conservation requires fp32-exact
                            # pairwise cancellation (ops/cconv.py precision
                            # note); never relax with the trunk knob
                            precision="highest")
            for i, ch in enumerate(self.sym_channels)
        ]

    def forward(self, ctx, data, training=True):
        ans = HRNet.forward(self, ctx, data, training=training)

        if not self.use_bnds:
            ans = jnp.concatenate([ans, ctx["feats"][ctx["n_fluid"]:]],
                                  axis=0)

        all_pos = ctx["all_pos"]
        all_mask = ctx["all_mask"]
        ext = ctx["filter_extent"][0]
        # ASCC neighbor list: the shared all->all scale-0 search with
        # coincident points dropped (ignore_query_points=True)
        from .pbf import drop_coincident
        nl = drop_coincident(ctx["nl_all0"], all_pos, all_pos)
        # float32 taps: the ASCC stack's momentum guarantee relies on
        # pair-exact cancellation at 'highest' precision — bf16 taps would
        # degrade the residual from ~1e-9 to ~1e-4 (verify-skill invariant)
        taps = self.pair_taps(ctx["cache"], "all", "all", nl, ext, all_pos,
                              all_pos, window_name=self.window_sym,
                              filter_size=self.sym_kernel_size,
                              ignore_query=True, dtype=jnp.float32)

        for conv in self.sym_convs:
            ans = jax.nn.relu(ans)
            ans = jnp.where(all_mask[:, None], ans, 0.0)
            ans = conv(ans * self.part_scale, all_pos, all_pos, ext,
                       neighbors=nl, taps=taps)

        return _act(self.out_activation)(ans)
