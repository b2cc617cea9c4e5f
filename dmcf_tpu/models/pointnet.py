"""PointNet baseline: dense layers + neighborhood sum pooling.

Reference: models/pointnet.py:13-195.  No conv pyramid: per-point dense
layers whose outputs are sum-pooled over the fixed-radius neighborhood at
the finest scale each block.

Behavioral note: the reference applies its dense layers to *fluid* features
only, then gathers with neighbor indices that span fluid+boundary points —
on GPU, TF's out-of-bounds gather silently yields zeros, so boundary
particles contribute zero features.  We reproduce that by zero-padding the
feature rows for boundary particles explicitly.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import jax.numpy as jnp

from .hrnet import _act
from .layers import Dense
from .pbf import PBFNet

relu = jax.nn.relu


class PointNet(PBFNet):
    layer_channels: Sequence[int] = (32, 64, 64, 3)
    out_activation: Optional[str] = None

    def setup_net(self):
        self.denses = [Dense(ch, name=f"dense{i}")
                       for i, ch in enumerate(self.layer_channels)]

    def _use_scale0_convs(self):
        return False

    def forward(self, ctx, data, training=True):
        pos = ctx["dilated_pos"][0]
        mask = ctx["dilated_mask"][0]
        n_fluid = ctx["n_fluid"]
        feats = ctx["feats"]
        n_all = pos.shape[0]
        if feats.shape[0] < n_all:
            feats = jnp.pad(feats, ((0, n_all - feats.shape[0]), (0, 0)))

        # neighborhood sum pooling at particle_radii[0] (NOT doubled:
        # reference models/pointnet.py:131-133 searches at the radius itself)
        nl = ctx["cache"].get("pn", "pn", self._radii[0], pos, mask, pos,
                              mask)
        ctx["nl_pointnet"] = nl

        ans = [feats]
        for dense in self.denses:
            f = relu(ans[-1])
            f = jnp.where(mask[:, None], f, 0.0)
            d = dense(f)
            d = jnp.where(mask[:, None], d, 0.0)
            pooled = jnp.where(nl.mask[..., None], d[nl.idx], 0.0)
            pooled = jnp.sum(pooled, axis=1)
            if pooled.shape[-1] == ans[-1].shape[-1]:
                pooled = pooled + ans[-1]
            ans.append(pooled)

        return _act(self.out_activation)(ans[-1])

    def postprocess(self, out, ctx, data, training=True, vel_corr=None):
        """PointNet variant (reference models/pointnet.py:149-195): neighbor
        counts come from its own all->all search, and low-dim outputs are
        NOT broadcast to 3D."""
        pos, vel = data["pos"], data["vel"]
        acc = data.get("grav")
        fluid_mask = data["fluid_mask"].astype(bool)
        n_fluid = ctx["n_fluid"]

        nl = ctx.get("nl_pointnet", ctx["nl_all0"])
        num_fluid_neighbors = jnp.sum(nl.mask, axis=1).astype(
            jnp.float32)[:n_fluid]

        if self.equivar:
            from ..ops import compute_transformed_dx
            scale = self.scale_dens(out)
            out = compute_transformed_dx(ctx["all_pos"], ctx["all_mask"],
                                         scale=scale, rot=None,
                                         radius=self._radii[0],
                                         k=self.neighbor_k)

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
        aux = {
            "num_fluid_neighbors": num_fluid_neighbors,
            "pos_correction": pos_correction,
            "neighbor_overflow": jnp.max(nl.count),
            "scale_counts": jnp.stack([jnp.asarray(c, jnp.int32)
                                       for c in ctx["dilated_count"]]),
        }
        return pos_out, vel_out, aux
