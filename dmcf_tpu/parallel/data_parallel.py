"""Data-parallel training over a device mesh.

The reference is strictly single-GPU (SURVEY §2.4); this module adds the
scale-out path the TPU rebuild is designed for: the batch dimension of the
padded sample batch is sharded across a 1-D ``jax.sharding.Mesh`` ("data"
axis), parameters/optimizer state are replicated, and XLA's SPMD partitioner
inserts the gradient all-reduce over ICI automatically from the sharding
annotations (no hand-written collectives needed for DP — the GSPMD recipe).

Usage:
    mesh = make_mesh(jax.devices())
    dbatch = shard_batch(batch, mesh)      # device_put with batch sharding
    params = jax.device_put(params, replicated_sharding(mesh))
    train_step(...)                        # jitted step runs SPMD
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(devices=None, axis_name="data"):
    """1-D data-parallel mesh over all (or the given) devices."""
    if devices is None:
        devices = jax.devices()
    return Mesh(np.asarray(devices), (axis_name,))


def batch_sharding(mesh, axis_name="data"):
    return NamedSharding(mesh, P(axis_name))


def replicated_sharding(mesh):
    return NamedSharding(mesh, P())


def shard_batch(batch, mesh, axis_name="data"):
    """Place a padded batch dict on the mesh, batch dim sharded.

    Scalars / None pass through; [B, ...] arrays are split across the data
    axis.  B must be divisible by the mesh size (the dataloader's
    ``batch_size`` should be a multiple of the device count).
    """
    sharding = batch_sharding(mesh, axis_name)
    out = {}
    for k, v in batch.items():
        if v is None:
            out[k] = None
            continue
        out[k] = jax.device_put(v, sharding)
    return out
