"""Spatial (particle-dimension) parallelism for one large scene.

The scale-out analog of sequence/context parallelism for neighborhood
models (SURVEY §5.7): one scene too compute-heavy for a single chip is
partitioned over the mesh along the *particle* axis.

Design note (TPU-first): particle state is tiny (100k particles = ~1 MB);
the cost is the per-particle neighbor search + conv FLOPs.  So instead of
hand-written halo exchange (the distributed-memory pattern the reference's
CUDA world would need), we annotate the particle dimension of the step's
inputs/outputs with a mesh sharding and let XLA's SPMD partitioner split
the dense per-query work (search distance blocks, conv einsums) across
devices, inserting all-gathers for the small replicated operands over ICI.
Results are bitwise-identical to the single-device step.

Measured scale-out (8-device mesh, canyon scale: 16k fluid slots + 185k
boundary, Liquid3d model, grid search): per-device FLOPs drop ~2.9x and
per-device temp HBM ~1.6x vs single-device (26% of FLOPs — the sort-based
cell-list build and other point-side work — replicate under GSPMD; the
partitioned HLO carries only small [N,3]/[N,4] position all-gathers, no
full-size candidate or tap tensors).  Guarded by
tests/test_parallel.py::TestSpatialWorkingSet.  This makes the module a
genuine compute scale-out with modest memory relief, not a full
distributed-memory decomposition; scenes that exceed one chip's HBM by
more than ~2x need the halo-exchange design (SURVEY §5.7: ppermute
boundary-zone particles between spatial shards each step) — future work.

Usage:
    mesh = make_spatial_mesh(jax.devices())
    step = make_sharded_step(model, mesh)
    pos, vel, aux = step(params, sample)   # sample arrays sharded on dim 0
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_spatial_mesh(devices=None, axis_name="sp"):
    if devices is None:
        devices = jax.devices()
    return Mesh(np.asarray(devices), (axis_name,))


def _sample_shardings(mesh, sample, axis_name="sp"):
    """Particle-dim shardings for a padded sample dict.

    The fluid/box particle counts must be divisible by the mesh size (the
    batcher's ``bucket`` should be a multiple of devices * 8).
    """
    part = NamedSharding(mesh, P(axis_name))
    out = {}
    for k, v in sample.items():
        if v is None:
            continue
        out[k] = part
    return out


def shard_sample(sample, mesh, axis_name="sp"):
    shardings = _sample_shardings(mesh, sample, axis_name)
    return {k: (jax.device_put(v, shardings[k]) if v is not None else None)
            for k, v in sample.items()}


def make_sharded_step(model, mesh, axis_name="sp"):
    """Jit the model step with particle-dim input/output shardings."""
    part = NamedSharding(mesh, P(axis_name))
    repl = NamedSharding(mesh, P())

    def step(params, sample):
        pos, vel, aux = model.apply(params, sample, training=False)
        return pos, vel, aux

    return jax.jit(
        step,
        in_shardings=(repl, None),  # params replicated; sample as placed
        out_shardings=((part, part, None)),
    )
