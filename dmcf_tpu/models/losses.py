"""Training losses (reference utils/tools/losses.py:47-110, 380-408).

All losses are masked: padded particles contribute zero and the means are
taken over valid particles only.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from ..ops import compute_density
from ..ops.windows import get_window_func


def _masked_mean(x, mask):
    denom = jnp.maximum(jnp.sum(mask), 1.0)
    return jnp.sum(jnp.where(mask, x, 0.0)) / denom


def mse_loss(target, pred, mask, fac=1.0, gamma=0.5, pre_scale=0.0,
             pre_steps=0, **kw):
    pre_f = jnp.exp(-pre_scale * jnp.asarray(pre_steps, jnp.float32))
    diff = (jnp.sum((target - pred) ** 2, axis=-1) + 1e-9) ** gamma
    return fac * _masked_mean(pre_f * diff, mask)


def weighted_mse_loss(target, pred, mask, num_fluid_neighbors, fac=1.0,
                      gamma=0.5, neighbor_scale=1.0, pre_scale=0.0,
                      pre_steps=0, **kw):
    """Neighbor-count-importance MSE: free-surface particles (few fluid
    neighbors) get exponentially larger weight."""
    pre_f = jnp.exp(-pre_scale * jnp.asarray(pre_steps, jnp.float32))
    importance = jnp.exp(-neighbor_scale * num_fluid_neighbors)
    diff = (jnp.sum((target - pred) ** 2, axis=-1) + 1e-9) ** gamma
    return fac * _masked_mean(pre_f * importance * diff, mask)


def vel_loss(target, pred, mask, input_pos, target_prev, fac=1.0, gamma=0.5,
             **kw):
    diff = (jnp.sum(((target - target_prev) - (pred - input_pos)) ** 2,
                    axis=-1) + 1e-9) ** gamma
    return fac * _masked_mean(diff, mask)


def weighted_vel_loss(target, pred, mask, input_pos, target_prev,
                      num_fluid_neighbors, fac=1.0, gamma=0.5,
                      neighbor_scale=1.0, **kw):
    importance = jnp.exp(-neighbor_scale * num_fluid_neighbors)
    diff = (jnp.sum(((target - target_prev) - (pred - input_pos)) ** 2,
                    axis=-1) + 1e-9) ** gamma
    return fac * _masked_mean(importance * diff, mask)


def momentum_loss(pos_correction, mask, fac=1.0, **kw):
    return fac * _masked_mean(jnp.mean(pos_correction, axis=-1), mask)


def density_loss(gt, pred, gt_mask, pred_mask, gt_in=None, pred_in=None,
                 gt_in_mask=None, pred_in_mask=None, radius=0.005, eps=0.01,
                 win=None, use_max=False, fac=1.0, k=64, **kw):
    """Density error vs ground truth (reference utils/tools/losses.py:380-398).

    ``use_max=True`` gives the paper's max-density metric: relative error of
    the max fluid density against the GT max density.
    """
    if pred_in is None:
        pred_in, pred_in_mask = pred, pred_mask
    if gt_in is None:
        gt_in, gt_in_mask = gt, gt_mask
    pred_dens = compute_density(pred, pred_in, radius, win,
                                out_mask=pred_mask, in_mask=pred_in_mask, k=k)
    gt_dens = compute_density(gt, gt_in, radius, win,
                              out_mask=gt_mask, in_mask=gt_in_mask, k=k)
    neg_inf = jnp.asarray(-jnp.inf, gt_dens.dtype)
    rest_dens = jnp.max(jnp.where(gt_mask, gt_dens, neg_inf))

    if use_max:
        pred_max = jnp.max(jnp.where(pred_mask, pred_dens, neg_inf))
        return fac * jnp.abs(pred_max - rest_dens) / rest_dens

    err = jax.nn.relu(pred_dens - rest_dens - eps)
    return fac * _masked_mean(err, pred_mask)


def hist_loss(target, pred, mask=None, fac=1.0, bin_size=25, **kw):
    """Velocity/position-distribution histogram KL (reference
    utils/tools/losses.py:107-108 -> evaluation_helper.compare_dist).

    Eval-only, like the reference's: ``compare_dist`` is host-side numpy
    (percentile binning with data-dependent shapes), so this cannot run
    under jit — the reference's registry entry would equally crash inside
    its tf.function trainer; no shipped config enables it for training.
    """
    import numpy as np

    try:
        target = np.asarray(target)
        pred = np.asarray(pred)
    except Exception as e:  # jax tracers cannot be materialized
        raise RuntimeError(
            "hist loss is eval-only (host-side numpy histogram); use it "
            "outside jit, e.g. in run_valid") from e
    if mask is not None:
        m = np.asarray(mask).astype(bool)
        target, pred = target[m], pred[m]
    from ..pipelines.metrics import compare_dist
    return fac * compare_dist(target, pred, bin_size=bin_size)


def get_loss(typ, fac=1.0, **kwargs):
    """Loss factory keyed by config ``typ`` (reference
    utils/tools/losses.py:47-110)."""
    if typ == "mse":
        return partial(mse_loss, fac=fac, **kwargs)
    if typ == "weighted_mse":
        return partial(weighted_mse_loss, fac=fac, **kwargs)
    if typ == "vel":
        return partial(vel_loss, fac=fac, **kwargs)
    if typ == "weighted_vel":
        return partial(weighted_vel_loss, fac=fac, **kwargs)
    if typ == "momentum":
        return partial(momentum_loss, fac=fac, **kwargs)
    if typ == "dense":
        win = get_window_func(kwargs.pop("win", None))
        return partial(density_loss, fac=fac, win=win, **kwargs)
    if typ == "chamfer":
        from ..pipelines.metrics import chamfer_loss
        return partial(chamfer_loss, fac=fac, **kwargs)
    if typ == "emd":
        from ..ops.emd import emd_loss
        return partial(emd_loss, **kwargs)
    if typ == "hist":
        return partial(hist_loss, fac=fac, **kwargs)
    raise NotImplementedError(f"unknown loss: {typ}")
