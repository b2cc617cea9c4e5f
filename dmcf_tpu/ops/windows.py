"""Radial window (SPH smoothing) functions.

All windows operate on the *normalized squared distance* q = d^2 / r^2
(matching the reference convention: utils/tools/losses.py:8-44 feeds
``neighbors_distance / radius**2`` into the window).

TPU notes: these are pure VPU elementwise ops; XLA fuses them into the
surrounding convolution.  ``sqrt`` of exact zeros is fine (no NaN), and the
cubic windows guard the piecewise regions with ``jnp.where``.
"""

from __future__ import annotations

import jax.numpy as jnp


def _safe_sqrt(q):
    """sqrt with finite gradient at q == 0 (d sqrt/dq -> inf there would
    poison grads at coincident particle pairs; the 1e-12 floor changes
    window values by < 1e-6)."""
    return jnp.sqrt(jnp.maximum(q, 1e-12))


def poly6(q, fac=1.0):
    return fac * jnp.clip((1.0 - q) ** 3, 0.0, 1.0)


def cubic(q, fac=1.0):
    q_sqrt = _safe_sqrt(q)
    inner = jnp.where(q_sqrt <= 0.5, 6.0 * (q_sqrt**3 - q) + 1.0,
                      2.0 * (1.0 - q_sqrt) ** 3)
    return fac * (4.0 / 3.0) * jnp.where(q <= 1.0, inner, jnp.zeros_like(q))


def linear(q, fac=1.0):
    return fac * (1.0 - _safe_sqrt(q))


def peak(q, fac=1.0):
    q_sqrt = _safe_sqrt(q)
    return fac * (1.0 - 2.0 * q_sqrt + q)


def cubic_grad(q, fac=1.0):
    q_sqrt = _safe_sqrt(q)
    inner = jnp.where(q_sqrt <= 0.5, 18.0 * q - 12.0 * q_sqrt,
                      -6.0 * (1.0 - q_sqrt) ** 2)
    return fac * (4.0 / 3.0) * jnp.where(q <= 1.0, inner, jnp.zeros_like(q))


_WINDOWS = {
    "poly6": poly6,
    "cubic": cubic,
    "linear": linear,
    "peak": peak,
    "cubic_grad": cubic_grad,
}


def get_window_func(typ, fac=1.0, **kwargs):
    """Window factory (reference: utils/tools/losses.py:8-44).

    Returns None for ``typ is None`` so callers can branch on "no window".
    """
    if typ is None:
        return None
    if callable(typ):
        return typ
    if typ not in _WINDOWS:
        raise NotImplementedError(f"unknown window function: {typ}")
    fn = _WINDOWS[typ]

    def func(q):
        return fn(q, fac=fac)

    return func
