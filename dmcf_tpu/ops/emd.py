"""Earth mover's distance via annealed soft bipartite matching.

TPU-native (pure JAX, jittable) reimplementation of the ApproxMatch
algorithm used by the reference's custom CUDA op
(utils/tools/tf_approxmatch.cu:27-161, called from
utils/tools/losses.py:401-408): ten annealing levels with temperature
``-4^j`` (j = 7..-2, the last level exactly 0), each level soft-assigning
remaining source mass to remaining target capacity.  O(n*m) memory, dense
elementwise + row/col reductions — a natural fit for the VPU.

Supports padded point sets through ``n``/``m`` true-count arguments
(mirroring the CUDA op's dynamic-count variant approxmatchDyn,
tf_approxmatch.cu:164-298).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def approx_match(xyz1, xyz2, n=None, m=None):
    """Soft match matrix between two point sets.

    Args:
      xyz1: [B, N, 3] target points.
      xyz2: [B, M, 3] query points.
      n, m: optional [B] true counts (padded entries are excluded).

    Returns:
      match: [B, M, N] soft assignment (mass of xyz1[i] given to xyz2[j]).
    """
    b, N = xyz1.shape[:2]
    M = xyz2.shape[1]
    if n is None:
        n = jnp.full((b,), N, jnp.int32)
    if m is None:
        m = jnp.full((b,), M, jnp.int32)
    n = jnp.asarray(n, jnp.int32)
    m = jnp.asarray(m, jnp.int32)

    def single(x1, x2, nn, mm):
        nf = nn.astype(jnp.float32)
        mf = mm.astype(jnp.float32)
        # mass multipliers use integer-division semantics like the CUDA op
        multi_l = jnp.where(nn >= mm, 1.0, (mm // nn).astype(jnp.float32))
        multi_r = jnp.where(nn >= mm, (nn // mm).astype(jnp.float32), 1.0)
        maskL = (jnp.arange(N) < nn).astype(jnp.float32)
        maskR = (jnp.arange(M) < mm).astype(jnp.float32)
        d = jnp.sum((x2[:, None, :] - x1[None, :, :]) ** 2, -1)  # [M, N]

        remainL = multi_l * maskL
        remainR = multi_r * maskR
        match = jnp.zeros((M, N), jnp.float32)

        levels = -(4.0 ** jnp.arange(7, -3, -1, dtype=jnp.float32))
        levels = levels.at[-1].set(0.0)

        def body(carry, level):
            match, remainL, remainR = carry
            w = jnp.exp(level * d) * maskR[:, None] * maskL[None, :]
            # 1) each source k spreads its remaining mass over targets
            suml = 1e-9 + jnp.sum(w * remainR[:, None], axis=0)  # [N]
            ratioL = remainL / suml
            # 2) targets absorb up to their remaining capacity
            sumr = remainR * jnp.sum(w * ratioL[None, :], axis=1)  # [M]
            consumption = jnp.minimum(remainR / (sumr + 1e-9), 1.0)
            ratioR = consumption * remainR
            remainR = jnp.maximum(0.0, remainR - sumr)
            # 3) committed transport this level
            t = w * ratioL[None, :] * ratioR[:, None]
            match = match + t
            remainL = jnp.maximum(0.0, remainL - jnp.sum(t, axis=0))
            return (match, remainL, remainR), None

        (match, _, _), _ = jax.lax.scan(body, (match, remainL, remainR),
                                        levels)
        return match

    return jax.vmap(single)(xyz1, xyz2, n, m)


def match_cost(xyz1, xyz2, match):
    """Total transported euclidean distance (tf_approxmatch.cu:300-344)."""
    d = jnp.sqrt(jnp.maximum(jnp.sum(
        (xyz2[:, :, None, :] - xyz1[:, None, :, :]) ** 2, -1), 0.0))
    return jnp.sum(d * match, axis=(1, 2))


def approx_vel(pos_0, pos_1, n=None, m=None):
    """Soft-matched displacement field (reference
    utils/tools/losses.py:411-414): for each point of ``pos_0``, the
    match-weighted mean offset to ``pos_1``.  Returns [B, N, 3]."""
    vel = pos_1[:, :, None, :] - pos_0[:, None, :, :]   # [B, M, N, 3]
    match = approx_match(pos_0, pos_1, n, m)            # [B, M, N]
    return jnp.sum(vel * match[..., None], axis=1)


def emd_loss(y_true, y_pred, n=None, m=None):
    """EMD approximation = match cost / max(n, m) (reference
    utils/tools/losses.py:401-408)."""
    b, N = y_true.shape[:2]
    M = y_pred.shape[1]
    if n is None:
        n = jnp.full((b,), N, jnp.int32)
    if m is None:
        m = jnp.full((b,), M, jnp.int32)
    match = approx_match(y_true, y_pred, n, m)
    return match_cost(y_true, y_pred, match) / jnp.maximum(
        n, m).astype(jnp.float32)
