"""Naive numpy reference implementations used as test oracles.

These re-derive the math of Open3D-ML's continuous conv (as specified in the
reference's utils/convolutions.py docstrings and configs) with straightforward
O(N^2) loops — deliberately independent from the fused TPU implementation.
"""

import math

import numpy as np


def window_poly6(q):
    return np.clip((1.0 - q) ** 3, 0.0, 1.0)


def map_ball_to_cube_radial_np(p):
    norm = np.linalg.norm(p)
    if norm * norm < 1e-12:
        return np.zeros(3)
    linf = np.max(np.abs(p))
    return p * (norm / max(linf, 1e-12))


def map_volume_preserving_np(p):
    x, y, z = p
    sq = x * x + y * y + z * z
    if sq < 1e-12:
        return np.zeros(3)
    norm = math.sqrt(sq)
    rho_sq = x * x + y * y
    # sphere -> cylinder
    if 5.0 / 4.0 * z * z > rho_sq:
        s = math.sqrt(3.0 * norm / (norm + abs(z)))
        x, y = x * s, y * s
        z = math.copysign(norm, z)
    else:
        s = norm / math.sqrt(rho_sq)
        x, y = x * s, y * s
        z = z * 1.5
    # cylinder -> cube
    sq2 = x * x + y * y
    if sq2 >= 1e-12:
        norm2 = math.sqrt(sq2)
        if x * x >= y * y:
            tmp = math.copysign(norm2, x)
            y = math.copysign(1.0, x) * (4.0 / math.pi) * norm2 * \
                math.atan(y / x)
            x = tmp
        else:
            tmp = math.copysign(norm2, y)
            x = math.copysign(1.0, y) * (4.0 / math.pi) * norm2 * \
                math.atan(x / y)
            y = tmp
    else:
        x = y = 0.0
    return np.array([x, y, z])


def trilinear_taps(c, size):
    """(index, weight) taps for one axis, 'linear' (clamped) mode."""
    c = min(max(c, 0.0), size - 1.0)
    lo = math.floor(c)
    frac = c - lo
    hi = min(lo + 1, size - 1)
    return [(int(lo), 1.0 - frac), (int(hi), frac)]


def naive_continuous_conv(kernel,
                          out_pos,
                          inp_pos,
                          inp_feats,
                          extent,
                          window=None,
                          mapping="ball_to_cube_volume_preserving",
                          align_corners=True,
                          normalize=False,
                          ignore_query_point=False,
                          symmetric=False,
                          query_feats=None):
    """O(Q*N) loop evaluation of the continuous conv (+optional ASCC self
    term)."""
    sz, sy, sx = kernel.shape[:3]
    cout = kernel.shape[4]
    radius = extent / 2.0
    out = np.zeros((out_pos.shape[0], cout))
    for i in range(out_pos.shape[0]):
        denom = 0.0
        for j in range(inp_pos.shape[0]):
            d = inp_pos[j] - out_pos[i]
            dsq = float(np.dot(d, d))
            if dsq > radius * radius:
                continue
            if ignore_query_point and dsq == 0.0:
                continue
            a = 1.0
            if window is not None:
                a = float(window(dsq / (radius * radius)))
            denom += a
            rel = d / radius
            if mapping == "ball_to_cube_radial":
                m = map_ball_to_cube_radial_np(rel)
            elif mapping == "ball_to_cube_volume_preserving":
                m = map_volume_preserving_np(rel)
            else:
                m = rel
            if align_corners:
                cx = (m[0] + 1.0) * 0.5 * (sx - 1)
                cy = (m[1] + 1.0) * 0.5 * (sy - 1)
                cz = (m[2] + 1.0) * 0.5 * (sz - 1)
            else:
                cx = (m[0] + 1.0) * 0.5 * sx - 0.5
                cy = (m[1] + 1.0) * 0.5 * sy - 0.5
                cz = (m[2] + 1.0) * 0.5 * sz - 0.5
            g = np.zeros((kernel.shape[3], cout))
            for iz, wz in trilinear_taps(cz, sz):
                for iy, wy in trilinear_taps(cy, sy):
                    for ix, wx in trilinear_taps(cx, sx):
                        g += wz * wy * wx * kernel[iz, iy, ix]
            f = inp_feats[j].copy()
            if symmetric:
                f = f + query_feats[i]
            out[i] += a * f @ g
        if normalize and denom > 1e-9:
            out[i] /= denom
    return out
