"""Filter-coordinate computation for continuous convolutions.

Maps relative neighbor offsets (in the unit ball after dividing by the filter
radius) to continuous coordinates inside the filter array, reproducing the
semantics of Open3D-ML's ``continuous_conv`` coordinate pipeline referenced
from utils/convolutions.py:431 in tum-pbs/DMCF:

  * coordinate_mapping: 'ball_to_cube_radial',
    'ball_to_cube_volume_preserving' (sphere->cylinder->cube, both
    volume-preserving analytic maps), or 'identity'.
  * align_corners: True maps the unit cube [-1,1] onto voxel *centers*
    [0, size-1]; False maps onto the array boundary ([-0.5, size-0.5]).
  * interpolation: 'linear' (trilinear, coordinates clamped),
    'linear_border' (zero weight outside), 'nearest_neighbor'.

Everything is pure elementwise math (VPU) on fixed-shape arrays; the filter
array layout is [z][y][x][Cin][Cout], i.e. spatial axis 0 is z and axis 2 is
x, matching the reference configs (2D configs use kernel_size [1, 8, 8] with
particles in the z=0 plane).
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp

_EPS = 1e-12


def map_ball_to_cube_radial(x, y, z):
    """Radial stretch: scale by |p|_2 / |p|_inf (unit ball -> unit cube).

    NaN-safe under autodiff: the degenerate-origin branch guards the *inputs*
    of sqrt/div (double-where), not just the output — ``jnp.where`` alone
    still differentiates the untaken branch and poisons gradients at
    coincident particle pairs.
    """
    sq_norm = x * x + y * y + z * z
    zero = sq_norm < _EPS
    norm = jnp.sqrt(jnp.where(zero, 1.0, sq_norm))
    linf = jnp.maximum(jnp.maximum(jnp.abs(x), jnp.abs(y)), jnp.abs(z))
    s = jnp.where(zero, 0.0, norm / jnp.where(zero, 1.0,
                                              jnp.maximum(linf, _EPS)))
    return x * s, y * s, z * s


def map_sphere_to_cylinder(x, y, z):
    """Volume-preserving unit-ball -> unit-cylinder map (cylinder axis = z).

    All degenerate denominators are guarded at the *input* of sqrt/div so
    gradients stay finite at coincident pairs (see
    map_ball_to_cube_radial docstring)."""
    sq_norm = x * x + y * y + z * z
    rho_sq = x * x + y * y
    zero = sq_norm < _EPS
    rho_zero = rho_sq < _EPS
    cone = (5.0 / 4.0) * z * z > rho_sq

    norm = jnp.sqrt(jnp.where(zero, 1.0, sq_norm))

    # cone region (around the z axis)
    s_cone = jnp.sqrt(3.0 * norm / jnp.where(zero, 1.0,
                                             norm + jnp.abs(z)))
    x_cone = x * s_cone
    y_cone = y * s_cone
    z_cone = jnp.sign(z) * norm

    # side region
    rho = jnp.sqrt(jnp.where(rho_zero, 1.0, rho_sq))
    s_side = norm / jnp.where(rho_zero, 1.0, rho)
    x_side = x * s_side
    y_side = y * s_side
    z_side = z * (3.0 / 2.0)

    xo = jnp.where(zero, 0.0, jnp.where(cone, x_cone, x_side))
    yo = jnp.where(zero, 0.0, jnp.where(cone, y_cone, y_side))
    zo = jnp.where(zero, 0.0, jnp.where(cone, z_cone, z_side))
    return xo, yo, zo


def map_cylinder_to_cube(x, y, z):
    """Area-preserving disc -> square map applied per z-slice.  Degenerate
    inputs guarded for autodiff (see map_ball_to_cube_radial)."""
    sq_norm = x * x + y * y
    zero = sq_norm < _EPS
    norm = jnp.sqrt(jnp.where(zero, 1.0, sq_norm))
    x_dom = x * x >= y * y

    four_over_pi = 4.0 / math.pi
    # |x| dominant quadrants
    xd_x = jnp.sign(x) * norm
    xd_y = jnp.sign(x) * four_over_pi * norm * jnp.arctan(
        y / jnp.where(jnp.abs(x) < _EPS, 1.0, x))
    # |y| dominant quadrants
    yd_y = jnp.sign(y) * norm
    yd_x = jnp.sign(y) * four_over_pi * norm * jnp.arctan(
        x / jnp.where(jnp.abs(y) < _EPS, 1.0, y))

    xo = jnp.where(zero, 0.0, jnp.where(x_dom, xd_x, yd_x))
    yo = jnp.where(zero, 0.0, jnp.where(x_dom, xd_y, yd_y))
    return xo, yo, z


def apply_coordinate_mapping(x, y, z, mapping):
    if mapping == "ball_to_cube_radial":
        return map_ball_to_cube_radial(x, y, z)
    if mapping == "ball_to_cube_volume_preserving":
        x, y, z = map_sphere_to_cylinder(x, y, z)
        return map_cylinder_to_cube(x, y, z)
    if mapping == "identity":
        return x, y, z
    raise NotImplementedError(f"unknown coordinate_mapping: {mapping}")


def compute_filter_coordinates(rel, filter_size, mapping, align_corners,
                               offset=None):
    """Unit-ball relative offsets -> continuous filter-array coordinates.

    Args:
      rel: [..., 3] relative offsets (neighbor - query) / radius, x/y/z order.
      filter_size: (sz, sy, sx) spatial shape of the filter array.
      offset: optional [3] offset added to the filter coordinates (x/y/z).

    Returns:
      (cz, cy, cx): continuous coordinates, each [...], in index space of the
      corresponding filter axis.
    """
    tz, ty, tx = compute_centered_filter_coordinates(rel, filter_size,
                                                     mapping, align_corners,
                                                     offset)
    sz, sy, sx = filter_size
    return (tz + 0.5 * (sz - 1), ty + 0.5 * (sy - 1), tx + 0.5 * (sx - 1))


def compute_centered_filter_coordinates(rel, filter_size, mapping,
                                        align_corners, offset=None):
    """Like :func:`compute_filter_coordinates` but in *centered* index space
    (tap i sits at ``i - (size-1)/2``).

    Centered coordinates are ``t = u * scale`` with no additive shift, so the
    mirror ``t(-rel) == -t(rel)`` holds *bitwise* in floating point.  This is
    what makes the antisymmetric (ASCC) convolution's pairwise momentum
    exchange cancel exactly in the executed arithmetic — the additive-shift
    form would leak rounding error through the ``1 - frac`` mirror.
    """
    sz, sy, sx = filter_size
    if isinstance(rel, (tuple, list)):
        # coordinate-plane form (x, y, z), each [...]: callers at large
        # Q*K gather positions one plane at a time because a [..., 3]
        # array pads its minor dim to the 128-lane TPU tile (42.7x HBM
        # blow-up on wide neighbor lists)
        x, y, z = rel
    else:
        x, y, z = rel[..., 0], rel[..., 1], rel[..., 2]
    x, y, z = apply_coordinate_mapping(x, y, z, mapping)

    def to_centered(u, size):
        scale = 0.5 * (size - 1) if align_corners else 0.5 * size
        return u * scale

    tx = to_centered(x, sx)
    ty = to_centered(y, sy)
    tz = to_centered(z, sz)
    if offset is not None:
        tx = tx + offset[0]
        ty = ty + offset[1]
        tz = tz + offset[2]
    return tz, ty, tx


def axis_interp_weights(t, size, interpolation):
    """Per-axis interpolation weights as a dense vector over the taps.

    Args:
      t: [...] *centered* continuous coordinate (tap i at ``i - (size-1)/2``).
      interpolation: 'linear' | 'linear_border' | 'nearest_neighbor'.

    Returns:
      [..., size] weights (at most two nonzeros), so the full 3D tap weight
      tensor factorizes as an outer product wz x wy x wx.  This keeps the
      fused conv a pair of dense matmuls (MXU) with no scatters.

    'linear' uses the hat form ``relu(1 - |t - p_i|)`` after clamping t to
    the tap span — equivalent to clamped trilinear interpolation, but with a
    bitwise-exact mirror property: ``|(-t) - p_i| == |t - p_mirror(i)|``
    because IEEE negation and the symmetric clamp are exact.  That exactness
    is load-bearing for ASCC momentum conservation.
    """
    half = 0.5 * (size - 1)
    taps = (jnp.arange(size) - half).astype(t.dtype)
    if interpolation == "nearest_neighbor":
        idx = jnp.clip(jnp.round(t + half), 0, size - 1)
        return (jnp.arange(size, dtype=t.dtype) == idx[..., None]).astype(
            t.dtype)
    if interpolation == "linear":
        t = jnp.clip(t, -half, half)
        return jax.nn.relu(1.0 - jnp.abs(t[..., None] - taps))
    if interpolation == "linear_border":
        return jax.nn.relu(1.0 - jnp.abs(t[..., None] - taps))
    raise NotImplementedError(f"unknown interpolation: {interpolation}")
