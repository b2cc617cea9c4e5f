from .cconv import (build_circular_kernel, build_symmetric_kernel,
                    continuous_conv, point_sampling, reduce_neighbor_count)
from .grid_search import grid_fixed_radius_search
from .neighbors import (NeighborList, fixed_radius_search,
                        invert_neighbors_list, radius_search, search)
from .sph import (align_vector, compute_density, compute_pressure,
                  compute_transformed_dx, farthest_point_sample,
                  get_dilated_pos, grid_pos, masked_positions, nn_distance,
                  pad_sentinel_positions, prob_sample, quat_conj, quat_mean,
                  quat_mult, quat_rot)
from .windows import get_window_func

__all__ = [
    "NeighborList",
    "fixed_radius_search",
    "grid_fixed_radius_search",
    "invert_neighbors_list",
    "radius_search",
    "search",
    "continuous_conv",
    "point_sampling",
    "reduce_neighbor_count",
    "build_symmetric_kernel",
    "build_circular_kernel",
    "get_window_func",
    "align_vector",
    "compute_density",
    "compute_pressure",
    "compute_transformed_dx",
    "farthest_point_sample",
    "get_dilated_pos",
    "grid_pos",
    "masked_positions",
    "nn_distance",
    "pad_sentinel_positions",
    "prob_sample",
    "quat_conj",
    "quat_mean",
    "quat_mult",
    "quat_rot",
]
