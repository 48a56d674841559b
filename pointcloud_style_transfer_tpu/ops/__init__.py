"""Point-cloud compute primitives (jnp reference impls + Pallas TPU kernels)."""

from .grid_knn import grid_knn
from .distance import (chamfer_distance, chamfer_distance_l2, knn, min_sq_dist,
                       square_distance)
from .interpolate import knn_interpolate
from .sampling import (complement_indices, farthest_point_sample,
                       index_points, query_ball_point)
from .voxel import (voxel_downsample, voxel_downsample_partition,
                    voxel_downsample_with_complement)

__all__ = [
    "square_distance", "min_sq_dist", "chamfer_distance",
    "chamfer_distance_l2", "knn", "knn_interpolate", "index_points",
    "farthest_point_sample", "query_ball_point", "voxel_downsample",
    "voxel_downsample_with_complement", "voxel_downsample_partition",
    "complement_indices", "grid_knn",
]
