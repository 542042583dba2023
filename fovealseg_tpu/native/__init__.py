"""Native C++ spatial components (TPU-era equivalent of the reference's
vendored scipy.spatial — SURVEY.md §2.6). Auto-builds via make on first use.

Surface map to the reference package:
- ``spatial``  -> qhull slice (Delaunay + barycentric find_simplex), NN, hausdorff
- ``distance`` -> distance.py / distance_wrap.c (pdist/cdist/squareform)
- ``kdtree``   -> ckdtree (KDTree: query / query_ball_point / query_ball_tree /
  query_pairs / count_neighbors / sparse_distance_matrix)
- ``rotation`` -> transform/ (Rotation, Slerp, RotationSpline, create_group)
- ``voronoi``  -> _voronoi.pyx (sort_vertices_of_regions)
"""

from fovealseg_tpu.native.spatial import (
    ConvexHull,
    Delaunay,
    HalfspaceIntersection,
    Voronoi,
    directed_hausdorff,
    nearest_neighbor,
    procrustes,
    tsearch,
)
from fovealseg_tpu.native import distance
from fovealseg_tpu.native.kdtree import KDTree, cKDTree
from fovealseg_tpu.native.rotation import Rotation, RotationSpline, Slerp
from fovealseg_tpu.native.voronoi import sort_vertices_of_regions

__all__ = [
    "ConvexHull",
    "Delaunay",
    "HalfspaceIntersection",
    "Voronoi",
    "directed_hausdorff",
    "nearest_neighbor",
    "procrustes",
    "tsearch",
    "distance",
    "KDTree",
    "cKDTree",
    "Rotation",
    "RotationSpline",
    "Slerp",
    "sort_vertices_of_regions",
]
