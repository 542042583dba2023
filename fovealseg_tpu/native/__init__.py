"""Native C++ spatial components (TPU-era equivalent of the reference's
vendored scipy.spatial — SURVEY.md §2.6). Auto-builds via make on first use."""

from fovealseg_tpu.native.spatial import Delaunay, directed_hausdorff, nearest_neighbor

__all__ = ["Delaunay", "directed_hausdorff", "nearest_neighbor"]
