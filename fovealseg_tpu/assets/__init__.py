"""Data assets the reference ships as loose files, carried here as code.

See :mod:`fovealseg_tpu.assets.ade20k` for the color150.mat palette and
object150_info.csv tables (plus writers for the exact on-disk formats).
"""

from fovealseg_tpu.assets.ade20k import (  # noqa: F401
    ADE20K_NAMES,
    ADE20K_STUFF,
    ade20k_colors,
    color_encode,
    write_color150_mat,
    write_object150_csv,
)
