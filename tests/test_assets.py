"""ADE20K asset tables (color150.mat palette + object150_info.csv).

The reference ships these as loose data files (data/color150.mat loaded at
eval.py:39, data/object150_info.csv); we carry the tables as code and can
materialise the exact on-disk formats.
"""

import csv
import os

import numpy as np
import pytest

from fovealseg_tpu.assets.ade20k import (
    ADE20K_NAMES,
    ADE20K_STUFF,
    ade20k_colors,
    color_encode,
    write_color150_mat,
    write_object150_csv,
)
from fovealseg_tpu.utils.ade import class_names, class_palette


def test_palette_shape_and_known_rows():
    pal = ade20k_colors()
    assert pal.shape == (150, 3) and pal.dtype == np.uint8
    # spot-check rows of the published ADE20K palette
    assert pal[0].tolist() == [120, 120, 120]   # wall
    assert pal[2].tolist() == [6, 230, 230]     # sky
    assert pal[4].tolist() == [4, 200, 3]       # tree


def test_names_and_stuff_flags():
    assert len(ADE20K_NAMES) == 150 and len(ADE20K_STUFF) == 150
    assert ADE20K_NAMES[0] == "wall"
    assert ADE20K_NAMES[2].startswith("sky")
    assert ADE20K_STUFF[0] == 1  # wall is stuff
    assert set(ADE20K_STUFF) == {0, 1}


def test_color_encode_bounds_and_ignore():
    lm = np.array([[-1, 0], [149, 150]])
    out = color_encode(lm)
    assert out.shape == (2, 2, 3)
    assert (out[0, 0] == 0).all()        # ignore label -> black
    assert (out[1, 1] == 0).all()        # out-of-range -> black
    assert (out[0, 1] == ade20k_colors()[0]).all()
    assert (out[1, 0] == ade20k_colors()[149]).all()


def test_mat_and_csv_round_trip(tmp_path):
    mat = tmp_path / "color150.mat"
    write_color150_mat(str(mat))
    from scipy.io import loadmat

    assert np.array_equal(loadmat(str(mat))["colors"], ade20k_colors())

    info = tmp_path / "object150_info.csv"
    write_object150_csv(str(info))
    rows = list(csv.reader(open(info)))
    assert rows[0] == ["Idx", "Ratio", "Train", "Val", "Stuff", "Name"]
    assert len(rows) == 151
    assert rows[1][5] == "wall" and rows[1][0] == "1"
    # the csv round-trips through the consumer surface
    assert class_names(str(info), 150)[0] == "wall"


_REF_MAT = "/root/reference/data/color150.mat"
_REF_CSV = "/root/reference/data/object150_info.csv"


@pytest.mark.skipif(not os.path.exists(_REF_MAT), reason="reference assets absent")
def test_palette_exact_vs_reference_mat():
    # pin the full 150-row table byte-for-byte against the reference asset
    from scipy.io import loadmat

    assert np.array_equal(loadmat(_REF_MAT)["colors"], ade20k_colors())


@pytest.mark.skipif(not os.path.exists(_REF_CSV), reason="reference assets absent")
def test_metadata_exact_vs_reference_csv(tmp_path):
    ours = tmp_path / "object150_info.csv"
    write_object150_csv(str(ours))
    ref_rows = list(csv.reader(open(_REF_CSV)))
    our_rows = list(csv.reader(open(ours)))
    assert our_rows == ref_rows


def test_utils_ade_uses_real_tables_at_150():
    assert np.array_equal(class_palette(150), ade20k_colors())
    assert class_names(None, 150)[0] == "wall"
    # non-150 class counts still get the generated HSV wheel
    pal51 = class_palette(51)
    assert pal51.shape == (51, 3) and pal51[-1].tolist() == [0, 0, 0]
