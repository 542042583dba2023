"""Data pipeline tests: LVIS cooker round-trip, ODGT datasets, cityscapes
cooker, loader utilities."""

import json
import os

import numpy as np
import pytest

from fovealseg_tpu.data.cityscapes import DatasetCityscapes, PreprocessCityscapes
from fovealseg_tpu.data.loader import CachedDataset, prefetch
from fovealseg_tpu.data.lvis import (
    CIDS_MONITORED,
    DatasetLVIS,
    PreprocessLVIS,
    convert_index,
    rasterize_polygon,
)
from fovealseg_tpu.data.odgt import TrainDataset, ValDataset, parse_odgt


def test_rasterize_polygon_square():
    poly = np.array([[2, 2], [8, 2], [8, 8], [2, 8]], dtype=np.float64)  # (x, y)
    m = rasterize_polygon(poly, 12, 12)
    assert m[5, 5] and not m[0, 0] and not m[10, 10]
    assert 30 <= m.sum() <= 49


def test_convert_index():
    assert convert_index(77) == 0
    assert convert_index(150) == 50
    assert convert_index(999999) == 0


def test_lvis_cooker_roundtrip(tmp_path, rng):
    # synthetic LVIS json: 2 images, 3 annotations over monitored classes
    lvis = {
        "images": [
            {"id": 1, "height": 100, "width": 120},
            {"id": 2, "height": 80, "width": 80},
        ],
        "annotations": [
            {"id": 10, "image_id": 1, "category_id": CIDS_MONITORED[0],
             "segmentation": [[10, 10, 60, 10, 60, 50, 10, 50]]},
            {"id": 11, "image_id": 2, "category_id": CIDS_MONITORED[1],
             "segmentation": [[5, 5, 40, 5, 40, 40]]},
            {"id": 12, "image_id": 1, "category_id": CIDS_MONITORED[2],
             "segmentation": [[70, 20, 110, 20, 110, 60, 70, 60]]},
        ],
    }
    jpath = tmp_path / "lvis.json"
    jpath.write_text(json.dumps(lvis))
    cook_dir = tmp_path / "cook"
    pre = PreprocessLVIS(str(jpath), str(cook_dir), canvas=128)
    written = pre.make_n_samples(3)
    assert len(written) == 3
    # pkl cache created
    assert os.path.exists(str(jpath) + ".pkl")

    ds = DatasetLVIS(str(cook_dir), image_root=None, canvas=128)
    assert len(ds) == 3
    s = ds[0]
    assert s["img_data"].shape == (128, 128, 3)
    assert s["seg_label"].shape == (128, 128)
    assert 0.0 <= s["focus_point"][0] <= 1.0
    # the gaze pixel lands inside the padded mask
    gy = int(round(s["focus_point"][0] * 128))
    gx = int(round(s["focus_point"][1] * 128))
    assert s["seg_label"][gy, gx] == 1.0
    b = next(ds.batches(2, shuffle=False))
    assert b["img_data"].shape == (2, 128, 128, 3)
    assert b["cls_label"].dtype == np.int32


def test_odgt_train_and_val(tmp_path, rng):
    from PIL import Image

    root = tmp_path
    recs = []
    for i in range(4):
        w, h = (48, 64) if i % 2 else (64, 48)
        img = Image.fromarray((rng.uniform(0, 255, (h, w, 3))).astype(np.uint8))
        seg = Image.fromarray(rng.integers(1, 5, (h, w)).astype(np.uint8))
        img.save(root / f"im{i}.png")
        seg.save(root / f"seg{i}.png")
        recs.append({"fpath_img": f"im{i}.png", "fpath_segm": f"seg{i}.png",
                     "width": w, "height": h})
    odgt = root / "train.odgt"
    odgt.write_text("\n".join(json.dumps(r) for r in recs))

    ds = TrainDataset(str(root), str(odgt), list_train="ADE_train",
                      imgSizes=(32,), imgMaxSize=64, padding_constant=8,
                      segm_downsampling_rate=1)
    batches = list(ds.batches(2, seed=0))
    assert batches, "no batches formed"
    b = batches[0]
    assert b["img_data"].ndim == 4 and b["img_data"].shape[-1] == 3
    assert b["seg_label"].min() >= -1  # -1 shift applied

    vds = ValDataset(str(root), str(odgt), list_train="ADE_val",
                     imgSizes=(32,), imgMaxSize=64, padding_constant=8)
    v = vds[0]
    assert v["seg_label"].min() >= -1
    assert v["img_data"][0].ndim == 4


def test_cityscapes_cooker(tmp_path):
    gt = tmp_path / "gtFine" / "train" / "city"
    gt.mkdir(parents=True)
    meta = {
        "imgHeight": 100, "imgWidth": 200,
        "objects": [
            {"label": "car", "polygon": [[20, 20], [80, 20], [80, 60], [20, 60]]},
            {"label": "sky", "polygon": [[0, 0], [199, 0], [199, 10], [0, 10]]},
            {"label": "license plate", "polygon": [[0, 0], [5, 0], [5, 5]]},
        ],
    }
    (gt / "city_000000_gtFine_polygons.json").write_text(json.dumps(meta))
    cook = tmp_path / "cook"
    pre = PreprocessCityscapes(str(tmp_path / "gtFine" / "train"), str(cook), canvas_hw=(50, 100))
    written = pre.cook()
    assert len(written) == 2  # license plate is not a train class
    ds = DatasetCityscapes(str(cook))
    s = ds[0]
    assert s["img_data"].shape == (50, 100, 3)
    assert s["seg_label"].sum() > 0


def test_cached_dataset_and_prefetch():
    calls = []

    class DS:
        def __len__(self):
            return 3

        def __getitem__(self, i):
            calls.append(i)
            return i * 10

    ds = CachedDataset(DS())
    assert ds[1] == 10 and ds[1] == 10
    assert calls == [1]
    out = list(prefetch(iter(range(5)), size=2, transform=lambda x: x + 1))
    assert out == [1, 2, 3, 4, 5]

    def boom():
        yield 1
        raise ValueError("x")

    with pytest.raises(ValueError):
        list(prefetch(boom()))


def _write_odgt(root, rng, n=4, square=False, num_seg_vals=5):
    from PIL import Image

    recs = []
    for i in range(n):
        if square:
            w, h = 64, 64
        else:
            w, h = (48, 64) if i % 2 else (64, 48)
        img = Image.fromarray((rng.uniform(0, 255, (h, w, 3))).astype(np.uint8))
        seg = Image.fromarray(rng.integers(1, num_seg_vals, (h, w)).astype(np.uint8))
        img.save(root / f"im{i}.png")
        seg.save(root / f"seg{i}.png")
        recs.append({"fpath_img": f"im{i}.png", "fpath_segm": f"seg{i}.png",
                     "width": w, "height": h})
    odgt = root / "data.odgt"
    odgt.write_text("\n".join(json.dumps(r) for r in recs))
    return odgt


def test_odgt_repeat_sample(tmp_path, rng):
    """DATASET.repeat_sample: each record is drawn N times before advancing
    (dataset.py:313-367)."""
    odgt = _write_odgt(tmp_path, rng, n=4, square=True)
    ds = TrainDataset(str(tmp_path), str(odgt), list_train="ADE_train",
                      imgSizes=(32,), imgMaxSize=64, padding_constant=8,
                      segm_downsampling_rate=1, repeat_sample=2)
    import random as _random

    order = list(range(4))
    stream = list(ds._sample_stream(order, _random.Random(0)))
    assert stream == [0, 0, 1, 1, 2, 2, 3, 3]


def test_odgt_gt_gradient_under_repre_filter(tmp_path, rng):
    """DATASET.gt_gradient_rm_under_repre skips samples whose foreground
    fraction is below the threshold (dataset.py:322-335)."""
    from PIL import Image

    recs = []
    for i in range(3):
        img = Image.fromarray((rng.uniform(0, 255, (32, 32, 3))).astype(np.uint8))
        # sample 1 has (almost) no foreground (class-2 pixels)
        seg = np.full((32, 32), 2, np.uint8)
        if i == 1:
            seg[:] = 1
        img.save(tmp_path / f"im{i}.png")
        Image.fromarray(seg).save(tmp_path / f"seg{i}.png")
        recs.append({"fpath_img": f"im{i}.png", "fpath_segm": f"seg{i}.png",
                     "width": 32, "height": 32})
    odgt = tmp_path / "d.odgt"
    odgt.write_text("\n".join(json.dumps(r) for r in recs))
    ds = TrainDataset(str(tmp_path), str(odgt), list_train="ADE_train",
                      num_class=2, imgSizes=(32,), imgMaxSize=64,
                      padding_constant=8, segm_downsampling_rate=1,
                      gt_gradient_rm_under_repre=0.5)
    import random as _random

    stream = list(ds._sample_stream([0, 1, 2], _random.Random(0)))
    assert 1 not in stream  # under-represented sample filtered
    assert 0 in stream and 2 in stream


def test_odgt_binary_class_mapping():
    from fovealseg_tpu.data.odgt import family_label_mapping

    m = family_label_mapping("cityscapes", binary_class=24)
    assert m[24] == 2
    assert all(v == 1 for k, v in m.items() if k != 24)


def test_odgt_val_central_crop(tmp_path, rng):
    odgt = _write_odgt(tmp_path, rng, n=2, square=True)
    vds = ValDataset(str(tmp_path), str(odgt), list_train="ADE_val",
                     imgSizes=(32,), imgMaxSize=64, padding_constant=8,
                     val_central_crop=True, val_central_crop_shape=(32, 48))
    v = vds[0]
    assert v["seg_label"].shape == (1, 48, 32)  # (H, W) after (w=32, h=48) crop
    assert v["img_ori"].shape[:2] == (48, 32)


def test_dead_reference_options_warn(caplog):
    from fovealseg_tpu.configs import get_default_cfg
    from fovealseg_tpu.data.odgt import warn_dead_options

    cfg = get_default_cfg()
    cfg.DATASET.mirror_padding = True
    cfg.DATASET.multi_scale_aug = True
    import logging

    with caplog.at_level(logging.WARNING, logger="fovealseg"):
        hit = warn_dead_options(cfg)
    assert set(hit) == {"multi_scale_aug", "mirror_padding"}
    assert "dead config key" in caplog.text


def test_cityscapes_rgblabel_cook_and_runtime(tmp_path):
    """b5 rgblabel variant: color-label decode, center crop, filename
    grammar, runtime round-trip (b5_preprocess_cityscapes_rgblabel_mask.py)."""
    from PIL import Image

    from fovealseg_tpu.data.cityscapes import (
        RGBLABEL_ROWS,
        DatasetCityscapesRGBLabel,
        PreprocessCityscapesRGBLabel,
        decode_rgb_label,
    )

    xd = tmp_path / "X"; yd = tmp_path / "Y"; out = tmp_path / "cook"
    xd.mkdir(); yd.mkdir()
    h, w = 16, 32
    rgb = np.zeros((h, w, 3), np.uint8)
    rgb[:, :10] = RGBLABEL_ROWS[19][2]  # road
    rgb[:, 10:20] = RGBLABEL_ROWS[16][2]  # car
    rgb[:, 20:] = (7, 7, 7)  # unknown color -> unlabeled 0
    Image.fromarray(np.full((h, w, 3), 100, np.uint8)).save(xd / "aachen_000000_000019_leftImg8bit.png")
    Image.fromarray(rgb).save(yd / "aachen_000000_000019_gtFine_color.png")

    m = decode_rgb_label(rgb)
    assert (m[:, :10] == 19).all() and (m[:, 10:20] == 16).all() and (m[:, 20:] == 0).all()

    cooker = PreprocessCityscapesRGBLabel(str(xd), str(yd), str(out), crop_hw=(8, 16))
    names = cooker.cook()
    assert names == ["aachen-000000-000019_1x8x16.uint8.Y.npy"]

    ds = DatasetCityscapesRGBLabel(str(out))
    assert len(ds) == 1 and ds.NUM_CLASS == 20
    s = ds[0]
    assert s["img_data"].shape == (8, 16, 3) and s["img_data"].max() <= 1.0
    assert s["seg_label"].shape == (8, 16)
    assert set(np.unique(s["seg_label"])) <= {0, 16, 19}


def test_odgt_gt_gradient_filter_terminates_with_trailing_bad(tmp_path, rng):
    """Regression: an under-represented sample at the END of the shuffled
    order must not wrap the scan into an infinite stream (round-2 review);
    one epoch emits exactly len(order) draws."""
    from PIL import Image

    recs = []
    for i in range(3):
        img = Image.fromarray((rng.uniform(0, 255, (16, 16, 3))).astype(np.uint8))
        seg = np.full((16, 16), 2, np.uint8)
        if i == 2:  # LAST sample is under-represented
            seg[:] = 1
        img.save(tmp_path / f"im{i}.png")
        Image.fromarray(seg).save(tmp_path / f"seg{i}.png")
        recs.append({"fpath_img": f"im{i}.png", "fpath_segm": f"seg{i}.png",
                     "width": 16, "height": 16})
    odgt = tmp_path / "d.odgt"
    odgt.write_text("\n".join(json.dumps(r) for r in recs))
    ds = TrainDataset(str(tmp_path), str(odgt), list_train="ADE_train",
                      num_class=2, imgSizes=(16,), imgMaxSize=32,
                      padding_constant=8, segm_downsampling_rate=1,
                      gt_gradient_rm_under_repre=0.5)
    import random as _random

    stream = list(ds._sample_stream([0, 1, 2], _random.Random(0)))
    assert len(stream) == 3  # bounded
    assert 2 not in stream  # under-represented replaced by a good sample
