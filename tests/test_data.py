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


def _cityscapes_fixture(tmp_path):
    gt = tmp_path / "gtFine" / "train" / "city"
    gt.mkdir(parents=True)
    # raw JSON order is adversarial (annotation order, car first):
    # get_objs_ordered must sort by label priority (person < car < sky) so
    # the person ends up painted on top of the car (b3:313-323)
    meta = {
        "imgHeight": 100, "imgWidth": 200,
        "objects": [
            {"label": "car", "polygon": [[20, 20], [80, 20], [80, 60], [20, 60]]},
            {"label": "sky", "polygon": [[0, 0], [199, 0], [199, 9], [0, 9]]},
            {"label": "person", "polygon": [[40, 10], [90, 10], [90, 70], [40, 70]]},
        ],
    }
    (gt / "city_000000_gtFine_polygons.json").write_text(json.dumps(meta))
    return str(tmp_path / "gtFine" / "train")


def test_cityscapes_object_index_map_occlusion(tmp_path):
    from fovealseg_tpu.data.cityscapes import object_index_map

    pre = PreprocessCityscapes(
        _cityscapes_fixture(tmp_path), str(tmp_path / "cook"),
        canvas_hw=(100, 200), crop_hw=(50, 100))
    objs = pre.get_objs_ordered("city_000000")
    oidx, visible = object_index_map(objs, 100, 200)
    # person (obj 0) wins the overlap with car (obj 1)
    assert oidx[30, 50] == 0  # inside both polygons -> person
    assert oidx[30, 25] == 1  # car-only region
    assert oidx[5, 100] == 2  # sky strip
    assert oidx[95, 5] == 3   # background sentinel = len(objs)
    assert set(visible) == {0, 1, 2, 3}


def test_cityscapes_find_polygon_label_priority(tmp_path):
    from fovealseg_tpu.data.cityscapes import find_polygon

    pre = PreprocessCityscapes(
        _cityscapes_fixture(tmp_path), str(tmp_path / "cook"),
        canvas_hw=(100, 200), crop_hw=(50, 100))
    objs = pre.get_objs_ordered("city_000000")
    # a point inside both person and car resolves to person (priority order)
    label, poly, idx = find_polygon(objs, (50, 30))  # (x, y)
    assert label == "person" and idx == 0
    label, _, idx = find_polygon(objs, (25, 30))  # car-only region
    assert label == "car" and idx == 1
    label, _, idx = find_polygon(objs, (150, 95))  # nothing
    assert label == "" and idx == -1


def test_cityscapes_cook_grammar_and_runtime(tmp_path):
    from fovealseg_tpu.data.cityscapes import LABEL2IDX, convert_index

    cook = tmp_path / "cook"
    pre = PreprocessCityscapes(
        _cityscapes_fixture(tmp_path), str(cook),
        canvas_hw=(100, 200), crop_hw=(50, 100), seed=3)
    written = pre.cook()
    assert len(written) == 3
    # filename grammar: {label}_c{idx}_k{idx}_{itemkey}_{gy}x{gx}_1x{H}x{W}
    stem = next(s for s in written if s.startswith("person"))
    parts = stem.split("_")
    assert parts[1] == f"c{LABEL2IDX['person']}" and parts[2] == f"k{LABEL2IDX['person']}"
    assert parts[3] == "city-000000"
    ds = DatasetCityscapes(str(cook))
    assert len(ds) == 3
    s = ds[0]
    assert s["img_data"].shape == (50, 100, 3)
    assert s["seg_label"].shape == (50, 100)
    assert 0.0 <= s["focus_point"][0] < 1.0
    # the gaze pixel was chosen visible, and the crop contains it; the label
    # is the full target-polygon raster so the gaze pixel must be set
    gy = int(round(s["focus_point"][0] * 50))
    gx = int(round(s["focus_point"][1] * 100))
    assert s["seg_label"][gy, gx] == 1.0
    # class id goes through the b3 convert_index table
    kid = int(ds.names[0].split("_")[2][1:])
    assert s["cls_label"] == convert_index(kid)


def test_cityscapes_make_n_samples_round_robin(tmp_path):
    cook = tmp_path / "cook"
    pre = PreprocessCityscapes(
        _cityscapes_fixture(tmp_path), str(cook),
        canvas_hw=(100, 200), crop_hw=(50, 100), seed=1)
    # round-robin over the 19-label list; person/car/sky present here
    stems = pre.make_N_samples(19, marker="m19")
    labels = {s.split("_")[0] for s in stems}
    assert labels == {"person", "car", "sky"}
    assert len(stems) == 3  # 16 of the 19 target classes absent from the frame
    ds = DatasetCityscapes(str(cook), marker="m19")
    assert len(ds) == len(stems)


def test_cityscapes_convert_index_table():
    from fovealseg_tpu.data.cityscapes import (
        IDX2LABEL,
        LABEL2IDX,
        convert_index,
    )

    assert len(IDX2LABEL) == 41 and IDX2LABEL[-1] == "unlabeled"
    # b3:527-549 spot values: motorcycle(6)->0, rider(2)->1, sky(37)->13
    assert convert_index(LABEL2IDX["motorcycle"]) == 0
    assert convert_index(LABEL2IDX["rider"]) == 1
    assert convert_index(LABEL2IDX["sky"]) == 13
    assert convert_index(LABEL2IDX["road"]) == 18
    assert convert_index(40) == 0  # unlabeled falls back to 0


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


def test_prefetch_abandoned_consumer_stops_worker():
    """A consumer that breaks early must not leave the worker thread blocked
    on q.put forever (pinning prepared batches for the process life)."""
    import threading
    import time

    produced = []

    def gen():
        for i in range(1000):
            produced.append(i)
            yield i

    before = threading.active_count()
    it = prefetch(gen(), size=2)
    assert next(it) == 0
    it.close()  # consumer abandons (same path as `break`)
    deadline = time.time() + 5.0
    while threading.active_count() > before and time.time() < deadline:
        time.sleep(0.05)
    assert threading.active_count() <= before, "prefetch worker leaked"
    assert len(produced) < 1000  # worker stopped early, didn't drain the source


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
    # imgSizes short side 16 would normally downscale the crop; central crop
    # forces scale=1 for every pyramid level (imgMaxSize_val=1 side effect,
    # dataset.py:650,663-665) so each level is the crop at original
    # resolution, padding-rounded only
    vds = ValDataset(str(tmp_path), str(odgt), list_train="ADE_val",
                     imgSizes=(16, 32), imgMaxSize=64, padding_constant=8,
                     val_central_crop=True, val_central_crop_shape=(32, 48))
    v = vds[0]
    assert v["seg_label"].shape == (1, 48, 32)  # (H, W) after (w=32, h=48) crop
    assert v["img_ori"].shape[:2] == (48, 32)
    assert [im.shape for im in v["img_data"]] == [(1, 48, 32, 3)] * 2


def test_odgt_val_expand_prediection_rate(tmp_path, rng):
    odgt = _write_odgt(tmp_path, rng, n=1, square=True)
    base = ValDataset(str(tmp_path), str(odgt), list_train="ADE_val",
                      imgSizes=(16,), imgMaxSize=64, padding_constant=8)
    wide = ValDataset(str(tmp_path), str(odgt), list_train="ADE_val",
                      imgSizes=(16,), imgMaxSize=64, padding_constant=8,
                      expand_prediection_rate=2)
    h0, w0 = base[0]["img_data"][0].shape[1:3]
    h1, w1 = wide[0]["img_data"][0].shape[1:3]
    # the whole val pyramid scales by the rate (dataset.py:623-628)
    assert (h1, w1) == (2 * h0, 2 * w0)


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


def test_make_batch_device_contract():
    """jax-native synthetic twin honors the cooked-dataset contract: binary
    mask, gaze pixel inside the instance even after rounding to the pixel
    grid, image brightened on the instance, class ids in range."""
    import jax
    import numpy as np

    from fovealseg_tpu.data.synthetic import make_batch_device

    b = jax.device_get(jax.jit(
        lambda k: make_batch_device(k, batch=8, canvas=64, num_fg_class=7)
    )(jax.random.PRNGKey(3)))
    assert b["img_data"].shape == (8, 64, 64, 3)
    assert set(np.unique(b["seg_label"])) <= {0.0, 1.0}
    assert b["cls_label"].min() >= 0 and b["cls_label"].max() < 7
    for i in range(8):
        fy = int(round(float(b["focus_point"][i, 0]) * 64))
        fx = int(round(float(b["focus_point"][i, 1]) * 64))
        assert b["seg_label"][i, fy, fx] == 1.0, (i, fy, fx)
        inside = b["seg_label"][i] > 0.5
        assert b["img_data"][i][inside].mean() > b["img_data"][i][~inside].mean()


def test_lvis_marker_subdir(tmp_path, rng):
    """DATASET.dataset_marker_{train,valid}: cook sets live in marker
    subdirectories (b2:104; e_preprocess_scripts/dataset.py:56-60) and the
    runtime dataset selects by marker, falling back to the flat layout."""
    lvis = {
        "images": [{"id": 1, "height": 100, "width": 120}],
        "annotations": [
            {"id": 10, "image_id": 1, "category_id": CIDS_MONITORED[0],
             "segmentation": [[10, 10, 60, 10, 60, 50, 10, 50]]},
        ],
    }
    jpath = tmp_path / "lvis.json"
    jpath.write_text(json.dumps(lvis))
    cook_dir = tmp_path / "cook"
    pre = PreprocessLVIS(str(jpath), str(cook_dir), canvas=128)
    written = pre.make_n_samples(1, marker="sp1")
    assert len(written) == 1
    assert os.path.basename(os.path.dirname(written[0])) == "sp1"
    ds = DatasetLVIS(str(cook_dir), canvas=128, marker="sp1")
    assert len(ds) == 1
    # a marker with no subdirectory falls back to the flat dir (empty here)
    assert len(DatasetLVIS(str(cook_dir), canvas=128, marker="nope")) == 0


def test_odgt_augmentation_family(tmp_path, rng):
    """The full DATASET.random_flip augmentation family (dataset.py:461-561):
    every mode produces valid batches; crop modes change the pre-resize
    geometry; pixel modes perturb intensities; unknown modes raise."""
    import random as _random

    from PIL import Image

    root = tmp_path
    recs = []
    for i in range(4):
        img = Image.fromarray(rng.uniform(0, 255, (64, 64, 3)).astype(np.uint8))
        # labels 1..3 only: no record is "rare-class rich" (class 4 absent)
        seg = Image.fromarray(rng.integers(1, 4, (64, 64)).astype(np.uint8))
        img.save(root / f"im{i}.png")
        seg.save(root / f"seg{i}.png")
        recs.append({"fpath_img": f"im{i}.png", "fpath_segm": f"seg{i}.png",
                     "width": 64, "height": 64})
    odgt = root / "train.odgt"
    odgt.write_text("\n".join(json.dumps(r) for r in recs))

    def make(mode, **kw):
        return TrainDataset(str(root), str(odgt), list_train="ADE_train",
                            num_class=5, imgSizes=(32, 48), imgMaxSize=64,
                            padding_constant=8, segm_downsampling_rate=1,
                            random_flip=mode, **kw)

    for mode in ("Flip", "Flip_Pixel", "cityHRaug", "balance_sample",
                 "fullFoV_balance_sample", "Crop_Flip", "Crop_aug_16",
                 "Crop_noaug_16", "none"):
        ds = make(mode)
        b = next(iter(ds.batches(2, seed=3)))
        assert b["img_data"].ndim == 4 and b["img_data"].shape[0] == 2, mode
        assert b["seg_label"].min() >= -1 and b["seg_label"].max() <= 3, mode

    # Crop_noaug_16: the pre-resize crop is 16x16 (geometry check on _augment)
    ds = make("Crop_noaug_16")
    img, segm = ds._load_pair(ds.samples[0])
    ai, as_ = ds._augment(img, segm, 0, _random.Random(0), (32, 32))
    assert ai.size == (16, 16) and as_.size == (16, 16)

    # Flip_Pixel perturbs intensities with probability ~1 over many draws
    ds = make("Flip_Pixel")
    r = _random.Random(0)
    changed = False
    base = np.asarray(img, np.float32)
    for _ in range(8):
        ai, _s = ds._augment(img, segm, 0, r, (64, 64))
        out = np.asarray(ai, np.float32)
        if out.shape != base.shape or not np.array_equal(out, base):
            changed = True
            break
    assert changed, "Flip_Pixel never perturbed the image"

    # balance_sample: slot 3 (i+1 % 4 == 0) crops to imgSizes and the
    # accepted crop satisfies the >25% last-class rule when possible
    seg_rare = Image.fromarray(np.full((64, 64), 4, np.uint8))  # all last class
    ds = make("balance_sample")
    ai, as_ = ds._augment(img, seg_rare, 3, _random.Random(0), (32, 32))
    assert as_.size == (48, 32)  # (w, h) = (imgSizes[1], imgSizes[0])
    assert ds._rare_ok(np.asarray(as_))

    # record-selection scan: every 4th draw jumps to a rare-class record
    seg_rare.save(root / "seg2.png")  # make record 2 rare-rich
    ds = make("balance_sample")
    order = list(range(4))
    stream = list(ds._sample_stream(order, _random.Random(0)))
    assert stream[3] == 2, stream  # 4th draw redirected to the rare record

    # unknown modes warn loudly, then train unaugmented (the reference's
    # if/elif chain has no else)
    import warnings as _warnings

    with _warnings.catch_warnings(record=True) as rec:
        _warnings.simplefilter("always")
        ai, as_ = make("bogus_mode")._augment(img, segm, 0, _random.Random(0), (32, 32))
    assert any("bogus_mode" in str(w.message) for w in rec)
    assert ai.size == img.size

    # Crop_noaug_N with N bigger than either dim: whole image, uncropped
    # (reference fallback dataset.py:528-532)
    ai, as_ = make("Crop_noaug_128")._augment(img, segm, 0, _random.Random(0), (32, 32))
    assert ai.size == img.size


def test_odgt_test_dataset_patch_crops(tmp_path, rng):
    """TestDataset tiles into patch_size crops with edge clamping and a
    per-crop multi-scale pyramid (dataset.py:716-808)."""
    from PIL import Image

    from fovealseg_tpu.data.odgt import TestDataset

    img = Image.fromarray(rng.uniform(0, 255, (70, 130, 3)).astype(np.uint8))
    img.save(tmp_path / "im.png")
    odgt = tmp_path / "test.odgt"
    odgt.write_text(json.dumps({"fpath_img": "im.png", "width": 130, "height": 70}))

    # patch_size from the gleason list_train grammar
    ds = TestDataset(str(tmp_path), str(odgt),
                     list_train="gleason2019_train268_64_foo",
                     imgSizes=(32,), imgMaxSize=64, padding_constant=8,
                     segm_downsampling_rate=1)
    assert ds._patch_size() == 64
    crops, coords, ori = ds[0]
    assert ori == (130, 70)
    # x axis: 130//64=2 -> starts [0, 64, 66]; y axis: 70//64=1 -> [0, 6]
    assert coords == [[x, y] for x in (0, 64, 66) for y in (0, 6)]
    assert len(crops) == 6
    for c in crops:
        assert c["img_ori"].shape == (64, 64, 3)
        assert c["img_data"][0].ndim == 4  # [1, th, tw, 3] pyramid level
        assert c["info"] == "im.png"

    # default patch 5000 > image: single whole-image crop
    ds2 = TestDataset(str(tmp_path), str(odgt), list_train="ADE_train",
                      imgSizes=(32,), imgMaxSize=64, padding_constant=8)
    crops2, coords2, _ = ds2[0]
    assert coords2 == [[0, 0]] and crops2[0]["img_ori"].shape == (70, 130, 3)
