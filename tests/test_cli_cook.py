"""cli/cook.py — the data-cooking entry point (reference README "Prepare
data" step 3: b2_preprocess_lvis.py --task preprocess). Pure host-side
numpy/PIL, so these run main() in-process."""

import importlib.util
import json
import os

import numpy as np

from fovealseg_tpu.data.cityscapes import DatasetCityscapes
from fovealseg_tpu.data.lvis import CIDS_MONITORED, DatasetLVIS
from test_data import _cityscapes_fixture

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _cook_main(argv):
    spec = importlib.util.spec_from_file_location(
        "clicook", os.path.join(REPO, "cli", "cook.py"))
    m = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(m)
    return m.main(argv)


def _tiny_lvis_json(tmp_path):
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
    return str(jpath)


def test_cook_lvis_partitions_and_markers(tmp_path):
    """Reference rule: --sample-num N cooks train marker spN and valid
    marker sp{N//5} with N//5 samples (b2 __main__ sp_valid = sp_train//5),
    under <out>/<partition>/<marker> — loadable by DatasetLVIS(marker=...)."""
    jpath = _tiny_lvis_json(tmp_path)
    out = tmp_path / "cook"
    rc = _cook_main([
        "lvis", "--train-json", jpath, "--valid-json", jpath,
        "--out", str(out), "--sample-num", "5", "--canvas", "128",
    ])
    assert rc == 0
    train = DatasetLVIS(str(out / "train"), canvas=128, marker="sp5")
    valid = DatasetLVIS(str(out / "valid"), canvas=128, marker="sp1")
    assert len(train) == 5 and len(valid) == 1
    s = train[0]
    assert s["img_data"].shape == (128, 128, 3)
    assert s["seg_label"].shape == (128, 128)


def test_cook_lvis_missing_json_rejected(tmp_path):
    import pytest

    with pytest.raises(SystemExit):
        _cook_main(["lvis", "--out", str(tmp_path), "--sample-num", "5",
                    "--dataset-partition", "train"])


def test_cook_cityscapes(tmp_path):
    gtfine = _cityscapes_fixture(tmp_path)
    out = tmp_path / "cook"
    rc = _cook_main([
        "cityscapes", "--gtfine", gtfine, "--out", str(out),
        "--n", "19", "--marker", "m19",
        "--canvas", "(100,200)", "--crop", "(50,100)", "--seed", "1",
    ])
    assert rc == 0
    ds = DatasetCityscapes(str(out), marker="m19")
    assert len(ds) == 3  # person/car/sky present in the fixture frame
    assert ds[0]["img_data"].shape == (50, 100, 3)


def test_cook_cityscapes_rgb(tmp_path):
    from PIL import Image

    from fovealseg_tpu.data.cityscapes import RGBLABEL_ROWS, DatasetCityscapesRGBLabel

    xd, yd, out = tmp_path / "x", tmp_path / "y", tmp_path / "cook"
    xd.mkdir(), yd.mkdir()
    _, cid, color = RGBLABEL_ROWS[1]  # motorcycle, a real class color (b5 table)
    frame = np.random.default_rng(0).integers(0, 255, (8, 12, 3), np.uint8)
    label = np.zeros((8, 12, 3), np.uint8)
    label[2:6, 3:9] = color
    Image.fromarray(frame).save(xd / "city_000000_000019_leftImg8bit.png")
    Image.fromarray(label).save(yd / "city_000000_000019_gtFine_color.png")
    rc = _cook_main([
        "cityscapes-rgb", "--x-dir", str(xd), "--y-dir", str(yd),
        "--out", str(out), "--crop", "(8,12)",
    ])
    assert rc == 0
    ds = DatasetCityscapesRGBLabel(str(out))
    assert len(ds) == 1
    s = ds[0]
    assert s["seg_label"][4, 5] == cid and s["seg_label"][0, 0] == 0
    assert s["img_data"].shape == (8, 12, 3)


def test_cook_cityscapes_then_train(tmp_path):
    """cook -> train round trip for the cityscapes family: cli/train.py
    --dataset cityscapes consumes the b3 cook layout (<root>/<partition>/
    <marker>). The reference's PreprocessDataset supports both lvis and
    cityscapes cooked data (DynamicFocus/e_preprocess_scripts/dataset.py:45)
    even though its shipped driver hardcodes 'lvis'
    (train_deform_semantic.py:461)."""
    import subprocess
    import sys

    gtfine = _cityscapes_fixture(tmp_path)
    root = tmp_path / "cook"
    for part in ("train", "valid"):
        rc = _cook_main([
            "cityscapes", "--gtfine", gtfine, "--out", str(root / part),
            "--n", "19", "--marker", "m4",
            "--canvas", "(100,200)", "--crop", "(32,64)", "--seed", "1",
        ])
        assert rc == 0

    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    # conftest exports --xla_force_host_platform_device_count=8; the cooked
    # fixture has only 3 samples, so run the subprocess single-device
    env["XLA_FLAGS"] = ""
    out = subprocess.run(
        [sys.executable, "-c",
         "import jax; jax.config.update('jax_platforms','cpu');"
         "jax.config.update('jax_compilation_cache_dir','/root/.cache/jax_tests');"
         "import sys; sys.argv=['train'] + sys.argv[1:];"
         "sys.path.insert(0, %r); import importlib.util;"
         "spec = importlib.util.spec_from_file_location('clitrain', %r);"
         "m = importlib.util.module_from_spec(spec); spec.loader.exec_module(m); m.main()"
         % (REPO, os.path.join(REPO, "cli", "train.py")),
         "--cfg", os.path.join(REPO, "fovealseg_tpu/configs/deform.yaml"),
         "--data", str(root), "--dataset", "cityscapes",
         "TRAIN.task_input_size", "(16,16)",
         "TRAIN.saliency_input_size", "(16,16)",
         "MODEL.gaussian_radius", "5",
         "MODEL.arch_encoder", "hrnetv2_nodownsp_tiny",
         "TRAIN.deform_joint_loss", "True",
         "TRAIN.batch_size_per_gpu", "2",
         "DATASET.num_class", "21",
         "DATASET.dataset_marker_train", "m4",
         "DATASET.dataset_marker_valid", "m4",
         "TRAIN.num_epoch", "1",
         "DIR", str(tmp_path / "run")],
        capture_output=True, text=True, env=env, cwd=REPO, timeout=1200,
    )
    assert out.returncode == 0, out.stderr[-3000:]
    assert (tmp_path / "run" / "epoch_last").exists()
    # epoch_iters reconciled to the cooked set: 3 samples / batch 2 = 1
    assert "1 batches/epoch" in out.stderr or (tmp_path / "run" / "eval_history.csv").exists()
