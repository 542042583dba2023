"""Published-checkpoint IoU runbook, fixture-tested end to end.

The real ``lvis_50cls`` checkpoint (/root/reference/README.md:60-66, a
Google Drive download) is unreachable in this environment, so this test
pins the exact surface it would arrive through, with a synthetic stand-in
whose key/filename/shape surface is the genuine article:

1. a 4-file ``.pth`` set with the published filenames
   (``{saliency,compress,encoder,decoder}_epoch_120.pth`` — the eval
   command's TRAIN.start_epoch 120, README.md:73; filename grammar from
   train_deform_semantic.py:166-208), saved from the REFERENCE'S OWN torch
   modules exec'd at the flagship config — so the state-dict keys are the
   published checkpoint's keys, not our export's;
2. cooked-format LVIS val data under the published
   ``DATASET.dataset_marker_valid='sp12000'`` marker subdirectory
   (PreprocessLVIS filename grammar, 640x640 canvas);
3. ONE ``cli/eval.py`` invocation with ``MODEL.weights_*`` pointing at the
   .pth files over that data -> the full-res IoU table emerges, with every
   reference key consumed (no import-skip warnings).

docs/MIGRATION.md "Published-checkpoint IoU runbook" documents the same
three commands against the real artifacts.
"""

import importlib.util
import logging
import os

import numpy as np
import pytest

torch = pytest.importorskip("torch")

from fovealseg_tpu.data.lvis import CIDS_MONITORED, PreprocessLVIS

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

pytestmark = pytest.mark.slow


def _save_reference_shaped_ckpt(ckpt_dir: str, epoch: int = 120) -> dict:
    """Instantiate the reference's own modules at the published flagship
    config and save their state_dicts under the published filenames."""
    from tests.ref_oracle import load_ref_module
    from tests.test_full_module_parity import _cfg, _ref_model_utils_cpu, _ref_models_module

    cfg = _cfg()
    cfg.MODEL.gaussian_radius = 45  # published eval command, README.md:73
    ref = _ref_models_module()
    sal_mod = load_ref_module("saliency_network.py", "ref_saliency")
    hr_mod = load_ref_module("models/hrnetv2_nodownsp.py", "ref_hrnet")
    mu = _ref_model_utils_cpu()

    torch.manual_seed(120)
    nets = {
        "encoder": hr_mod.hrnetv2_nodownsp(pretrained=False),
        "decoder": mu.C1(num_class=51, fc_dim=960),
        "saliency": sal_mod.fov_simple(cfg, pretrained=False),
        "compress": ref.CompressNet(cfg),
    }
    os.makedirs(ckpt_dir, exist_ok=True)
    paths = {}
    for kind, net in nets.items():
        paths[kind] = os.path.join(ckpt_dir, f"{kind}_epoch_{epoch}.pth")
        torch.save(net.state_dict(), paths[kind])
    return paths


def _cook_val_set(data_root: str, n: int = 2) -> None:
    """Cooked-format val data under the published marker subdirectory."""
    import json

    lvis = {
        "images": [{"id": 1, "height": 480, "width": 620},
                   {"id": 2, "height": 600, "width": 600}],
        "annotations": [
            {"id": 10, "image_id": 1, "category_id": CIDS_MONITORED[0],
             "segmentation": [[60, 60, 360, 60, 360, 300, 60, 300]]},
            {"id": 11, "image_id": 2, "category_id": CIDS_MONITORED[1],
             "segmentation": [[30, 30, 240, 30, 240, 240]]},
        ],
    }
    jpath = os.path.join(data_root, "lvis_val.json")
    with open(jpath, "w") as fh:
        json.dump(lvis, fh)
    out = os.path.join(data_root, "cooked", "valid", "sp12000")
    PreprocessLVIS(jpath, out, canvas=640).make_n_samples(n)


def test_published_ckpt_eval_runbook(tmp_path):
    ckpt_dir = tmp_path / "lvis_50cls"
    paths = _save_reference_shaped_ckpt(str(ckpt_dir))
    for kind, p in paths.items():
        assert os.path.basename(p) == f"{kind}_epoch_120.pth"

    _cook_val_set(str(tmp_path))
    data_dir = tmp_path / "cooked"

    spec = importlib.util.spec_from_file_location(
        "cli_eval_runbook", os.path.join(REPO, "cli", "eval.py")
    )
    m = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(m)

    # capture the torch-import skip warning channel: the published key
    # surface must map totally onto our model (strict parity)
    records = []
    handler = logging.Handler()
    handler.emit = records.append
    ck_log = logging.getLogger("fovealseg_tpu.train.checkpoint")
    ck_log.addHandler(handler)
    try:
        result = m.main([
            "--cfg", os.path.join(REPO, "fovealseg_tpu/configs/deform.yaml"),
            "--data", str(data_dir), "--num-batches", "2",
            "TRAIN.task_input_size", "(80,80)",
            "TRAIN.saliency_input_size", "(80,80)",
            "MODEL.gaussian_radius", "45",
            "DATASET.dataset_marker_valid", "sp12000",
            "MODEL.weights_encoder", paths["encoder"],
            "MODEL.weights_decoder", paths["decoder"],
            "MODEL.weights_net_saliency", paths["saliency"],
            "MODEL.weights_net_compress", paths["compress"],
            "VAL.batch_size", "1",
            "TPU.compute_dtype", "float32",
            "DIR", str(tmp_path / "run"),
        ])
    finally:
        ck_log.removeHandler(handler)

    skips = [r for r in records if "skipped" in r.getMessage()]
    assert not skips, [r.getMessage() for r in skips]

    # the IoU table emerges: mean over present classes + per-class rows
    assert result["num_batches"] == 2
    assert 0.0 <= result["mean_iou"] <= 1.0 and np.isfinite(result["mean_iou"])
    assert 0.0 <= result["pixel_acc"] <= 1.0
    assert result["per_class_iou"], "per-class IoU table is empty"
    # background (class 50) is present in every sample
    assert 50 in result["per_class_iou"]
