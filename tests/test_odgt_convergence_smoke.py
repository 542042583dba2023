"""Trained weights through the legacy ODGT eval surface (verdict r3 #8).

cli/eval_odgt.py was subprocess-tested with random weights only — "compiles
and runs but never demonstrated learning". Here the tiny twin trains for a
few hundred steps on the synthetic ellipse task (normalized with the ade
family constants the ODGT ValDataset applies, data/odgt.py NORMALIZATION),
exports the reference's 4-file torch checkpoint, and the eval_odgt driver
(reference eval.py:86-369) evaluates an odgt-format rendering of the same
distribution: trained mIoU must clearly beat the random-weight mIoU on the
identical val set. Closes the loop train -> torch export -> ValDataset ->
multi-scale infer -> full-res IoU with weights that actually learned.
"""

import json
import os
import subprocess
import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
pytestmark = pytest.mark.slow

CANVAS = 64
N_STEPS = int(os.environ.get("ODGT_SMOKE_STEPS", "400"))


def _tiny_cfg():
    from fovealseg_tpu.configs import get_default_cfg

    cfg = get_default_cfg()
    cfg.DATASET.num_class = 51
    cfg.TRAIN.task_input_size = (16, 16)
    cfg.TRAIN.saliency_input_size = (16, 16)
    cfg.TRAIN.optim = "adam"
    cfg.TRAIN.deform_joint_loss = True
    cfg.MODEL.gaussian_radius = 5
    cfg.MODEL.arch_encoder = "hrnetv2_nodownsp_tiny"
    cfg.MODEL.arch_decoder = "c1"
    cfg.MODEL.fc_dim = 960
    cfg.MODEL.rev_deform_interp = "nearest"
    cfg.DATASET.segm_downsampling_rate = 1
    return cfg


def _render_odgt_valset(root, n=6, seed=99):
    """odgt-format val set from the training distribution: ellipse instances
    whose mask covers the image center (the driver's --gaze 0.5 0.5), seg
    PNGs painted c+1 / bg 51 (ade family segm_transform subtracts 1)."""
    from PIL import Image

    from fovealseg_tpu.data.synthetic import make_batch

    rng = np.random.default_rng(seed)
    os.makedirs(root, exist_ok=True)
    recs, kept = [], 0
    while kept < n:
        b = make_batch(rng, batch=8, canvas=CANVAS)
        for j in range(8):
            mask = b["seg_label"][j] > 0.5
            if not mask[CANVAS // 2, CANVAS // 2]:
                continue  # gaze (center) must land inside the instance
            img = np.clip(b["img_data"][j] * 255.0, 0, 255).astype(np.uint8)
            seg = np.where(mask, int(b["cls_label"][j]) + 1, 51).astype(np.uint8)
            Image.fromarray(img).save(os.path.join(root, f"im{kept}.png"))
            Image.fromarray(seg).save(os.path.join(root, f"seg{kept}.png"))
            recs.append({"fpath_img": f"im{kept}.png", "fpath_segm": f"seg{kept}.png",
                         "width": CANVAS, "height": CANVAS})
            kept += 1
            if kept >= n:
                break
    odgt = os.path.join(root, "val.odgt")
    with open(odgt, "w") as fh:
        fh.write("\n".join(json.dumps(r) for r in recs))
    return odgt


def _run_eval(root, odgt, ckpt_dir, out_dir):
    args = [
        sys.executable, "-c",
        "import jax; jax.config.update('jax_platforms','cpu');"
        "jax.config.update('jax_compilation_cache_dir','/root/.cache/jax_tests');"
        "import sys; sys.argv=['eval_odgt'] + sys.argv[1:];"
        "sys.path.insert(0, %r); import importlib.util;"
        "spec = importlib.util.spec_from_file_location('clievalodgt', %r);"
        "m = importlib.util.module_from_spec(spec); spec.loader.exec_module(m); m.main()"
        % (REPO, os.path.join(REPO, "cli", "eval_odgt.py")),
        "--cfg", os.path.join(REPO, "fovealseg_tpu/configs/ade20k.yaml"),
    ]
    if ckpt_dir:
        args += ["--torch-ckpt", ckpt_dir, "--torch-epoch", "last"]
    args += [
        "DATASET.num_class", "51",
        "TRAIN.task_input_size", "(16,16)", "TRAIN.saliency_input_size", "(16,16)",
        "MODEL.arch_encoder", "hrnetv2_nodownsp_tiny", "MODEL.gaussian_radius", "5",
        "MODEL.fc_dim", "960", "MODEL.arch_decoder", "c1",
        "DATASET.segm_downsampling_rate", "1",
        "DATASET.root_dataset", root,
        "DATASET.list_val", odgt,
        "DATASET.imgSizes", f"({CANVAS},)",
        "DATASET.imgMaxSize", str(CANVAS),
        "DATASET.padding_constant", "8",
        "DIR", out_dir,
    ]
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)
    out = subprocess.run(args, capture_output=True, text=True, cwd=REPO,
                         timeout=1800, env=env)
    assert out.returncode == 0, out.stderr[-3000:]
    return json.loads([l for l in out.stdout.splitlines() if l.startswith("{")][-1])


def test_trained_weights_beat_random_through_eval_odgt(tmp_path):
    from fovealseg_tpu.data.odgt import NORMALIZATION
    from fovealseg_tpu.data.synthetic import make_batch
    from fovealseg_tpu.models.deform_module import DeformConfig, DeformSegmentation
    from fovealseg_tpu.train import checkpoint as ckpt
    from fovealseg_tpu.train.optim import create_optimizer
    from fovealseg_tpu.train.step import LossConfig, init_state, make_train_step

    cfg = _tiny_cfg()
    dc = DeformConfig.from_cfg(cfg)
    module = DeformSegmentation(config=dc)
    tx = create_optimizer(cfg)
    lcfg = LossConfig.from_cfg(cfg)

    mean, std = NORMALIZATION["ade"]
    mean = np.asarray(mean, np.float32)
    std = np.asarray(std, np.float32)

    rng_np = np.random.default_rng(1)

    def norm_batch():
        # train in the SAME input space the ODGT ValDataset feeds the module
        # (ade family normalization, data/odgt.py NORMALIZATION)
        b = make_batch(rng_np, batch=8, canvas=CANVAS)
        b = dict(b)
        b["img_data"] = (b["img_data"] - mean) / std
        return {k: jnp.asarray(v) for k, v in b.items()}

    state = init_state(module, tx, jax.random.PRNGKey(0), norm_batch())
    step = jax.jit(make_train_step(module, tx, lcfg), donate_argnums=(0,))
    rng = jax.random.PRNGKey(7)
    first = last = None
    for i in range(N_STEPS):
        rng, sub = jax.random.split(rng)
        state, mets = step(state, norm_batch(), sub)
        if i == 0:
            first = float(mets["loss"])
        last = float(mets["loss"])
    assert np.isfinite(last) and last < first, (first, last)

    ckpt_dir = str(tmp_path / "torch_ckpt")
    os.makedirs(ckpt_dir)
    ckpt.save_torch_checkpoint(
        ckpt_dir, "final", jax.device_get(state.params),
        jax.device_get(state.batch_stats),
    )  # writes *_epoch_final.pth + *_epoch_last.pth

    root = str(tmp_path / "data")
    odgt = _render_odgt_valset(root)
    trained = _run_eval(root, odgt, ckpt_dir, str(tmp_path / "run_t"))
    random_w = _run_eval(root, odgt, None, str(tmp_path / "run_r"))

    assert trained["num_samples"] == 6
    # a few hundred steps will not saturate 51-way classification, but the
    # trained model must clearly beat random weights on the same val set in
    # BOTH domains the driver reports
    assert trained["mean_iou"] >= random_w["mean_iou"] + 0.05, (trained, random_w)
    assert trained["pixel_acc"] >= random_w["pixel_acc"] + 0.2, (trained, random_w)
    assert trained["mean_iou_deformed"] >= random_w["mean_iou_deformed"], (
        trained, random_w)
