"""TRAIN.auto_batch == 'auto10' derivation (train_deform_semantic.py:627-635)."""

import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_auto10_derives_batch_and_epoch_iters(tmp_path):
    lst = tmp_path / "list.odgt"
    lst.write_text("{}\n" * 100)
    run = tmp_path / "run"
    code = (
        "import jax; jax.config.update('jax_platforms','cpu');"
        "import runpy, sys;"
        "sys.argv=['train.py','--cfg','fovealseg_tpu/configs/deform.yaml',"
        "'--data','synthetic',"
        f"'DIR',{str(run)!r},'TRAIN.num_epoch','0','TRAIN.auto_batch','auto10',"
        f"'DATASET.imgSizes','(512,)','DATASET.list_train',{str(lst)!r},"
        "'TRAIN.task_input_size','(16,16)','TRAIN.saliency_input_size','(16,16)',"
        "'MODEL.arch_encoder','hrnetv2_nodownsp_tiny','MODEL.gaussian_radius','5'];"
        "runpy.run_path('cli/train.py', run_name='__main__')"
    )
    proc = subprocess.run([sys.executable, "-c", code], cwd=REPO,
                          capture_output=True, text=True, timeout=600)
    assert proc.returncode == 0, proc.stderr[-2000:]
    logged = (run / "train.log").read_text()
    # 0.65e6 pixels / 512^2 -> 2 per device; 100 samples / (n_dev * 2)
    assert "batch_size_per_gpu: 2" in logged
    # 100 // (8 * 2) — the subprocess inherits the conftest's 8-virtual-device
    # XLA_FLAGS env
    assert "epoch_iters: 6" in logged
