"""Serving CLI end-to-end smoke (subprocess, CPU, tiny encoder)."""

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_infer_cli_writes_masks_and_throughput(tmp_path):
    out = tmp_path / "masks"
    code = (
        "import jax; jax.config.update('jax_platforms','cpu');"
        "import runpy, sys;"
        f"sys.argv=['infer.py','--cfg','fovealseg_tpu/configs/deform.yaml',"
        "'--batch','2','--canvas','64','--num-batches','3',"
        f"'--out',{str(out)!r},'--png',"
        "'TRAIN.task_input_size','(16,16)','TRAIN.saliency_input_size','(16,16)',"
        "'MODEL.arch_encoder','hrnetv2_nodownsp_tiny','MODEL.gaussian_radius','5'];"
        "runpy.run_path('cli/infer.py', run_name='__main__')"
    )
    proc = subprocess.run(
        [sys.executable, "-c", code], cwd=REPO, capture_output=True, text=True,
        timeout=900,
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    summary = json.loads(proc.stdout.strip().splitlines()[-1])
    assert summary["frames"] == 4  # 3 batches of 2, first excluded from window
    assert summary["fps"] > 0
    names = sorted(os.listdir(out))
    assert any(n.endswith(".mask.npy") for n in names)
    assert any(n.endswith(".mask.png") for n in names)
    # masks are full-res class-id maps on the canvas
    import numpy as np

    m = np.load(out / [n for n in names if n.endswith(".npy")][0])
    assert m.shape == (64, 64) and m.dtype == np.uint8
