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


def test_infer_cli_microbatched(tmp_path):
    """--microbatch M: a large request is served as chunks of M through the
    double-buffered loop (the compiled shape stays at the measured-optimal
    micro-batch; PERF.md serving sweep). Every real frame still gets a mask;
    the throughput window excludes only the first (compile) chunk."""
    out = tmp_path / "masks"
    code = (
        "import jax; jax.config.update('jax_platforms','cpu');"
        "import runpy, sys;"
        f"sys.argv=['infer.py','--cfg','fovealseg_tpu/configs/deform.yaml',"
        "'--batch','4','--microbatch','2','--canvas','64','--num-batches','3',"
        f"'--out',{str(out)!r},"
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
    # 3 batches of 4 -> 6 chunks of 2; the first chunk pays compile and is
    # excluded from the throughput window
    assert summary["microbatch"] == 2 and summary["batch"] == 4
    assert summary["frames"] == 10 and summary["fps"] > 0
    import numpy as np

    names = sorted(n for n in os.listdir(out) if n.endswith(".mask.npy"))
    assert len(names) == 12  # every real frame written, windowed or not
    m = np.load(out / names[0])
    assert m.shape == (64, 64) and m.dtype == np.uint8


def test_infer_cli_spatial_sharded(tmp_path):
    """--spatial N: single-frame latency mode — conv trunk rows sharded over
    N devices (parallel/mesh.py::make_spatial_infer_fn)."""
    out = tmp_path / "masks"
    code = (
        "import jax; jax.config.update('jax_platforms','cpu');"
        "jax.config.update('jax_num_cpu_devices', 2);"
        "jax.config.update('jax_compilation_cache_dir','/root/.cache/jax_tests');"
        "import runpy, sys;"
        f"sys.argv=['infer.py','--cfg','fovealseg_tpu/configs/deform.yaml',"
        "'--batch','1','--canvas','64','--num-batches','3','--spatial','2',"
        f"'--out',{str(out)!r},"
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
    assert summary["frames"] == 2 and summary["fps"] > 0
    import numpy as np

    names = sorted(n for n in os.listdir(out) if n.endswith(".mask.npy"))
    assert len(names) == 3
    m = np.load(out / names[0])
    assert m.shape == (64, 64) and m.dtype == np.uint8


def test_infer_cli_spatial_mesh_exclusive(tmp_path):
    code = (
        "import jax; jax.config.update('jax_platforms','cpu');"
        "jax.config.update('jax_num_cpu_devices', 2);"
        "import runpy, sys;"
        "sys.argv=['infer.py','--cfg','fovealseg_tpu/configs/deform.yaml',"
        "'--batch','2','--spatial','2','--mesh','2',"
        "'TRAIN.task_input_size','(16,16)','TRAIN.saliency_input_size','(16,16)',"
        "'MODEL.arch_encoder','hrnetv2_nodownsp_tiny','MODEL.gaussian_radius','5'];"
        "runpy.run_path('cli/infer.py', run_name='__main__')"
    )
    proc = subprocess.run(
        [sys.executable, "-c", code], cwd=REPO, capture_output=True, text=True,
        timeout=300,
    )
    assert proc.returncode != 0
    assert "exclusive" in proc.stderr
