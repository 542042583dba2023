"""TRAIN.auto_resume: restart from {DIR}/epoch_last without start_epoch."""

import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

TINY = (
    "'TRAIN.task_input_size','(16,16)','TRAIN.saliency_input_size','(16,16)',"
    "'MODEL.arch_encoder','hrnetv2_nodownsp_tiny','MODEL.gaussian_radius','5',"
    "'TRAIN.batch_size_per_gpu','2','TRAIN.epoch_iters','2',"
    "'TRAIN.eval_per_epoch','100',"
)


def _run(run_dir, num_epoch, extra=""):
    code = (
        "import jax; jax.config.update('jax_platforms','cpu');"
        "import runpy, sys;"
        "sys.argv=['train.py','--cfg','fovealseg_tpu/configs/deform.yaml',"
        "'--data','synthetic',"
        f"'DIR',{str(run_dir)!r},'TRAIN.num_epoch',{str(num_epoch)!r}," + TINY + extra +
        "];"
        "runpy.run_path('cli/train.py', run_name='__main__')"
    )
    return subprocess.run([sys.executable, "-c", code], cwd=REPO,
                          capture_output=True, text=True, timeout=900)


def test_auto_resume_restarts_from_epoch_last(tmp_path):
    run = tmp_path / "run"
    p1 = _run(run, "2")
    assert p1.returncode == 0, p1.stderr[-2000:]
    assert (run / "epoch_last").is_dir()
    # second invocation: same DIR, more epochs, auto_resume on
    p2 = _run(run, "3", "'TRAIN.auto_resume','True',")
    assert p2.returncode == 0, p2.stderr[-2000:]
    logged = (run / "train.log").read_text()
    assert "auto-resume: start_epoch=2" in logged
    # the resumed run trained exactly epoch 3
    assert "epoch 3 train:" in logged
    # the resume preserved pre-restart history rows instead of truncating
    # the CSVs to post-resume epochs (the reference reloads the CSV,
    # train_deform_semantic.py:415-455)
    import csv

    with open(run / "history_epoch_last_0.csv", newline="") as f:
        epochs = [float(r["epoch"]) for r in csv.DictReader(f)]
    assert min(epochs) <= 2.0, f"pre-restart rows lost: {epochs}"
    assert max(epochs) > 2.0, f"resumed rows missing: {epochs}"


def test_auto_resume_prefers_newer_numbered_epoch(tmp_path):
    """AsyncSaver's epoch_last mirror is a DEFERRED directory copy, so a
    crash between epoch_N's durable orbax write and the next drain leaves
    epoch_last one save stale while epoch_N exists — auto-resume must then
    restore the newer numbered directory, not lose the epoch (ADVICE r4)."""
    import shutil

    run = tmp_path / "run"
    p1 = _run(run, "2", "'TRAIN.checkpoint_per_epoch','1',")
    assert p1.returncode == 0, p1.stderr[-2000:]
    assert (run / "epoch_1").is_dir() and (run / "epoch_2").is_dir()
    # simulate the crash window: epoch_last lags at epoch 1
    shutil.rmtree(run / "epoch_last")
    shutil.copytree(run / "epoch_1", run / "epoch_last")
    p2 = _run(run, "3", "'TRAIN.auto_resume','True',")
    assert p2.returncode == 0, p2.stderr[-2000:]
    logged = (run / "train.log").read_text()
    assert "epoch_2 is newer than epoch_last" in logged
    assert "auto-resume: start_epoch=2" in logged
    assert "epoch 3 train:" in logged
