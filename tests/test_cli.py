"""CLI end-to-end smoke (subprocess, CPU, tiny encoder + synthetic data)."""

import json
import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

TINY_OPTS = [
    "TRAIN.task_input_size", "(16,16)",
    "TRAIN.saliency_input_size", "(16,16)",
    "MODEL.gaussian_radius", "5",
    "MODEL.arch_encoder", "hrnetv2_nodownsp_tiny",
    "TRAIN.deform_joint_loss", "True",
    "TRAIN.batch_size_per_gpu", "2",
]


def _env():
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"  # may be preempted; cli must still work
    env["XLA_FLAGS"] = env.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=2"
    return env


@pytest.mark.slow
def test_cli_train_smoke(tmp_path):
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
         *TINY_OPTS,
         "TRAIN.num_epoch", "1", "TRAIN.epoch_iters", "2",
         "TPU.torch_ckpt_mirror", "True",
         "DIR", str(tmp_path / "run")],
        capture_output=True, text=True, env=_env(), cwd=REPO, timeout=1200,
    )
    assert out.returncode == 0, out.stderr[-3000:]
    assert (tmp_path / "run" / "eval_history.csv").exists()
    assert (tmp_path / "run" / "epoch_last").exists()
    # TPU.torch_ckpt_mirror: reference-format .pth set beside the orbax dirs
    for kind in ("encoder", "decoder", "saliency", "compress"):
        assert (tmp_path / "run" / f"{kind}_epoch_last.pth").exists()


@pytest.mark.slow
def test_cli_eval_smoke(tmp_path):
    out = subprocess.run(
        [sys.executable, "-c",
         "import jax; jax.config.update('jax_platforms','cpu');"
         "jax.config.update('jax_compilation_cache_dir','/root/.cache/jax_tests');"
         "import sys; sys.argv=['eval'] + sys.argv[1:];"
         "sys.path.insert(0, %r); import importlib.util;"
         "spec = importlib.util.spec_from_file_location('clieval', %r);"
         "m = importlib.util.module_from_spec(spec); spec.loader.exec_module(m); m.main()"
         % (REPO, os.path.join(REPO, "cli", "eval.py")),
         "--cfg", os.path.join(REPO, "fovealseg_tpu/configs/deform.yaml"),
         # small canvas: a fresh 640^2 inverse-warp CPU compile can exceed
         # the subprocess timeout on this 1-CPU image; the full-res graph
         # is exercised on the TPU by bench.py and the driver artifacts
         "--num-batches", "2", "--canvas", "64",
         *TINY_OPTS, "VAL.batch_size", "2"],
        capture_output=True, text=True, env=_env(), cwd=REPO, timeout=1200,
    )
    assert out.returncode == 0, out.stderr[-3000:]
    line = [l for l in out.stdout.splitlines() if l.startswith("{")][-1]
    res = json.loads(line)
    assert "mean_iou" in res and 0.0 <= res["mean_iou"] <= 1.0

@pytest.mark.slow
def test_cli_train_visuals_and_profile(tmp_path):
    """TRAIN.train_eval_visualise emits the reference dump set on the
    epoch%10==1 cadence (models/models.py:973-1039) and TPU.profile_dir
    captures a jax.profiler trace (SURVEY.md section 5)."""
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
         *TINY_OPTS,
         "TRAIN.num_epoch", "1", "TRAIN.epoch_iters", "2",
         "TRAIN.train_eval_visualise", "True",
         "TPU.profile_dir", str(tmp_path / "trace"),
         "DIR", str(tmp_path / "run")],
        capture_output=True, text=True, env=_env(), cwd=REPO, timeout=1200,
    )
    assert out.returncode == 0, out.stderr[-3000:]
    vis = tmp_path / "run" / "train_visual_epoch1"
    assert vis.is_dir(), "train visual dir missing"
    names = {p.name for p in vis.iterdir()}
    for kind in ("pred", "gt", "gt_hr", "grid", "sm", "reddot"):
        assert f"iter0_batch0_{kind}.png" in names, f"missing {kind} dump: {names}"
    trace = tmp_path / "trace"
    assert trace.is_dir() and any(trace.rglob("*")), "profiler trace missing"


@pytest.mark.slow
def test_cli_eval_visualize(tmp_path):
    """VAL.visualize emits the eval TB image set + valid_visual PNG dumps
    (models_instance.py:952-1105)."""
    out = subprocess.run(
        [sys.executable, "-c",
         "import jax; jax.config.update('jax_platforms','cpu');"
         "jax.config.update('jax_compilation_cache_dir','/root/.cache/jax_tests');"
         "import sys; sys.argv=['eval'] + sys.argv[1:];"
         "sys.path.insert(0, %r); import importlib.util;"
         "spec = importlib.util.spec_from_file_location('clieval', %r);"
         "m = importlib.util.module_from_spec(spec); spec.loader.exec_module(m); m.main()"
         % (REPO, os.path.join(REPO, "cli", "eval.py")),
         "--cfg", os.path.join(REPO, "fovealseg_tpu/configs/deform.yaml"),
         "--num-batches", "2", "--canvas", "64",
         *TINY_OPTS, "VAL.batch_size", "2",
         "VAL.visualize", "True",
         "DIR", str(tmp_path / "run")],
        capture_output=True, text=True, env=_env(), cwd=REPO, timeout=1200,
    )
    assert out.returncode == 0, out.stderr[-3000:]
    vis = tmp_path / "run" / "valid_visual_epoch0"
    assert vis.is_dir(), "valid visual dir missing"
    names = {p.name for p in vis.iterdir()}
    assert "iter0_batch0_pred.png" in names, names
    tb = tmp_path / "run" / "tensorboard"
    assert tb.is_dir() and any(tb.iterdir())
    # side-by-side (img | gt | pred) visualize_result dumps (eval.py:70-83)
    result_dir = tmp_path / "run" / "result"
    pngs = sorted(result_dir.glob("*.png"))
    assert len(pngs) == 2, list(result_dir.iterdir()) if result_dir.is_dir() else "missing"
    from PIL import Image as PILImage
    w, h = PILImage.open(pngs[0]).size
    assert (w, h) == (64 * 3, 64), "tensorboard events missing"


@pytest.mark.slow
def test_cli_eval_odgt_multiscale(tmp_path):
    """The legacy multi-scale ODGT eval driver (reference eval.py:86-369):
    ValDataset img_list consumed, scores averaged across scales before the
    full-res IoU, deformed-domain metrics and the y_sampled_reverse probe."""
    import numpy as np
    from PIL import Image

    rng = np.random.default_rng(0)
    root = tmp_path / "data"
    root.mkdir()
    recs = []
    for i in range(2):
        img = Image.fromarray(rng.uniform(0, 255, (64, 64, 3)).astype(np.uint8))
        seg = Image.fromarray(rng.integers(1, 5, (64, 64)).astype(np.uint8))
        img.save(root / f"im{i}.png")
        seg.save(root / f"seg{i}.png")
        recs.append({"fpath_img": f"im{i}.png", "fpath_segm": f"seg{i}.png",
                     "width": 64, "height": 64})
    odgt = root / "val.odgt"
    odgt.write_text("\n".join(json.dumps(r) for r in recs))

    out = subprocess.run(
        [sys.executable, "-c",
         "import jax; jax.config.update('jax_platforms','cpu');"
         "jax.config.update('jax_compilation_cache_dir','/root/.cache/jax_tests');"
         "import sys; sys.argv=['eval_odgt'] + sys.argv[1:];"
         "sys.path.insert(0, %r); import importlib.util;"
         "spec = importlib.util.spec_from_file_location('clievalodgt', %r);"
         "m = importlib.util.module_from_spec(spec); spec.loader.exec_module(m); m.main()"
         % (REPO, os.path.join(REPO, "cli", "eval_odgt.py")),
         "--cfg", os.path.join(REPO, "fovealseg_tpu/configs/ade20k.yaml"),
         *TINY_OPTS,
         "DATASET.root_dataset", str(root),
         "DATASET.list_val", str(odgt),
         "DATASET.num_class", "4",
         "DATASET.imgSizes", "(32, 48)",
         "DATASET.imgMaxSize", "64",
         "DATASET.padding_constant", "8",
         "VAL.y_sampled_reverse", "True",
         "VAL.visualize", "True",
         "DIR", str(tmp_path / "run")],
        capture_output=True, text=True, env=_env(), cwd=REPO, timeout=1200,
    )
    assert out.returncode == 0, out.stderr[-3000:]
    line = [l for l in out.stdout.splitlines() if l.startswith("{")][-1]
    res = json.loads(line)
    assert res["num_samples"] == 2
    assert res["scales"] == [32, 48]
    assert 0.0 <= res["mean_iou"] <= 1.0
    assert 0.0 <= res["mean_iou_deformed"] <= 1.0
    # per-class label-distribution scalars (reference eval.py:326-331) were
    # emitted into the TB dir (event file or jsonl fallback)
    tb = tmp_path / "run" / "tensorboard"
    assert tb.is_dir() and any(tb.iterdir())
    # side-by-side (img | gt | pred) visualize_result dumps (eval.py:70-83)
    result_dir = tmp_path / "run" / "result"
    pngs = sorted(result_dir.glob("*.png"))
    assert len(pngs) == 2, list(result_dir.iterdir()) if result_dir.is_dir() else "missing"
    from PIL import Image as PILImage
    w, h = PILImage.open(pngs[0]).size
    assert (w, h) == (64 * 3, 64)
    assert "y_reverse_iou" in res


@pytest.mark.slow
def test_cli_train_2d_mesh(tmp_path):
    """TPU.mesh_shape '(4, 2)' selects the 2-D GSPMD mesh (tensor-parallel
    wide weights + data-parallel batch) end-to-end through the training CLI."""
    out = subprocess.run(
        [sys.executable, "-c",
         "import jax; jax.config.update('jax_platforms','cpu');"
         "jax.config.update('jax_num_cpu_devices', 8);"
         "jax.config.update('jax_compilation_cache_dir','/root/.cache/jax_tests');"
         "import sys; sys.argv=['train'] + sys.argv[1:];"
         "sys.path.insert(0, %r); import importlib.util;"
         "spec = importlib.util.spec_from_file_location('clitrain', %r);"
         "m = importlib.util.module_from_spec(spec); spec.loader.exec_module(m); m.main()"
         % (REPO, os.path.join(REPO, "cli", "train.py")),
         "--cfg", os.path.join(REPO, "fovealseg_tpu/configs/deform.yaml"),
         *TINY_OPTS,
         "TRAIN.num_epoch", "1", "TRAIN.epoch_iters", "2",
         "TPU.mesh_shape", "(4, 2)",
         "DIR", str(tmp_path / "run")],
        capture_output=True, text=True, env=_env(), cwd=REPO, timeout=1200,
    )
    assert out.returncode == 0, out.stderr[-3000:]
    assert "2-D mesh: dp=4 x mp=2" in (out.stdout + out.stderr)
    assert (tmp_path / "run" / "eval_history.csv").exists()
    assert (tmp_path / "run" / "epoch_last").exists()


@pytest.mark.slow
def test_cli_eval_trimap_family(tmp_path):
    """VAL.dice / VAL.trimap per-width bands + trimap_last_count CSV +
    trimap_visual_check npy dumps (reference eval.py:50-66, 295-310)."""
    out = subprocess.run(
        [sys.executable, "-c",
         "import jax; jax.config.update('jax_platforms','cpu');"
         "jax.config.update('jax_compilation_cache_dir','/root/.cache/jax_tests');"
         "import sys; sys.argv=['eval'] + sys.argv[1:];"
         "sys.path.insert(0, %r); import importlib.util;"
         "spec = importlib.util.spec_from_file_location('clieval', %r);"
         "m = importlib.util.module_from_spec(spec); spec.loader.exec_module(m); m.main()"
         % (REPO, os.path.join(REPO, "cli", "eval.py")),
         "--cfg", os.path.join(REPO, "fovealseg_tpu/configs/deform.yaml"),
         "--num-batches", "1", "--canvas", "64",
         *TINY_OPTS, "VAL.batch_size", "2",
         "VAL.dice", "True",
         "VAL.trimap", "True",
         "VAL.trimap_dia_factor", "2",
         "VAL.trimap_visual_check", "True",
         "DIR", str(tmp_path / "run")],
        capture_output=True, text=True, env=_env(), cwd=REPO, timeout=1200,
    )
    assert out.returncode == 0, out.stderr[-3000:]
    res = json.loads(out.stdout.strip().splitlines()[-1])
    # per-width band accuracies for widths 1, 2, 4 (2^i, i<=dia_factor)
    assert set(res["trimap_acc"].keys()) == {"1", "2", "4"}
    assert all(0.0 <= v <= 1.0 for v in res["trimap_acc"].values())
    assert 0.0 <= res["dice"] <= 1.0
    run = tmp_path / "run"
    csvs = list(run.glob("trimap_last_count_*.csv"))
    assert len(csvs) == 1, list(run.iterdir())
    assert "trim_width" in csvs[0].read_text()
    tvc = run / "trimap_visual_check"
    names = {p.name for p in tvc.iterdir()}
    for w in (1, 2, 4):
        assert f"seg_label_Edges_dil_{w}.npy" in names, names
        assert f"masked_pred_dil_{w}.npy" in names


@pytest.mark.slow
def test_cli_eval_odgt_no_deform(tmp_path):
    """--no-deform drives a plain SegmentationModule through the multi-scale
    eval (the reference eval.py:main non-foveated path, eval.py:509-544):
    per-scale softmax probs averaged, full-res metrics only."""
    import numpy as np
    from PIL import Image

    rng = np.random.default_rng(1)
    root = tmp_path / "data"
    root.mkdir()
    img = Image.fromarray(rng.uniform(0, 255, (64, 64, 3)).astype(np.uint8))
    seg = Image.fromarray(rng.integers(1, 5, (64, 64)).astype(np.uint8))
    img.save(root / "im0.png")
    seg.save(root / "seg0.png")
    odgt = root / "val.odgt"
    odgt.write_text(json.dumps({"fpath_img": "im0.png", "fpath_segm": "seg0.png",
                                "width": 64, "height": 64}))

    out = subprocess.run(
        [sys.executable, "-c",
         "import jax; jax.config.update('jax_platforms','cpu');"
         "jax.config.update('jax_compilation_cache_dir','/root/.cache/jax_tests');"
         "import sys; sys.argv=['eval_odgt'] + sys.argv[1:];"
         "sys.path.insert(0, %r); import importlib.util;"
         "spec = importlib.util.spec_from_file_location('clievalodgtnd', %r);"
         "m = importlib.util.module_from_spec(spec); spec.loader.exec_module(m); m.main()"
         % (REPO, os.path.join(REPO, "cli", "eval_odgt.py")),
         "--cfg", os.path.join(REPO, "fovealseg_tpu/configs/ade20k.yaml"),
         "--no-deform",
         *TINY_OPTS,
         "DATASET.root_dataset", str(root),
         "DATASET.list_val", str(odgt),
         "DATASET.num_class", "4",
         "DATASET.imgSizes", "(32, 48)",
         "DATASET.imgMaxSize", "64",
         "DATASET.padding_constant", "8",
         "DIR", str(tmp_path / "run")],
        capture_output=True, text=True, env=_env(), cwd=REPO, timeout=1200,
    )
    assert out.returncode == 0, out.stderr[-3000:]
    line = [l for l in out.stdout.splitlines() if l.startswith("{")][-1]
    res = json.loads(line)
    assert res["num_samples"] == 1 and res["scales"] == [32, 48]
    assert 0.0 <= res["mean_iou"] <= 1.0
    assert "mean_iou_deformed" not in res  # warped domain n/a without foveation
    # no weights were supplied: the driver must say so loudly (the reference
    # asserts trained weights exist, eval.py:584-589)
    assert "RANDOMLY INITIALIZED" in out.stderr
