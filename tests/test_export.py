"""StableHLO export artifact: serialize -> deserialize -> call round-trip."""

import importlib.util
import os

import jax.numpy as jnp
import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_export_roundtrip_matches_live_module(tmp_path, rng):
    spec = importlib.util.spec_from_file_location(
        "cli_export", os.path.join(REPO, "cli", "export.py")
    )
    m = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(m)
    out = tmp_path / "model.stablehlo"
    m.main([
        "--cfg", os.path.join(REPO, "fovealseg_tpu/configs/deform.yaml"),
        "--out", str(out), "--batch", "2", "--canvas", "48", "--allow-random",
        "TRAIN.task_input_size", "(12,12)",
        "TRAIN.saliency_input_size", "(12,12)",
        "MODEL.arch_encoder", "hrnetv2_nodownsp_tiny",
        "MODEL.gaussian_radius", "5", "TPU.compute_dtype", "float32",
    ])
    assert out.stat().st_size > 1_000_000  # weights are embedded

    from jax import export

    fn = export.deserialize(out.read_bytes()).call
    x = jnp.asarray(rng.uniform(0, 1, (2, 48, 48, 3)), jnp.float32)
    f = jnp.asarray([[0.5, 0.5], [0.3, 0.7]], jnp.float32)
    masks = np.asarray(fn(x, f))
    assert masks.shape == (2, 48, 48) and masks.dtype == np.int32

    # the artifact must reproduce the live module exactly (same init seed)
    import jax

    from fovealseg_tpu.configs import get_default_cfg
    from fovealseg_tpu.models.deform_module import DeformConfig, DeformSegmentation

    cfg = get_default_cfg()
    cfg.merge_from_file(os.path.join(REPO, "fovealseg_tpu/configs/deform.yaml"))
    cfg.merge_from_list([
        "TRAIN.task_input_size", "(12,12)",
        "TRAIN.saliency_input_size", "(12,12)",
        "MODEL.arch_encoder", "hrnetv2_nodownsp_tiny",
        "MODEL.gaussian_radius", "5", "TPU.compute_dtype", "float32",
    ])
    module = DeformSegmentation(config=DeformConfig.from_cfg(cfg))
    variables = module.init(
        {"params": jax.random.PRNGKey(cfg.TRAIN.seed)},
        jnp.zeros((2, 48, 48, 3)), jnp.full((2, 2), 0.5),
    )
    live = module.apply(
        variables, x, f, argmax_labels=True, method=DeformSegmentation.infer
    )["pred_label"]
    np.testing.assert_array_equal(masks, np.asarray(live))


def test_export_torch_format_loads_back(tmp_path):
    # --format torch writes the reference 4-file surface; the import shim
    # reads it back (CLI-level round trip of the migration-back path)
    spec = importlib.util.spec_from_file_location(
        "cli_export_torch", os.path.join(REPO, "cli", "export.py")
    )
    m = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(m)
    tiny_opts = [
        "TRAIN.task_input_size", "(12,12)",
        "TRAIN.saliency_input_size", "(12,12)",
        "MODEL.arch_encoder", "hrnetv2_nodownsp_tiny",
        "MODEL.gaussian_radius", "5", "TPU.compute_dtype", "float32",
    ]
    out = tmp_path / "torch_ckpt"
    base = [
        "--cfg", os.path.join(REPO, "fovealseg_tpu/configs/deform.yaml"),
        "--out", str(out), "--format", "torch", "--batch", "1", "--canvas", "48",
    ]

    # without a weight source, exporting random init is refused (ADVICE r2)
    import pytest

    with pytest.raises(SystemExit):
        m.main(base + tiny_opts)
    assert not out.exists()

    m.main(base + ["--allow-random"] + tiny_opts)
    files = sorted(os.listdir(out))
    # random-init export has no real epoch: tag is 'last' and each kind is
    # written exactly once (no double epoch_last + _last mirror)
    assert files == sorted(
        f"{kind}_epoch_last.pth"
        for kind in ("encoder", "decoder", "saliency", "compress")
    ), files
    import torch

    sd = torch.load(out / "encoder_epoch_last.pth", map_location="cpu",
                    weights_only=True)
    assert any(k.endswith(".weight") for k in sd)

    # --torch-ckpt re-export: the tag must come from --torch-epoch, with
    # _last mirrors (the numbered tag is the source of truth)
    out2 = tmp_path / "torch_ckpt2"
    m.main([
        "--cfg", os.path.join(REPO, "fovealseg_tpu/configs/deform.yaml"),
        "--out", str(out2), "--format", "torch", "--batch", "1",
        "--canvas", "48", "--torch-ckpt", str(out), "--torch-epoch", "last",
    ] + tiny_opts)
    files2 = sorted(os.listdir(out2))
    assert files2 == files, files2  # tag 'last', single write per kind

    out3 = tmp_path / "torch_ckpt3"
    for kind in ("encoder", "decoder", "saliency", "compress"):
        os.rename(out / f"{kind}_epoch_last.pth", out / f"{kind}_epoch_7.pth")
    m.main([
        "--cfg", os.path.join(REPO, "fovealseg_tpu/configs/deform.yaml"),
        "--out", str(out3), "--format", "torch", "--batch", "1",
        "--canvas", "48", "--torch-ckpt", str(out), "--torch-epoch", "7",
    ] + tiny_opts)
    files3 = sorted(os.listdir(out3))
    assert f"encoder_epoch_7.pth" in files3 and "encoder_epoch_last.pth" in files3
    assert len(files3) == 8, files3
