"""Stock backbone inventory: torch parity for MIT ResNet/ResNeXt/MobileNetV2
and the dilated feature-extractor wrappers (model_utils.py:16-186)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch

from tests.ref_oracle import load_ref_module, state_dict_numpy
from tests.test_torch_parity import _coverage, _import_into


def _forward_lists(fm, tm, x, rtol=1e-3, atol=1e-4):
    sample = (jnp.asarray(x),)
    hit, missing = _coverage(fm, sample, tm)
    missing = [k for k in missing if not k.startswith(("fc", "avgpool", "classifier", "features.18"))]
    assert not missing, missing
    variables = _import_into(fm, sample, "encoder", tm)
    ours = fm.apply(variables, jnp.asarray(x))
    with torch.no_grad():
        refs = tm(torch.from_numpy(x).permute(0, 3, 1, 2), return_feature_maps=True)
    assert len(ours) == len(refs), (len(ours), len(refs))
    for o, r in zip(ours, refs):
        rr = r.permute(0, 2, 3, 1).numpy()
        assert o.shape == rr.shape, (o.shape, rr.shape)
        np.testing.assert_allclose(np.asarray(o), rr, rtol=rtol, atol=atol)


@pytest.mark.slow
@pytest.mark.parametrize("dilate", [0, 8])
def test_resnet18_wrapper_parity(dilate):
    rn = load_ref_module("models/resnet.py", "ref_resnet")
    mu = load_ref_module("models/model_utils.py", "ref_model_utils")
    stock = rn.ResNet(rn.BasicBlock, [2, 2, 2, 2])
    tm = (mu.Resnet(stock) if dilate == 0 else mu.ResnetDilated(stock, dilate_scale=8)).eval()

    from fovealseg_tpu.models.backbones import resnet18

    fm = resnet18(dilate_scale=dilate)
    x = np.random.default_rng(0).standard_normal((1, 64, 64, 3)).astype(np.float32) * 0.3
    _forward_lists(fm, tm, x)


@pytest.mark.slow
def test_resnet50_dilated_parity():
    rn = load_ref_module("models/resnet.py", "ref_resnet")
    mu = load_ref_module("models/model_utils.py", "ref_model_utils")
    tm = mu.ResnetDilated(rn.ResNet(rn.Bottleneck, [3, 4, 6, 3]), dilate_scale=8).eval()

    from fovealseg_tpu.models.backbones import resnet50

    fm = resnet50(dilate_scale=8)
    x = np.random.default_rng(1).standard_normal((1, 64, 64, 3)).astype(np.float32) * 0.3
    _forward_lists(fm, tm, x)


@pytest.mark.slow
def test_resnext101_parity():
    rx = load_ref_module("models/resnext.py", "ref_resnext")
    mu = load_ref_module("models/model_utils.py", "ref_model_utils")
    # small-depth ResNeXt keeps the test fast; groups semantics identical
    tm = mu.Resnet(rx.ResNeXt(rx.GroupBottleneck, [1, 1, 1, 1], groups=32)).eval()

    from fovealseg_tpu.models.backbones import MITResNet

    fm = MITResNet("group", (1, 1, 1, 1), 32, 0)
    x = np.random.default_rng(2).standard_normal((1, 64, 64, 3)).astype(np.float32) * 0.3
    _forward_lists(fm, tm, x)


@pytest.mark.slow
@pytest.mark.parametrize("dilate", [8, 16])
def test_mobilenetv2_dilated_parity(dilate):
    mb = load_ref_module("models/mobilenet.py", "ref_mobilenet")
    mu = load_ref_module("models/model_utils.py", "ref_model_utils")
    tm = mu.MobileNetV2Dilated(mb.MobileNetV2(n_class=10), dilate_scale=dilate).eval()

    from fovealseg_tpu.models.backbones import MobileNetV2Dilated

    fm = MobileNetV2Dilated(dilate_scale=dilate)
    x = np.random.default_rng(3).standard_normal((1, 64, 64, 3)).astype(np.float32) * 0.3
    _forward_lists(fm, tm, x)


def test_build_backbone_registry():
    from fovealseg_tpu.models.backbones import build_backbone

    for arch in ("resnet18", "resnet50dilated", "resnet101", "resnext101", "mobilenetv2dilated"):
        m = build_backbone(arch)
        assert m is not None
    with pytest.raises(ValueError):
        build_backbone("vgg16")
