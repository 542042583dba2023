"""Checkpoint-import parity vs the reference PyTorch modules.

These tests exec the reference model files (read-only) to get (a) the exact
state_dict key sets — asserting our flax param trees cover them 1:1 through
the import shim — and (b) numerical forward parity after importing random
torch weights into our flax modules (validates conv padding/layout, BN eval
semantics, and the key mapping end-to-end, which is what LVIS-ckpt IoU parity
rests on).
"""

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from fovealseg_tpu.train.checkpoint import import_torch_state_dict
from tests.ref_oracle import load_ref_module, state_dict_numpy


def _import_into(flax_module, sample, kind, torch_module, method=None):
    """Init flax module, import torch weights, return (variables, outputs fn)."""
    variables = flax_module.init(jax.random.PRNGKey(0), *sample)
    params = variables["params"]
    stats = variables.get("batch_stats", {})
    sd = {kind: state_dict_numpy(torch_module)}
    # unwrap: import expects the DeformSegmentation-level subtree names
    wrapped_p = {_TOP[kind]: params}
    wrapped_s = {_TOP[kind]: stats}
    new_p, new_s = import_torch_state_dict(sd, wrapped_p, wrapped_s)
    return {"params": new_p[_TOP[kind]], "batch_stats": new_s.get(_TOP[kind], {})}


_TOP = {
    "encoder": "encoder",
    "decoder": "decoder",
    "saliency": "localization",
    "compress": "net_compress",
}


def _flat_paths(tree, prefix=()):
    out = []
    if isinstance(tree, dict):
        for k, v in tree.items():
            out += _flat_paths(v, prefix + (k,))
    else:
        out.append(prefix)
    return out


def _coverage(flax_module, sample, torch_module):
    """Fraction of torch keys that land in the flax tree + reverse misses."""
    variables = flax_module.init(jax.random.PRNGKey(0), *sample)
    params = variables["params"]
    stats = variables.get("batch_stats", {})
    pin = {(".".join(p[:-1]), p[-1]) for p in _flat_paths(params)}
    sin = {(".".join(p[:-1]), p[-1]) for p in _flat_paths(stats)}
    missing = []
    hit = 0
    for k, arr in state_dict_numpy(torch_module).items():
        mod = ".".join(k.split(".")[:-1])
        leaf = k.split(".")[-1]
        if leaf == "weight":
            want = ("kernel" if arr.ndim in (2, 4) else "scale")
            ok = (mod, want) in pin
        elif leaf == "bias":
            ok = (mod, "bias") in pin
        elif leaf == "running_mean":
            ok = (mod, "mean") in sin
        elif leaf == "running_var":
            ok = (mod, "var") in sin
        else:
            continue
        hit += ok
        if not ok:
            missing.append(k)
    return hit, missing


def test_fovsim_key_coverage_and_forward():
    sal = load_ref_module("saliency_network.py", "ref_saliency")
    tm = sal.FovSimModule(cfg=None, in_channels=5, out_channels=24).eval()
    from fovealseg_tpu.models.saliency import FovSimModule

    fm = FovSimModule()
    x = np.random.default_rng(0).standard_normal((2, 12, 12, 5)).astype(np.float32)
    hit, missing = _coverage(fm, (jnp.asarray(x),), tm)
    assert not missing, missing
    variables = _import_into(fm, (jnp.asarray(x),), "saliency", tm)
    ours = np.asarray(fm.apply(variables, jnp.asarray(x)))
    with torch.no_grad():
        ref = tm(torch.from_numpy(x).permute(0, 3, 1, 2)).permute(0, 2, 3, 1).numpy()
    np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-5)


def test_compress_forward():
    mu = load_ref_module("models/model_utils.py", "ref_model_utils")
    # reference CompressNet lives in models/models.py; equivalent here is
    # ReLU + 1x1 conv; construct the torch twin directly
    t = torch.nn.Conv2d(24, 1, 1)
    tm = torch.nn.Sequential()
    tm.add_module("conv_last", t)
    from fovealseg_tpu.models.saliency import CompressNet

    cm = CompressNet()
    x = np.random.default_rng(1).standard_normal((1, 9, 9, 24)).astype(np.float32)
    variables = _import_into(cm, (jnp.asarray(x),), "compress", tm)
    ours = np.asarray(cm.apply(variables, jnp.asarray(x)))
    with torch.no_grad():
        ref = t(torch.relu(torch.from_numpy(x).permute(0, 3, 1, 2))).permute(0, 2, 3, 1).numpy()
    np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-5)


def test_c1_key_coverage_and_forward():
    mu = load_ref_module("models/model_utils.py", "ref_model_utils")
    tm = mu.C1(num_class=51, fc_dim=960).eval()
    from fovealseg_tpu.models.c1 import C1

    cm = C1(num_class=51, fc_dim=960)
    feats = np.random.default_rng(2).standard_normal((1, 80, 80, 960)).astype(np.float32) * 0.1
    hit, missing = _coverage(cm, ([jnp.asarray(feats)],), tm)
    assert not missing, missing
    variables = _import_into(cm, ([jnp.asarray(feats)],), "decoder", tm)
    ours = np.asarray(cm.apply(variables, [jnp.asarray(feats)]))
    with torch.no_grad():
        tf = torch.from_numpy(feats).permute(0, 3, 1, 2)
        # reference C1 moves the mask to .cuda() (model_utils.py:305); run the
        # same math manually CPU-side
        x = tm.cbr(tf)
        x = tm.conv_last(x)
        x = torch.sigmoid(x).float() - 0.5
        cls_pred = tm.cls_net(tf)
        cls_pred = cls_pred[:, :, None, None].expand(-1, -1, 80, 80).clone()
        cls_pred[:, -1:] = cls_pred[:, -1:] * x
        ref = cls_pred.permute(0, 2, 3, 1).numpy()
    np.testing.assert_allclose(ours, ref, rtol=1e-3, atol=1e-4)


@pytest.mark.slow
def test_hrnet_key_coverage_and_forward():
    hr = load_ref_module("models/hrnetv2_nodownsp.py", "ref_hrnet")
    tm = hr.hrnetv2_nodownsp(pretrained=False).eval()
    from fovealseg_tpu.models.hrnet import HRNetV2NoDownsp

    fm = HRNetV2NoDownsp()
    x = np.random.default_rng(3).standard_normal((1, 16, 16, 3)).astype(np.float32)
    hit, missing = _coverage(fm, (jnp.asarray(x),), tm)
    assert not missing, missing[:10]
    variables = _import_into(fm, (jnp.asarray(x),), "encoder", tm)
    (ours,) = fm.apply(variables, jnp.asarray(x))
    with torch.no_grad():
        ref = tm(torch.from_numpy(x).permute(0, 3, 1, 2))[0].permute(0, 2, 3, 1).numpy()
    np.testing.assert_allclose(np.asarray(ours), ref, rtol=1e-3, atol=1e-3)


# ---------------------------------------------------------------------------
# DeepLab oracle (torchvision is not installed in this image, so the oracle
# below is a minimal torch implementation of torchvision's documented
# deeplabv3_resnet101 — state_dict-key-compatible — with the CustomDeepLab
# classifier rewire from /root/reference/models/deeplab.py:11-49. It
# cross-checks the torch-vs-JAX numerics our encoder rests on: dilated-conv
# padding, OS8 stride replacement, ASPP image pooling, eval-BN, and the
# align_corners=False bilinear upsample.)
# ---------------------------------------------------------------------------


class _TVBottleneckT(torch.nn.Module):
    expansion = 4

    def __init__(self, inplanes, planes, stride=1, downsample=None, dilation=1):
        super().__init__()
        N = torch.nn
        self.conv1 = N.Conv2d(inplanes, planes, 1, bias=False)
        self.bn1 = N.BatchNorm2d(planes)
        self.conv2 = N.Conv2d(planes, planes, 3, stride=stride, padding=dilation,
                              dilation=dilation, bias=False)
        self.bn2 = N.BatchNorm2d(planes)
        self.conv3 = N.Conv2d(planes, planes * 4, 1, bias=False)
        self.bn3 = N.BatchNorm2d(planes * 4)
        self.downsample = downsample

    def forward(self, x):
        r = x if self.downsample is None else self.downsample(x)
        o = torch.relu(self.bn1(self.conv1(x)))
        o = torch.relu(self.bn2(self.conv2(o)))
        o = self.bn3(self.conv3(o))
        return torch.relu(o + r)


class _ResNetOS8T(torch.nn.Module):
    """torchvision ResNet w/ replace_stride_with_dilation=[False, True, True]."""

    def __init__(self, layers):
        super().__init__()
        N = torch.nn
        self.inplanes, self.dilation = 64, 1
        self.conv1 = N.Conv2d(3, 64, 7, stride=2, padding=3, bias=False)
        self.bn1 = N.BatchNorm2d(64)
        self.maxpool = N.MaxPool2d(3, stride=2, padding=1)
        self.layer1 = self._make(64, layers[0], 1, False)
        self.layer2 = self._make(128, layers[1], 2, False)
        self.layer3 = self._make(256, layers[2], 2, True)
        self.layer4 = self._make(512, layers[3], 2, True)

    def _make(self, planes, blocks, stride, dilate):
        N = torch.nn
        prev_dilation = self.dilation
        if dilate:
            self.dilation *= stride
            stride = 1
        downsample = None
        if stride != 1 or self.inplanes != planes * 4:
            downsample = N.Sequential(
                N.Conv2d(self.inplanes, planes * 4, 1, stride=stride, bias=False),
                N.BatchNorm2d(planes * 4),
            )
        out = [_TVBottleneckT(self.inplanes, planes, stride, downsample, prev_dilation)]
        self.inplanes = planes * 4
        for _ in range(1, blocks):
            out.append(_TVBottleneckT(self.inplanes, planes, dilation=self.dilation))
        return N.Sequential(*out)

    def forward(self, x):
        x = torch.relu(self.bn1(self.conv1(x)))
        x = self.maxpool(x)
        return self.layer4(self.layer3(self.layer2(self.layer1(x))))


class _ASPPT(torch.nn.Module):
    def __init__(self, in_ch=2048, out_ch=256, rates=(12, 24, 36)):
        super().__init__()
        N = torch.nn
        mods = [N.Sequential(N.Conv2d(in_ch, out_ch, 1, bias=False), N.BatchNorm2d(out_ch), N.ReLU())]
        for r in rates:
            mods.append(N.Sequential(
                N.Conv2d(in_ch, out_ch, 3, padding=r, dilation=r, bias=False),
                N.BatchNorm2d(out_ch), N.ReLU()))
        mods.append(N.Sequential(N.AdaptiveAvgPool2d(1),
                                 N.Conv2d(in_ch, out_ch, 1, bias=False),
                                 N.BatchNorm2d(out_ch), N.ReLU()))
        self.convs = N.ModuleList(mods)
        self.project = N.Sequential(N.Conv2d(5 * out_ch, out_ch, 1, bias=False),
                                    N.BatchNorm2d(out_ch), N.ReLU(), N.Dropout(0.5))

    def forward(self, x):
        res = []
        for i, conv in enumerate(self.convs):
            y = conv(x)
            if i == len(self.convs) - 1:
                y = torch.nn.functional.interpolate(
                    y, size=x.shape[-2:], mode="bilinear", align_corners=False)
            res.append(y)
        return self.project(torch.cat(res, 1))


class _CustomDeepLabT(torch.nn.Module):
    """CustomDeepLab twin: backbone + DeepLabHead w/ the 256->512->960 rewire."""

    def __init__(self, layers=(3, 4, 23, 3), num_classes=960):
        super().__init__()
        N = torch.nn
        inner = N.Module()
        inner.backbone = _ResNetOS8T(layers)
        inner.classifier = N.Sequential(
            _ASPPT(), N.Conv2d(256, 512, 1), N.BatchNorm2d(512), N.ReLU(),
            N.Conv2d(512, num_classes, 1))
        self.deeplab = inner

    def forward(self, x):
        y = self.deeplab.classifier(self.deeplab.backbone(x))
        return torch.nn.functional.interpolate(
            y, size=x.shape[-2:], mode="bilinear", align_corners=False)


def _randomize_bn(tm, rng):
    """Give BN layers non-trivial affine + running stats so parity is real."""
    for m in tm.modules():
        if isinstance(m, torch.nn.BatchNorm2d):
            m.weight.data = torch.from_numpy(rng.uniform(0.5, 1.5, m.weight.shape).astype(np.float32))
            m.bias.data = torch.from_numpy(rng.uniform(-0.2, 0.2, m.bias.shape).astype(np.float32))
            m.running_mean.data = torch.from_numpy(rng.uniform(-0.1, 0.1, m.running_mean.shape).astype(np.float32))
            m.running_var.data = torch.from_numpy(rng.uniform(0.8, 1.2, m.running_var.shape).astype(np.float32))


@pytest.mark.slow
def test_deeplab_key_coverage_and_forward():
    from fovealseg_tpu.models.deeplab import DeepLabEncoder

    layers = (1, 1, 1, 1)  # structurally identical reduced depth
    tm = _CustomDeepLabT(layers=layers).eval()
    _randomize_bn(tm, np.random.default_rng(7))
    fm = DeepLabEncoder(layers=layers)
    x = np.random.default_rng(5).standard_normal((1, 33, 33, 3)).astype(np.float32) * 0.5
    hit, missing = _coverage(fm, (jnp.asarray(x),), tm)
    assert not missing, missing[:10]
    variables = _import_into(fm, (jnp.asarray(x),), "encoder", tm)
    (ours,) = fm.apply(variables, jnp.asarray(x))
    with torch.no_grad():
        ref = tm(torch.from_numpy(x).permute(0, 3, 1, 2)).permute(0, 2, 3, 1).numpy()
    np.testing.assert_allclose(np.asarray(ours), ref, rtol=1e-3, atol=1e-3)


@pytest.mark.slow
def test_deeplab_full_depth_key_coverage():
    from fovealseg_tpu.models.deeplab import DeepLabEncoder

    tm = _CustomDeepLabT().eval()  # full ResNet-101 (3, 4, 23, 3)
    fm = DeepLabEncoder()
    x = np.random.default_rng(6).standard_normal((1, 16, 16, 3)).astype(np.float32)
    hit, missing = _coverage(fm, (jnp.asarray(x),), tm)
    assert not missing, missing[:10]
    assert hit > 500  # ResNet-101 + ASPP + rewired tail


@pytest.mark.parametrize("variant", [
    ("resnet18", "ResNetZoom", "BasicBlock", (2, 2, 2, 2)),
    ("resnet18_stride1", "ResNetZoom_Stride1", "BasicBlock", (2, 2, 2, 2)),
    ("resnet18_nonsyn", "ResNetZoom_nonsyn", "BasicBlock_nonsyn", (2, 2, 2, 2)),
    ("resnet10_nonsyn", "ResNetZoom_nonsyn", "BasicBlock_nonsyn", (1, 1, 1, 1)),
], ids=lambda v: v[0])
def test_resnet_zoom_key_coverage_and_forward(variant):
    """Alt saliency nets (saliency_network.py:98-373): torch forward parity
    for all four ResNetZoom variants (VERDICT r1 item 10 — the last shape-
    only-checked module family)."""
    name, cls_name, block_name, layers = variant
    sal = load_ref_module("saliency_network.py", "ref_saliency")
    tm = getattr(sal, cls_name)(getattr(sal, block_name), list(layers)).eval()

    from fovealseg_tpu.models.saliency import build_saliency

    fm = build_saliency(name)
    x = np.random.default_rng(3).standard_normal((2, 32, 32, 3)).astype(np.float32) * 0.5
    hit, missing = _coverage(fm, (jnp.asarray(x),), tm)
    # layer4/fc are built but dead in the reference forward
    # (saliency_network.py:141-152) and intentionally absent here
    missing = [k for k in missing if not k.startswith(("layer4", "fc"))]
    assert not missing, missing

    variables = _import_into(fm, (jnp.asarray(x),), "saliency", tm)
    # nonsyn BN is a stats-free module, so plain apply works for every variant
    ours = np.asarray(fm.apply(variables, jnp.asarray(x)))
    with torch.no_grad():
        ref = tm(torch.from_numpy(x).permute(0, 3, 1, 2)).permute(0, 2, 3, 1).numpy()
    assert ours.shape == ref.shape, (ours.shape, ref.shape)
    np.testing.assert_allclose(ours, ref, rtol=1e-3, atol=1e-4)


def _legacy_import(fm, sample, tm):
    variables = _import_into(fm, sample, "decoder", tm)
    return variables


def test_c1deepsup_parity():
    """Legacy C1DeepSup decoder (model_utils.py:189-221)."""
    mu = load_ref_module("models/model_utils.py", "ref_model_utils")
    tm = mu.C1DeepSup(num_class=7, fc_dim=64).eval()
    from fovealseg_tpu.models.legacy_decoders import C1DeepSup

    fm = C1DeepSup(num_class=7, fc_dim=64)
    rng_ = np.random.default_rng(0)
    c4 = rng_.standard_normal((1, 16, 16, 32)).astype(np.float32)
    c5 = rng_.standard_normal((1, 8, 8, 64)).astype(np.float32)
    sample = ([jnp.asarray(c4), jnp.asarray(c5)],)
    hit, missing = _coverage(fm, sample, tm)
    assert not missing, missing
    variables = _legacy_import(fm, sample, tm)
    ours_x, ours_d = fm.apply(variables, [jnp.asarray(c4), jnp.asarray(c5)])
    with torch.no_grad():
        t4 = torch.from_numpy(c4).permute(0, 3, 1, 2)
        t5 = torch.from_numpy(c5).permute(0, 3, 1, 2)
        ref_x, ref_d = tm([t4, t5])
    np.testing.assert_allclose(np.asarray(ours_x), ref_x.permute(0, 2, 3, 1).numpy(),
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(ours_d), ref_d.permute(0, 2, 3, 1).numpy(),
                               rtol=1e-4, atol=1e-4)


@pytest.mark.parametrize("arch", ["ppm", "ppm_deepsup"])
def test_ppm_parity(arch):
    """Legacy PPM / PPMDeepsup decoders (model_utils.py:312-419)."""
    mu = load_ref_module("models/model_utils.py", "ref_model_utils")
    cls = mu.PPM if arch == "ppm" else mu.PPMDeepsup
    tm = cls(num_class=7, fc_dim=64, pool_scales=(1, 2, 3)).eval()
    from fovealseg_tpu.models.legacy_decoders import PPM, PPMDeepsup

    fcls = PPM if arch == "ppm" else PPMDeepsup
    fm = fcls(num_class=7, fc_dim=64, pool_scales=(1, 2, 3))
    rng_ = np.random.default_rng(1)
    c4 = rng_.standard_normal((1, 12, 12, 32)).astype(np.float32)
    c5 = rng_.standard_normal((1, 6, 6, 64)).astype(np.float32)
    sample = ([jnp.asarray(c4), jnp.asarray(c5)],)
    hit, missing = _coverage(fm, sample, tm)
    assert not missing, missing
    variables = _legacy_import(fm, sample, tm)
    ours = fm.apply(variables, [jnp.asarray(c4), jnp.asarray(c5)])
    with torch.no_grad():
        t4 = torch.from_numpy(c4).permute(0, 3, 1, 2)
        t5 = torch.from_numpy(c5).permute(0, 3, 1, 2)
        ref = tm([t4, t5])
    if arch == "ppm":
        np.testing.assert_allclose(np.asarray(ours), ref.permute(0, 2, 3, 1).numpy(),
                                   rtol=1e-4, atol=1e-4)
    else:
        np.testing.assert_allclose(np.asarray(ours[0]), ref[0].permute(0, 2, 3, 1).numpy(),
                                   rtol=1e-4, atol=1e-4)
        np.testing.assert_allclose(np.asarray(ours[1]), ref[1].permute(0, 2, 3, 1).numpy(),
                                   rtol=1e-4, atol=1e-4)


def test_upernet_parity():
    """Legacy UPerNet decoder (model_utils.py:422-507)."""
    mu = load_ref_module("models/model_utils.py", "ref_model_utils")
    tm = mu.UPerNet(num_class=7, fc_dim=64, pool_scales=(1, 2),
                    fpn_inplanes=(16, 32, 64), fpn_dim=24).eval()
    from fovealseg_tpu.models.legacy_decoders import UPerNet

    fm = UPerNet(num_class=7, fc_dim=64, pool_scales=(1, 2),
                 fpn_inplanes=(16, 32, 64), fpn_dim=24)
    rng_ = np.random.default_rng(2)
    c2 = rng_.standard_normal((1, 24, 24, 16)).astype(np.float32)
    c3 = rng_.standard_normal((1, 12, 12, 32)).astype(np.float32)
    c5 = rng_.standard_normal((1, 6, 6, 64)).astype(np.float32)
    feats = [jnp.asarray(c2), jnp.asarray(c3), jnp.asarray(c5)]
    sample = (feats,)
    hit, missing = _coverage(fm, sample, tm)
    assert not missing, missing
    variables = _legacy_import(fm, sample, tm)
    ours = fm.apply(variables, feats)
    with torch.no_grad():
        ts = [torch.from_numpy(np.asarray(a)).permute(0, 3, 1, 2) for a in (c2, c3, c5)]
        ref = tm(ts)
    np.testing.assert_allclose(np.asarray(ours), ref.permute(0, 2, 3, 1).numpy(),
                               rtol=1e-4, atol=1e-4)
