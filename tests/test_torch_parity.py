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
