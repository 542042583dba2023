"""seg_hrnet parity vs the exec'd reference file.

The reference's models/seg_hrnet.py is unimportable in its own repo (it
requires `.sync_bn.inplace_abn.bn.InPlaceABNSync`, never shipped —
seg_hrnet.py:22). We exec it with a plain-BatchNorm stub (exactly the
forward semantics of InPlaceABNSync(activation='none')) and pin key coverage
+ numerical forward parity of fovealseg_tpu.models.seg_hrnet against it.
"""

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from tests.ref_oracle import load_ref_module, state_dict_numpy
from tests.test_torch_parity import _coverage, _import_into


class _InPlaceABNSyncStub(torch.nn.BatchNorm2d):
    """InPlaceABNSync(activation='none') == BatchNorm2d for the forward."""

    def __init__(self, num_features, momentum=0.1, activation="none"):
        assert activation == "none"
        super().__init__(num_features, momentum=momentum)


def _ref_seg_hrnet():
    return load_ref_module(
        "models/seg_hrnet.py",
        "ref_seg_hrnet",
        replacements=(
            ("from .sync_bn.inplace_abn.bn import InPlaceABNSync", ""),
            ("np.int(", "int("),  # removed in numpy >= 1.24
        ),
        inject={"InPlaceABNSync": _InPlaceABNSyncStub},
    )


def _tiny_extra(final_k=1, stage2_block="BASIC"):
    return dict(
        STAGE2=dict(NUM_MODULES=1, NUM_BRANCHES=2, NUM_BLOCKS=[1, 1],
                    NUM_CHANNELS=[4, 8], BLOCK=stage2_block, FUSE_METHOD="SUM"),
        STAGE3=dict(NUM_MODULES=2, NUM_BRANCHES=3, NUM_BLOCKS=[1, 1, 1],
                    NUM_CHANNELS=[4, 8, 16], BLOCK="BASIC", FUSE_METHOD="SUM"),
        STAGE4=dict(NUM_MODULES=1, NUM_BRANCHES=4, NUM_BLOCKS=[1, 1, 1, 1],
                    NUM_CHANNELS=[4, 8, 16, 32], BLOCK="BASIC", FUSE_METHOD="SUM"),
        FINAL_CONV_KERNEL=final_k,
    )


def _torch_cfg(extra, num_classes):
    from fovealseg_tpu.configs.cfg_node import CfgNode as CN

    def cn(d):
        return CN({k: cn(v) if isinstance(v, dict) else v for k, v in d.items()})

    return cn({"MODEL": {"EXTRA": extra, "PRETRAINED": ""},
               "DATASET": {"NUM_CLASSES": num_classes}})


def _randomize(tm, seed):
    g = torch.Generator().manual_seed(seed)
    with torch.no_grad():
        for k, v in tm.state_dict().items():
            if k.endswith("num_batches_tracked"):
                continue
            r = torch.randn(v.shape, generator=g) * 0.2
            if v.ndim == 4:  # conv: keep activations O(1) through the deep stack
                fan_in = v.shape[1] * v.shape[2] * v.shape[3]
                r = torch.randn(v.shape, generator=g) / float(fan_in) ** 0.5
            elif k.endswith("running_var"):
                r = r.abs() + 0.5
            elif k.endswith(("weight",)) and v.ndim == 1:
                r = r + 1.0  # BN scales near 1 keep activations alive
            v.copy_(r)
    return tm


@pytest.mark.parametrize(
    "final_k,stage2_block", [(1, "BASIC"), (3, "BOTTLENECK")]
)
def test_seg_hrnet_key_coverage_and_forward(final_k, stage2_block):
    seg = _ref_seg_hrnet()
    extra = _tiny_extra(final_k, stage2_block)
    num_classes = 7
    tm = _randomize(seg.HighResolutionNet(_torch_cfg(extra, num_classes)).eval(), 11 + final_k)

    from fovealseg_tpu.models.seg_hrnet import SegHRNet

    fm = SegHRNet(num_classes=num_classes, extra=extra)
    x = np.random.default_rng(5).standard_normal((2, 64, 64, 3)).astype(np.float32)

    hit, missing = _coverage(fm, (jnp.asarray(x),), tm)
    assert not missing, missing[:10]

    variables = _import_into(fm, (jnp.asarray(x),), "encoder", tm)
    ours = fm.apply(variables, jnp.asarray(x))
    with torch.no_grad():
        ref = tm(torch.from_numpy(x).permute(0, 3, 1, 2)).permute(0, 2, 3, 1).numpy()
    assert ours.shape == ref.shape  # [2, 16, 16, 7] (1/4 input resolution)
    np.testing.assert_allclose(np.asarray(ours), ref, rtol=2e-3, atol=2e-3)


def test_seg_hrnet_w48_default_builds():
    """The published W48 instantiation initializes and runs shape-correctly."""
    from fovealseg_tpu.models.seg_hrnet import get_seg_model

    fm = get_seg_model(num_classes=19)
    x = jnp.zeros((1, 64, 64, 3), jnp.float32)
    variables = jax.eval_shape(fm.init, jax.random.PRNGKey(0), x)
    out = jax.eval_shape(
        lambda v, x: fm.apply(v, x),
        variables, jax.ShapeDtypeStruct((1, 64, 64, 3), jnp.float32),
    )
    assert out.shape == (1, 16, 16, 19)
