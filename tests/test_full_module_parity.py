"""END-TO-END full-module parity: the reference's entire
``DeformSegmentationModule.forward`` training branch (/root/reference/models/
models.py:666-1094) exec'd as a torch oracle vs our composed pipeline
(DeformSegmentation.__call__ + compute_losses).

Per-net numerics (FovSim, CompressNet, HRNet, C1), the grid solver, the warp
and each loss formula all have dedicated parity tests; what ONLY this test
pins is the COMPOSITION — focus-map construction, x_low concat grammar,
saliency→compress→upsample→softmax chain, replication padding, create_grid,
grid_sample of image and label, gt = label*cls + (1-label)*50, and the
dice+focal+edge totals and the four pixel-acc metrics the reference returns
from one forward (loss, acc, edge_loss, acc_bin_fg, acc_cls_fbg,
acc_bin_fbg — eval.py:372-451 consumes exactly these).

Both modules run in eval mode (the reference's eval_during_train /
TRAIN.fix_bn posture: frozen BN, no dropout) so the comparison is
deterministic; the losses compared are the TRAINING-branch losses.
"""

import numpy as np
import pytest
import torch

jnp = pytest.importorskip("jax.numpy")
import jax  # noqa: E402

from tests.ref_oracle import load_ref_module, state_dict_numpy  # noqa: E402

from fovealseg_tpu.configs import get_default_cfg  # noqa: E402
from fovealseg_tpu.models.deform_module import DeformConfig, DeformSegmentation  # noqa: E402
from fovealseg_tpu.train.checkpoint import import_torch_state_dict  # noqa: E402
from fovealseg_tpu.train.step import LossConfig, compute_losses  # noqa: E402


class _DiceLossStub(torch.nn.Module):
    """pytorch_toolbelt DiceLoss('multiclass') semantics (from_logits=True,
    smooth=0, eps=1e-7) — the package is absent in this image."""

    def __init__(self, mode, *a, **kw):
        super().__init__()
        assert mode == "multiclass"

    def forward(self, y_pred, y_true):
        bs, c = y_pred.shape[0], y_pred.shape[1]
        probs = y_pred.log_softmax(dim=1).exp().reshape(bs, c, -1)
        onehot = torch.nn.functional.one_hot(
            y_true.long().reshape(bs, -1), c).permute(0, 2, 1).float()
        dims = (0, 2)
        inter = (probs * onehot).sum(dims)
        card = (probs + onehot).sum(dims)
        score = (2.0 * inter) / card.clamp_min(1e-7)
        loss = (1.0 - score) * (onehot.sum(dims) > 0).float()
        return loss.mean()


def _ref_model_utils_cpu():
    # model_utils.C1.forward does `x.cuda()` (model_utils.py:305); load a
    # CPU-patched copy under a distinct cache name.
    return load_ref_module(
        "models/model_utils.py", "ref_model_utils_cpu",
        replacements=((".cuda()", ""),))


def _ref_models_module():
    mu = _ref_model_utils_cpu()
    import torch.nn.functional as F

    def b_imresize(im, size, interp="bilinear"):
        return F.interpolate(im, size, mode=interp)

    return load_ref_module(
        "models/models.py",
        "ref_models_full",
        replacements=(
            ("import torchvision.utils as vutils", "vutils = None"),
            ("import torchvision.models as models", "models = None"),
            ("import torchvision", ""),
            ("import torchsnooper", ""),
            ("from . import resnet, resnext, mobilenet, hrnetv2_nodownsp, segformer, deeplab", ""),
            ("from dataset import imresize, b_imresize", ""),
            ("from models.model_utils import Resnet, ResnetDilated, MobileNetV2Dilated, C1DeepSup, C1, PPM, PPMDeepsup, UPerNet", ""),
            ("from pytorch_toolbelt.losses.dice import DiceLoss", ""),
            ("torch.cuda.reset_max_memory_allocated(0)", "0"),
            (".cuda()", ""),
            ("device='cuda'", "device='cpu'"),
        ),
        inject=dict(
            b_imresize=b_imresize,
            DiceLoss=_DiceLossStub,
            C1=mu.C1, C1DeepSup=mu.C1DeepSup, PPM=mu.PPM,
            PPMDeepsup=mu.PPMDeepsup, UPerNet=mu.UPerNet,
            Resnet=mu.Resnet, ResnetDilated=mu.ResnetDilated,
            MobileNetV2Dilated=mu.MobileNetV2Dilated,
        ),
    )


def _cfg():
    cfg = get_default_cfg()
    cfg.DATASET.num_class = 51
    cfg.DATASET.segm_downsampling_rate = 1
    # C1's cls_net downsamples 8x then AvgPool2d((10,10)) -> task size must
    # be 73..80 (model_utils.py:252-275); use the canonical 80x80.
    cfg.TRAIN.task_input_size = (80, 80)
    # models.py:968 broadcasts the cls label over (HS,WS)=saliency_input_size
    # against y_sampled at task size -> the two must match (canonical run
    # uses 80x80 for both, README.md:73).
    cfg.TRAIN.saliency_input_size = (80, 80)
    cfg.MODEL.gaussian_radius = 5
    cfg.MODEL.arch_encoder = "hrnetv2_nodownsp"
    cfg.MODEL.arch_decoder = "c1"
    cfg.MODEL.fc_dim = 960
    cfg.TRAIN.deform_joint_loss = True
    cfg.TRAIN.opt_deform_LabelEdge_norm = True
    cfg.TRAIN.deform_pretrain_bol = True
    cfg.TRAIN.edge_loss_scale = 1.0
    cfg.TRAIN.global_epoch = 2
    return cfg


def _batch(rng, b=2, canvas=48):
    # instance blob with both classes present per sample (the reference PIL
    # edge-target normalizes per-sample min/max — a constant label NaNs)
    imgs = rng.uniform(0, 1, (b, canvas, canvas, 3)).astype(np.float32)
    masks = np.zeros((b, canvas, canvas), np.float32)
    focus = np.zeros((b, 2), np.float32)
    cls = np.zeros((b,), np.int64)
    for j in range(b):
        cy, cx = rng.integers(12, canvas - 12, 2)
        r = int(rng.integers(6, 10))
        yy, xx = np.mgrid[:canvas, :canvas]
        masks[j][(yy - cy) ** 2 + (xx - cx) ** 2 <= r * r] = 1.0
        focus[j] = (cy / canvas, cx / canvas)
        cls[j] = rng.integers(0, 50)
    return imgs, focus, masks, cls


@pytest.fixture(scope="module")
def parity_rig():
    cfg = _cfg()
    ref = _ref_models_module()
    sal_mod = load_ref_module("saliency_network.py", "ref_saliency")
    hr_mod = load_ref_module("models/hrnetv2_nodownsp.py", "ref_hrnet")
    mu = _ref_model_utils_cpu()

    torch.manual_seed(0)
    enc_t = hr_mod.hrnetv2_nodownsp(pretrained=False)
    dec_t = mu.C1(num_class=51, fc_dim=960)
    sal_t = sal_mod.fov_simple(cfg, pretrained=False)
    com_t = ref.CompressNet(cfg)
    tm = ref.DeformSegmentationModule(enc_t, dec_t, sal_t, com_t, None, cfg).eval()

    dc = DeformConfig.from_cfg(cfg)
    fm = DeformSegmentation(config=dc)
    rng = np.random.default_rng(7)
    imgs, focus, masks, cls = _batch(rng)
    variables = fm.init(jax.random.PRNGKey(0), jnp.asarray(imgs), jnp.asarray(focus))
    params, stats = import_torch_state_dict(
        {
            "encoder": state_dict_numpy(enc_t),
            "decoder": state_dict_numpy(dec_t),
            "saliency": state_dict_numpy(sal_t),
            "compress": state_dict_numpy(com_t),
        },
        variables["params"], variables.get("batch_stats", {}),
    )
    return cfg, tm, fm, {"params": params, "batch_stats": stats}, (imgs, focus, masks, cls)


def _ref_forward(tm, imgs, focus, masks, cls, is_inference):
    feed = {
        "img_data": torch.from_numpy(imgs).permute(0, 3, 1, 2),
        "focus_point": torch.from_numpy(focus),
        "seg_label": torch.from_numpy(masks).unsqueeze(1),
        "cls_label": torch.from_numpy(cls).unsqueeze(1),
    }
    with torch.no_grad():
        return tm(feed, rank=None, cur_iter=None, is_inference=is_inference)


def test_full_forward_training_losses(parity_rig):
    cfg, tm, fm, variables, (imgs, focus, masks, cls) = parity_rig
    loss_t, acc_t, edge_t = _ref_forward(tm, imgs, focus, masks, cls, False)

    out = fm.apply(variables, jnp.asarray(imgs), jnp.asarray(focus), train=False)
    batch = {
        "img_data": jnp.asarray(imgs),
        "focus_point": jnp.asarray(focus),
        "seg_label": jnp.asarray(masks),
        "cls_label": jnp.asarray(cls.astype(np.int32)),
    }
    loss, mets = compute_losses(out, batch, LossConfig.from_cfg(cfg))
    np.testing.assert_allclose(float(loss), float(loss_t), rtol=2e-3)
    np.testing.assert_allclose(float(mets["edge_loss"]), float(edge_t), rtol=2e-3)
    # pixel accuracy is a 51-way argmax ratio over 512 pixels; identical
    # weights leave only float-noise argmax flips
    np.testing.assert_allclose(float(mets["acc"]), float(acc_t), atol=0.01)


def test_full_forward_eval_metric_family(parity_rig):
    cfg, tm, fm, variables, (imgs, focus, masks, cls) = parity_rig
    loss_t, acc_t, edge_t, abf_t, acf_t, abb_t = _ref_forward(
        tm, imgs, focus, masks, cls, True)

    out = fm.apply(variables, jnp.asarray(imgs), jnp.asarray(focus), train=False)
    batch = {
        "img_data": jnp.asarray(imgs),
        "focus_point": jnp.asarray(focus),
        "seg_label": jnp.asarray(masks),
        "cls_label": jnp.asarray(cls.astype(np.int32)),
    }
    loss, mets = compute_losses(out, batch, LossConfig.from_cfg(cfg))
    np.testing.assert_allclose(float(loss), float(loss_t), rtol=2e-3)
    np.testing.assert_allclose(float(mets["edge_loss"]), float(edge_t), rtol=2e-3)
    for ours, ref in [
        (mets["acc"], acc_t),
        (mets["acc_bin_fg"], abf_t),
        (mets["acc_cls_fbg"], acf_t),
        (mets["acc_bin_fbg"], abb_t),
    ]:
        np.testing.assert_allclose(float(ours), float(ref), atol=0.01)
