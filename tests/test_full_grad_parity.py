"""FULL-MODULE GRADIENT parity: torch autograd through the reference's
entire training forward (models/models.py:666-1094, eval-mode/fix_bn
posture) vs ``jax.grad`` of our composed loss, with identical imported
weights.

Forward parity (tests/test_full_module_parity.py) pins the values; this
test pins the *backward* — the training signal every parameter of all
four nets actually receives from the joint Dice+Focal+edge loss,
including the path through the grid solver and the forward warp into
the saliency/compress nets (the part that makes the foveation learned).

The comparison trick: ``import_torch_state_dict`` maps torch tensors to
our flax layout with pure permutations (conv OIHW->HWIO, linear
transpose), so pushing the torch ``.grad`` tensors through the same shim
yields gradients directly comparable leaf-by-leaf to our grad pytree.
"""

import numpy as np
import pytest
import torch

jnp = pytest.importorskip("jax.numpy")
import jax  # noqa: E402

from tests.ref_oracle import load_ref_module, state_dict_numpy  # noqa: E402
from tests.test_full_module_parity import (  # noqa: E402
    _batch, _cfg, _ref_model_utils_cpu, _ref_models_module,
)

from fovealseg_tpu.configs import get_default_cfg  # noqa: E402
from fovealseg_tpu.models.deform_module import DeformConfig, DeformSegmentation  # noqa: E402
from fovealseg_tpu.train.checkpoint import import_torch_state_dict  # noqa: E402
from fovealseg_tpu.train.step import LossConfig, compute_losses  # noqa: E402


def test_full_module_grad_parity():
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
    nets_t = {"encoder": enc_t, "decoder": dec_t, "saliency": sal_t, "compress": com_t}
    params, stats = import_torch_state_dict(
        {k: state_dict_numpy(v) for k, v in nets_t.items()},
        variables["params"], variables.get("batch_stats", {}),
    )

    # ---- torch backward (eval-mode module, grads enabled = fix_bn posture)
    feed = {
        "img_data": torch.from_numpy(imgs).permute(0, 3, 1, 2),
        "focus_point": torch.from_numpy(focus),
        "seg_label": torch.from_numpy(masks).unsqueeze(1),
        "cls_label": torch.from_numpy(cls).unsqueeze(1),
    }
    loss_t, _, _ = tm(feed, rank=None, cur_iter=None, is_inference=False)
    loss_t.backward()
    grad_sds = {
        kind: {
            name: (p.grad.detach().numpy() if p.grad is not None
                   else np.zeros(p.shape, np.float32))
            for name, p in net.named_parameters()
        }
        for kind, net in nets_t.items()
    }
    zero_params = jax.tree.map(np.zeros_like, params)
    zero_stats = jax.tree.map(np.zeros_like, stats)
    g_ref, _ = import_torch_state_dict(grad_sds, zero_params, zero_stats)

    # ---- our backward
    batch = {
        "img_data": jnp.asarray(imgs),
        "focus_point": jnp.asarray(focus),
        "seg_label": jnp.asarray(masks),
        "cls_label": jnp.asarray(cls.astype(np.int32)),
    }
    lc = LossConfig.from_cfg(cfg)

    def loss_fn(p):
        out = fm.apply(
            {"params": p, "batch_stats": stats},
            batch["img_data"], batch["focus_point"], train=False,
        )
        loss, _ = compute_losses(out, batch, lc)
        return loss

    g_ours = jax.jit(jax.grad(loss_fn))(params)

    # ---- leaf-by-leaf relative-L2 comparison
    flat_ref = jax.tree_util.tree_flatten_with_path(g_ref)[0]
    flat_ours = jax.tree_util.tree_flatten_with_path(g_ours)[0]
    assert len(flat_ref) == len(flat_ours)
    worst = []
    for (path_r, leaf_r), (path_o, leaf_o) in zip(flat_ref, flat_ours):
        assert path_r == path_o
        a = np.asarray(leaf_o, np.float64)
        b = np.asarray(leaf_r, np.float64)
        ref_norm = np.linalg.norm(b)
        err = np.linalg.norm(a - b) / (ref_norm + 1e-12)
        # f32 accumulation noise through a 100+-layer backward; leaves with
        # negligible reference gradient are held to an absolute bound
        if ref_norm > 1e-6:
            worst.append((err, jax.tree_util.keystr(path_r), ref_norm))
        else:
            assert np.linalg.norm(a) < 1e-4, jax.tree_util.keystr(path_r)
    worst.sort(reverse=True)
    bad = [w for w in worst if w[0] > 2e-2]
    assert not bad, f"worst grad leaves: {worst[:5]}"
    # and the global direction must agree essentially exactly
    va = np.concatenate([np.asarray(l, np.float64).ravel() for _, l in flat_ours])
    vb = np.concatenate([np.asarray(l, np.float64).ravel() for _, l in flat_ref])
    cos = float(va @ vb / (np.linalg.norm(va) * np.linalg.norm(vb)))
    assert cos > 0.9999, cos
