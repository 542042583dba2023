"""Loss parity vs torch oracles implementing the reference formulas."""

import jax.numpy as jnp
import numpy as np
import torch
import torch.nn.functional as TF

from fovealseg_tpu.core import losses as L


def test_focal_matches_torch_formula(rng):
    logits = rng.standard_normal((2, 8, 8, 5)).astype(np.float32)
    labels = rng.integers(0, 5, (2, 8, 8))
    ours = float(L.focal_loss(jnp.asarray(logits), jnp.asarray(labels), gamma=5.0))
    # oracle: models/models.py:87-120 formula
    t = torch.from_numpy(logits).reshape(-1, 5)
    tgt = torch.from_numpy(labels).reshape(-1, 1)
    logpt = TF.log_softmax(t, dim=-1).gather(1, tgt).view(-1)
    pt = logpt.exp()
    ref = float((-1 * (1 - pt) ** 5.0 * logpt).mean())
    np.testing.assert_allclose(ours, ref, rtol=1e-5)


def test_dice_multiclass_toolbelt_semantics(rng):
    logits = rng.standard_normal((2, 8, 8, 4)).astype(np.float32)
    labels = rng.integers(0, 3, (2, 8, 8))  # class 3 absent
    ours = float(L.dice_loss_multiclass(jnp.asarray(logits), jnp.asarray(labels)))
    # oracle: pytorch_toolbelt DiceLoss('multiclass')
    t = torch.from_numpy(logits).permute(0, 3, 1, 2)
    y = torch.from_numpy(labels)
    probs = t.log_softmax(1).exp().reshape(2, 4, -1)
    onehot = TF.one_hot(y.reshape(2, -1), 4).permute(0, 2, 1).float()
    dims = (0, 2)
    inter = (probs * onehot).sum(dims)
    card = (probs + onehot).sum(dims)
    score = (2 * inter) / card.clamp_min(1e-7)
    loss = (1 - score) * (onehot.sum(dims) > 0)
    ref = float(loss.mean())
    np.testing.assert_allclose(ours, ref, rtol=1e-5)


def test_edge_loss_normalized(rng):
    xs = rng.uniform(0, 1e-3, (2, 8, 8, 1)).astype(np.float32)
    tgt = rng.uniform(0, 1, (2, 8, 8, 1)).astype(np.float32)
    ours = float(L.edge_loss(jnp.asarray(xs), jnp.asarray(tgt), edge_loss_scale=100.0))
    xs_n = (xs - xs.min()) / (xs.max() - xs.min())
    tgt_n = (tgt - tgt.min()) / (tgt.max() - tgt.min())
    ref = 0.05 * np.mean((xs_n - tgt_n) ** 2) * 100.0
    np.testing.assert_allclose(ours, ref, rtol=1e-5)


def test_cross_entropy_ignore(rng):
    logits = rng.standard_normal((2, 4, 4, 3)).astype(np.float32)
    labels = rng.integers(0, 3, (2, 4, 4))
    labels[0, 0, 0] = -2  # ignore
    ours = float(L.cross_entropy(jnp.asarray(logits), jnp.asarray(labels), ignore_label=-2))
    t = torch.from_numpy(logits).permute(0, 3, 1, 2)
    ref = float(TF.cross_entropy(t, torch.from_numpy(labels).long(), ignore_index=-2))
    np.testing.assert_allclose(ours, ref, rtol=1e-5)


def test_bmse_balanced(rng):
    pred = rng.uniform(0, 1, (2, 8, 8)).astype(np.float32)
    tgt = (rng.uniform(0, 1, (2, 8, 8)) > 0.7).astype(np.float32)
    ours = float(L.bmse_loss(jnp.asarray(pred), jnp.asarray(tgt)))
    ones = tgt >= 0.5
    mse = (pred - tgt) ** 2
    m1 = (mse * ones).sum((-2, -1)) / (ones.sum((-2, -1)) + 1e-6)
    m0 = (mse * ~ones).sum((-2, -1)) / ((~ones).sum((-2, -1)) + 1e-6)
    ref = float(np.mean(0.5 * m1 + 0.5 * m0))
    np.testing.assert_allclose(ours, ref, rtol=1e-5)


def test_metrics_pixel_acc_family(rng):
    from fovealseg_tpu.core import metrics as M

    logits = rng.standard_normal((2, 8, 8, 51)).astype(np.float32)
    labels = rng.integers(0, 51, (2, 8, 8))
    preds = logits.argmax(-1)
    # brute-force oracle for pixel_acc (models/models.py:381-399)
    accs = []
    for i in range(2):
        valid = labels[i] < 50
        valid1 = preds[i] < 50
        inter = np.sum(valid & (preds[i] == labels[i]))
        union = np.sum(valid | valid1)
        accs.append(inter / (union + 1e-10))
    ref = float(np.mean(accs))
    ours = float(M.pixel_acc(jnp.asarray(logits), jnp.asarray(labels)))
    np.testing.assert_allclose(ours, ref, rtol=1e-5)


def test_edge_loss_non_norm_has_no_005_factor(rng):
    # reference: the non-norm branch is plain MSE * edge_loss_scale
    # (models/models.py:896-898) — the 0.05 belongs to the norm branch only
    xs = rng.uniform(0, 1, (2, 8, 8, 1)).astype(np.float32)
    tgt = rng.uniform(0, 1, (2, 8, 8, 1)).astype(np.float32)
    ours = float(
        L.edge_loss(jnp.asarray(xs), jnp.asarray(tgt), edge_loss_scale=100.0, normalize=False)
    )
    ref = np.mean((xs - tgt) ** 2) * 100.0
    np.testing.assert_allclose(ours, ref, rtol=1e-5)
