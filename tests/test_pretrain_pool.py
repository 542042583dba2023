"""Recasens pretrain augmentation: AdaptiveAvgPool2d(s) -> Upsample(task)
of x_sampled (/root/reference/models/models.py:911-917), rebuilt as a
fixed-shape stacked operator indexed by a traced s."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch

from fovealseg_tpu.models.deform_module import (
    DeformConfig,
    DeformSegmentation,
    _pretrain_pool_operators,
)


@pytest.mark.parametrize("s", [6, 9, 16])
def test_pool_operator_matches_torch(rng, s):
    """A_s x == Upsample(task, bilinear)(AdaptiveAvgPool2d((s, s))(x))."""
    th, tw = 16, 16
    x = rng.standard_normal((2, th, tw, 3)).astype(np.float32)
    s_min, ar, ac = _pretrain_pool_operators((th, tw), (16, 16))
    a_r, a_c = ar[s - s_min], ac[s - s_min]
    ours = np.einsum("ij,bjwc->biwc", a_r, x)
    ours = np.einsum("ij,bhjc->bhic", a_c, ours)
    t = torch.from_numpy(x).permute(0, 3, 1, 2)
    ref = torch.nn.Upsample(size=(th, tw), mode="bilinear")(
        torch.nn.AdaptiveAvgPool2d((s, s))(t)
    ).permute(0, 2, 3, 1).numpy()
    np.testing.assert_allclose(ours, ref, rtol=1e-5, atol=1e-5)


def test_pool_s_traced_gate(rng):
    """pool_s >= 0 applies the augmentation, -1 is a runtime no-op, and both
    run through ONE jitted executable (the gate is traced, not static)."""
    cfg = DeformConfig(
        task_hw=(16, 16), task_hw_infer=(16, 16), saliency_hw=(16, 16),
        gaussian_radius=5, arch_encoder="hrnetv2_nodownsp_tiny",
    )
    module = DeformSegmentation(config=cfg)
    x = jnp.asarray(rng.standard_normal((1, 64, 64, 3)).astype(np.float32))
    f = jnp.full((1, 2), 0.5, jnp.float32)
    variables = module.init(jax.random.PRNGKey(0), x, f)

    @jax.jit
    def fwd(ps):
        return module.apply(
            variables, x, f, train=True, pool_s=ps,
            rngs={"dropout": jax.random.PRNGKey(0)}, mutable=["batch_stats"],
        )[0]["x_sampled"]

    off = fwd(jnp.int32(-1))
    on = fwd(jnp.int32(8))
    # same train-mode forward without the pool_s plumbing at all
    base = module.apply(
        variables, x, f, train=True,
        rngs={"dropout": jax.random.PRNGKey(0)}, mutable=["batch_stats"],
    )[0]["x_sampled"]
    np.testing.assert_allclose(np.asarray(off), np.asarray(base), rtol=1e-3, atol=1e-4)
    assert float(jnp.abs(on - off).max()) > 1e-4  # pooling visibly low-passed
    # s at the top of the range (== min saliency == task size) pools 16->16
    # which is identity
    top = fwd(jnp.int32(16))
    np.testing.assert_allclose(np.asarray(top), np.asarray(off), rtol=1e-3, atol=1e-4)


def test_pool_applies_in_eval_mode_forward(rng):
    """TRAIN.fix_bn trains with the module in eval mode but the reference
    still pools (models.py:905-920 gates on segSize/epoch, not training
    mode) — pool_s must take effect under train=False too."""
    cfg = DeformConfig(
        task_hw=(16, 16), task_hw_infer=(16, 16), saliency_hw=(16, 16),
        gaussian_radius=5, arch_encoder="hrnetv2_nodownsp_tiny",
    )
    module = DeformSegmentation(config=cfg)
    x = jnp.asarray(rng.standard_normal((1, 64, 64, 3)).astype(np.float32))
    f = jnp.full((1, 2), 0.5, jnp.float32)
    variables = module.init(jax.random.PRNGKey(0), x, f)
    on = module.apply(variables, x, f, train=False, pool_s=jnp.int32(8))
    off = module.apply(variables, x, f, train=False, pool_s=jnp.int32(-1))
    base = module.apply(variables, x, f, train=False)
    assert not np.allclose(np.asarray(on["x_sampled"]),
                           np.asarray(off["x_sampled"]))
    np.testing.assert_allclose(np.asarray(off["x_sampled"]),
                               np.asarray(base["x_sampled"]),
                               rtol=1e-5, atol=1e-6)
