"""Shape-bucketed dynamic task sizing (TRAIN.dynamic_task_input)."""

import numpy as np

from fovealseg_tpu.models.bucketed import BucketedDeform, derive_task_size, round_bucket
from fovealseg_tpu.models.deform_module import DeformConfig


def test_derive_task_size_picks_smaller_area():
    assert derive_task_size((640, 640), (80, 80)) == (80, 80)
    t = derive_task_size((512, 1024), (64, 128))
    assert t[0] * t[1] <= 64 * 128 * 2  # scaled near the requested budget


def test_round_bucket():
    assert round_bucket((65, 100), 32) == (96, 128)
    assert round_bucket((64, 128), 32) == (64, 128)


def test_bucket_cache_reuse():
    b = BucketedDeform(DeformConfig(gaussian_radius=5), (16, 16))
    m1 = b.module_for((64, 64))
    m2 = b.module_for((70, 60))  # same 96/64-rounded bucket? -> (96,64) vs (64,64)
    m3 = b.module_for((64, 64))
    assert m1 is m3
    assert m1.config.task_hw == (16, 16)
    assert m2.config.task_hw[0] >= 16


def test_from_cfg_wires_dynamic_saliency_relative_size():
    from fovealseg_tpu.configs import get_default_cfg
    from fovealseg_tpu.models.bucketed import BucketedDeform

    cfg = get_default_cfg()
    cfg.TRAIN.dynamic_task_input = (32, 32)
    cfg.TRAIN.dynamic_saliency_relative_size = 0.5
    bd = BucketedDeform.from_cfg(cfg)
    m = bd.module_for((64, 64))
    # task derived from the bucket, saliency at half the task size
    assert m.config.saliency_hw == (m.config.task_hw[0] // 2, m.config.task_hw[1] // 2)


def test_apply_pads_to_bucket_one_executable():
    """apply() pads raw inputs up to the bucket canvas so every raw (H, W)
    in a bucket traces the SAME shapes (one executable per bucket), and the
    gaze point is rescaled onto the padded canvas."""
    import jax
    import jax.numpy as jnp

    b = BucketedDeform(
        DeformConfig(
            gaussian_radius=5, task_hw=(16, 16), task_hw_infer=(16, 16),
            saliency_hw=(16, 16), arch_encoder="hrnetv2_nodownsp_tiny",
        ),
        (16, 16),
    )
    x1 = jnp.ones((1, 60, 62, 3), jnp.float32)
    f = jnp.full((1, 2), 0.5, jnp.float32)
    m = b.module_for((60, 62))
    variables = m.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)), f)

    shapes_seen = []
    orig_apply = type(m).apply

    def spy(self, v, x, fp, **kw):
        shapes_seen.append(tuple(x.shape))
        return orig_apply(self, v, x, fp, **kw)

    type(m).apply = spy
    try:
        out1 = b.apply(variables, x1, f)
        out2 = b.apply(variables, jnp.ones((1, 58, 64, 3), jnp.float32), f)
    finally:
        type(m).apply = orig_apply
    # both raw sizes entered the module at the SAME padded bucket shape
    assert shapes_seen == [(1, 64, 64, 3), (1, 64, 64, 3)]
    assert out1["pred"].shape == out2["pred"].shape
    assert np.isfinite(np.asarray(out1["pred"], dtype=np.float32)).all()
