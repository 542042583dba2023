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
