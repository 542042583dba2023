"""Shape-bucketed dynamic task sizing (TRAIN.dynamic_task_input).

The reference's ``re_initialise`` (models/models.py:557-592) mutates the
module's grid geometry per input size for variable-resolution datasets
(pcahisto). Under XLA, dynamic shapes mean recompilation — the TPU-native
equivalent is shape bucketing: each distinct (rounded) input size gets its
own ``DeformConfig``/module, and jit's trace cache holds one executable per
bucket (SURVEY.md §7 "dynamic-input re-init becomes shape-bucketed jit").
"""

from __future__ import annotations

import dataclasses

from fovealseg_tpu.models.deform_module import DeformConfig, DeformSegmentation


def derive_task_size(this_hw: tuple[int, int], dynamic_task_input: tuple[int, int]) -> tuple[int, int]:
    """re_initialise's task-size rule (models/models.py:560-572): scale the
    input down by whichever of the short/long-edge ratios yields the smaller
    task area."""
    short, long_ = min(this_hw), max(this_hw)
    r1 = max(short // min(dynamic_task_input), 1)
    r2 = max(long_ // max(dynamic_task_input), 1)
    s1 = (this_hw[0] // r1, this_hw[1] // r1)
    s2 = (this_hw[0] // r2, this_hw[1] // r2)
    return s1 if s1[0] * s1[1] < s2[0] * s2[1] else s2


def round_bucket(hw: tuple[int, int], multiple: int = 32) -> tuple[int, int]:
    """Round a size up to the bucket grid to bound executable count."""
    r = lambda x: ((x - 1) // multiple + 1) * multiple
    return (r(hw[0]), r(hw[1]))


class BucketedDeform:
    """Per-input-size module cache for variable-resolution inference.

    Usage: ``BucketedDeform(base_cfg, params_fn)(x, f)`` — picks/builds the
    module whose task geometry matches ``x``'s (bucketed) shape and runs it;
    jit compiles once per bucket.
    """

    @classmethod
    def from_cfg(cls, cfg) -> "BucketedDeform":
        """Construct from the YACS tree: TRAIN.dynamic_task_input sizes the
        buckets and TRAIN.dynamic_saliency_relative_size scales the saliency
        input relative to the derived task size (re_initialise,
        models/models.py:560-572 and :570 saliency scaling)."""
        return cls(
            DeformConfig.from_cfg(cfg),
            tuple(cfg.TRAIN.dynamic_task_input),
            saliency_relative=float(cfg.TRAIN.dynamic_saliency_relative_size),
        )

    def __init__(self, base: DeformConfig, dynamic_task_input: tuple[int, int],
                 saliency_relative: float = 1.0, bucket_multiple: int = 32):
        self.base = base
        self.dynamic_task_input = dynamic_task_input
        self.saliency_relative = saliency_relative
        self.bucket_multiple = bucket_multiple
        self._modules: dict[tuple[int, int], DeformSegmentation] = {}

    def module_for(self, input_hw: tuple[int, int]) -> DeformSegmentation:
        bucket = round_bucket(input_hw, self.bucket_multiple)
        if bucket not in self._modules:
            task = derive_task_size(bucket, self.dynamic_task_input)
            sal = (int(task[0] * self.saliency_relative), int(task[1] * self.saliency_relative))
            cfg = dataclasses.replace(
                self.base, task_hw=task, task_hw_infer=task, saliency_hw=sal
            )
            self._modules[bucket] = DeformSegmentation(config=cfg)
        return self._modules[bucket]

    def apply(self, variables, x, focus_point, **kwargs):
        """Pad the input up to its bucket canvas and run that bucket's module.

        Without the pad, every distinct raw (H, W) would trace a fresh
        executable and bucketing would only bound module count, not compiles
        — the whole point is one executable per bucket. Zero padding matches
        the reference cookers' canvas pad (b2:310-315); the normalized gaze
        point is rescaled onto the padded canvas, and any ``y=`` label is
        zero-padded (background) the same way. Outputs are in padded-canvas
        coordinates; slice ``[:, :H, :W]`` to recover the raw frame.
        """
        import jax.numpy as jnp

        h, w = int(x.shape[1]), int(x.shape[2])
        bh, bw = round_bucket((h, w), self.bucket_multiple)
        module = self.module_for((h, w))
        if (bh, bw) != (h, w):
            x = jnp.pad(x, ((0, 0), (0, bh - h), (0, bw - w), (0, 0)))
            focus_point = focus_point * jnp.asarray(
                [h / bh, w / bw], dtype=focus_point.dtype
            )
            y = kwargs.get("y")
            if y is not None:
                kwargs = dict(kwargs)
                kwargs["y"] = jnp.pad(y, ((0, 0), (0, bh - h), (0, bw - w)))
        return module.apply(variables, x, focus_point, **kwargs)
