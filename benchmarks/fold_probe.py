"""On-chip probe: batch->channel folding of the 64-ch 80x80 conv fabric.

The flagship encoder's cost floor is its 64-channel stride-1 branch — the
MXU is 128 lanes wide, so N=64 output channels cap those convs at ~50%
lane utilization (PERF.md lane analysis; conv_pack, int8, fused-Pallas and
Winograd all measured negative). This probe measures the one untried lever
(round-4 verdict #4): fold PAIRS of batch items into channels so the conv
runs at 128 lanes — b8 x 64ch -> b4 x 128ch — with sample separation kept
by ``feature_group_count=2`` (weights shared across the two groups by
replication, so the math is identical to the unfolded batch).

Variants (stack of DEPTH conv+folded-BN+ReLU layers, the BasicBlock fabric):
  unfolded     [8,80,80,64] -> 64, dense        (the production layout)
  fold-grouped [4,80,80,128] -> 128, groups=2   (the candidate: exact math)
  fold-blockdiag [4,80,80,128] -> 128, dense with materialized
               block-diagonal weights          (exact math; measures whether
               a dense N=128 matmul at 2x the MACs beats lane-starved N=64)
  dense-128 control [4,80,80,128] -> 128 dense (NOT the same math — the
               lane-ideal ceiling the fold could at best reach)

Usage: python benchmarks/fold_probe.py [hw] [depth]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_fovealseg")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from benchmarks.timing import time_op

HW = int(sys.argv[1]) if len(sys.argv) > 1 else 80
DEPTH = int(sys.argv[2]) if len(sys.argv) > 2 else 16
B = 8
C = 64
DTYPE = jnp.bfloat16


def conv(x, ker, groups=1):
    dn = jax.lax.conv_dimension_numbers(x.shape, ker.shape, ("NHWC", "HWIO", "NHWC"))
    return jax.lax.conv_general_dilated(
        x, ker, (1, 1), ((1, 1), (1, 1)), dimension_numbers=dn,
        feature_group_count=groups,
    )


def stack(kers, scales, biases, groups=1):
    def f(x):
        for ker, s, bb in zip(kers, scales, biases):
            x = jax.nn.relu(conv(x, ker, groups) * s + bb)
        return x

    return f


def main():
    rng = np.random.default_rng(0)
    x8 = jnp.asarray(rng.standard_normal((B, HW, HW, C)) * 0.1, DTYPE)
    # folded layout: samples (0,1)->channels of folded item 0, etc.
    x4 = jnp.concatenate([x8[0::2], x8[1::2]], axis=-1)

    kers = [
        jnp.asarray(rng.standard_normal((3, 3, C, C)) * (2.0 / (9 * C)) ** 0.5, DTYPE)
        for _ in range(DEPTH)
    ]
    sc = [jnp.asarray(rng.standard_normal((C,)) * 0.1 + 1.0, DTYPE) for _ in range(DEPTH)]
    bi = [jnp.asarray(rng.standard_normal((C,)) * 0.1, DTYPE) for _ in range(DEPTH)]

    # grouped: HWIO with I=C (per-group in-channels), O=2C; same kernel both groups
    kers_g = [jnp.concatenate([k, k], axis=-1) for k in kers]
    # block-diagonal dense 128->128
    z = jnp.zeros((3, 3, C, C), DTYPE)
    kers_bd = [
        jnp.concatenate(
            [jnp.concatenate([k, z], axis=-1), jnp.concatenate([z, k], axis=-1)],
            axis=2,
        )
        for k in kers
    ]
    kers_d128 = [
        jnp.asarray(rng.standard_normal((3, 3, 2 * C, 2 * C)) * (2.0 / (9 * 2 * C)) ** 0.5, DTYPE)
        for _ in range(DEPTH)
    ]
    sc2 = [jnp.concatenate([s, s]) for s in sc]
    bi2 = [jnp.concatenate([b, b]) for b in bi]

    # exactness: grouped and block-diagonal folds must match the unfolded math
    ref = stack(kers, sc, bi)(x8)
    ref_fold = jnp.concatenate([ref[0::2], ref[1::2]], axis=-1)
    for name, got in [
        ("grouped", stack(kers_g, sc2, bi2, groups=2)(x4)),
        ("blockdiag", stack(kers_bd, sc2, bi2)(x4)),
    ]:
        err = float(jnp.max(jnp.abs(got.astype(jnp.float32) - ref_fold.astype(jnp.float32))))
        print(f"exactness {name}: max abs err {err:.3e}", flush=True)
        # grouped is bit-identical math; blockdiag reassociates the bf16
        # accumulation over 128 inputs (64 zeros), so 16 layers drift ~1e-2
        assert err < (5e-2 if name == "blockdiag" else 1e-3), (name, err)

    gflop = 2 * B * HW * HW * C * C * 9 * DEPTH / 1e9  # useful FLOPs (all variants)
    runs = [
        ("unfolded  b8x64 dense  ", stack(kers, sc, bi), x8),
        ("fold-grouped b4x128 g2 ", stack(kers_g, sc2, bi2, groups=2), x4),
        ("fold-blockdiag b4x128  ", stack(kers_bd, sc2, bi2), x4),
        ("dense-128 control b4   ", stack(kers_d128, sc2, bi2), x4),
    ]
    for name, fn, xin in runs:
        dt = time_op(fn, xin, n1=5, n2=25)
        print(
            f"{name}: {dt*1e3:.3f} ms ({gflop/dt/1e3:.1f} TF/s useful)",
            flush=True,
        )


if __name__ == "__main__":
    main()
