"""On-chip probe: Winograd F(2x2,3x3) vs XLA direct conv, in context.

Times a stack of DEPTH conv+BN+ReLU layers (the BasicBlock fabric of the
flagship encoder's 64-channel branch) with both conv implementations,
using the differential chained-timing harness (benchmarks/timing.py).
The conv_pack experiment showed isolated-conv wins can be in-context
losses, so the stack includes the BN/ReLU elementwise work XLA fuses.

Usage: python benchmarks/winograd_probe.py [channels] [hw] [depth]
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
from fovealseg_tpu.models.winograd import winograd_conv3x3

C = int(sys.argv[1]) if len(sys.argv) > 1 else 64
HW = int(sys.argv[2]) if len(sys.argv) > 2 else 80
DEPTH = int(sys.argv[3]) if len(sys.argv) > 3 else 16
B = 8
DTYPE = jnp.bfloat16


def direct_conv(x, ker):
    dn = jax.lax.conv_dimension_numbers(x.shape, ker.shape, ("NHWC", "HWIO", "NHWC"))
    return jax.lax.conv_general_dilated(
        x, ker, (1, 1), ((1, 1), (1, 1)), dimension_numbers=dn
    )


def make_stack(conv_fn, kers, scales, biases):
    def f(x):
        for ker, s, bb in zip(kers, scales, biases):
            x = conv_fn(x, ker)
            x = jax.nn.relu(x * s + bb)  # folded-BN elementwise tail
        return x

    return f


def main():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((B, HW, HW, C)) * 0.1, DTYPE)
    kers = [
        jnp.asarray(rng.standard_normal((3, 3, C, C)) * (2.0 / (9 * C)) ** 0.5, DTYPE)
        for _ in range(DEPTH)
    ]
    scales = [jnp.asarray(rng.standard_normal((C,)) * 0.1 + 1.0, DTYPE) for _ in range(DEPTH)]
    biases = [jnp.asarray(rng.standard_normal((C,)) * 0.1, DTYPE) for _ in range(DEPTH)]

    gflop = 2 * B * HW * HW * C * C * 9 * DEPTH / 1e9
    for name, fn in [
        ("direct ", make_stack(direct_conv, kers, scales, biases)),
        ("winograd", make_stack(winograd_conv3x3, kers, scales, biases)),
    ]:
        dt = time_op(fn, x, n1=5, n2=25)
        print(
            f"{name} C={C} {HW}x{HW} depth={DEPTH} b{B}: {dt*1e3:.3f} ms "
            f"({gflop/dt/1e3:.1f} TF/s direct-equivalent)",
            flush=True,
        )


if __name__ == "__main__":
    main()
