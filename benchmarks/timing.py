"""Shared on-chip timing: RTT-corrected fori_loop chaining.

This image's TPU tunnel does not honor ``block_until_ready`` and adds a
~30 ms fixed round-trip to every host-visible call (dispatch + fetch). The
round-1 harness chained N executions in one ``fori_loop`` but divided the
*total* (fixed cost included) by N — at N=10..30 that inflated every number
by ~1-3 ms/iter and made small ops look like ~1 ms each.

Correct method used here: run the same chained program at two iteration
counts and report ``(t(n2) - t(n1)) / (n2 - n1)`` (median over repeats) —
the fixed per-call cost cancels exactly. Verified against the MXU roofline:
4096^3 bf16 matmul measures ~186 TF/s (v5e peak ~197) where the old method
reported 39 TF/s at n=10.
"""

from __future__ import annotations

import statistics
import time

import jax
import jax.numpy as jnp


def chained_runner(fn, iters: int):
    """jit a program that runs ``fn(args0 + carry, *rest)`` ``iters`` times,
    serialized by a scalar carry dependency."""

    def chained(*a):
        def body(_, carry):
            out = fn(a[0] + carry, *a[1:])
            leaves = jax.tree.leaves(out)
            s = sum(jnp.sum(l).astype(jnp.float32) for l in leaves)
            return (s * 0).astype(a[0].dtype)

        return jax.lax.fori_loop(0, iters, body, jnp.asarray(0, a[0].dtype))

    return jax.jit(chained)


def time_op(fn, *args, n1: int = 10, n2: int = 60, reps: int = 3) -> float:
    """Seconds per execution of ``fn(*args)``, fixed per-call cost removed."""
    r1, r2 = chained_runner(fn, n1), chained_runner(fn, n2)
    float(r1(*args))
    float(r2(*args))
    deltas = []
    for _ in range(reps):
        t0 = time.perf_counter()
        float(r1(*args))
        t1 = time.perf_counter() - t0
        t0 = time.perf_counter()
        float(r2(*args))
        t2 = time.perf_counter() - t0
        deltas.append((t2 - t1) / (n2 - n1))
    return statistics.median(deltas)
