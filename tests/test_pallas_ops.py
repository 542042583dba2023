"""Pallas-kernel vs lax-reference equivalence (interpret mode on CPU)."""

import jax.numpy as jnp
import numpy as np

from fovealseg_tpu.core.unwarp import nearest_seed_jfa
from fovealseg_tpu.ops.pallas_jfa import nearest_seed_pallas


def test_pallas_jfa_matches_lax(rng):
    valid = rng.uniform(0, 1, (2, 32, 32)) > 0.92
    valid[:, 0, 0] = True
    lax_out = np.asarray(nearest_seed_jfa(jnp.asarray(valid)))
    pl_out = np.asarray(nearest_seed_pallas(jnp.asarray(valid), interpret=True))
    # distances must agree (seed identity may tie-break differently)
    ys, xs = np.mgrid[0:32, 0:32]

    def d2(flat):
        return (flat // 32 - ys) ** 2 + (flat % 32 - xs) ** 2

    for b in range(2):
        np.testing.assert_array_equal(d2(lax_out[b]), d2(pl_out[b]))
