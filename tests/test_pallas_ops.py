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


def test_pallas_class_jfa_matches_payload_variant(rng):
    from fovealseg_tpu.ops.pallas_jfa import nearest_class_pallas

    valid = rng.uniform(0, 1, (2, 32, 32)) > 0.9
    valid[:, 0, 0] = True
    cls = rng.integers(0, 51, (2, 32, 32)).astype(np.int32)
    packed = np.asarray(
        nearest_class_pallas(jnp.asarray(valid), jnp.asarray(cls), cls_bits=6,
                             interpret=True)
    )
    two_roll = np.asarray(
        nearest_payload_pallas(jnp.asarray(valid), jnp.asarray(cls), interpret=True)
    )
    # identical candidate order + identical integer distances -> identical
    # winners, so the packed variant must match the two-roll variant exactly
    np.testing.assert_array_equal(packed, two_roll)


def test_pallas_class_jfa_runtime_rounds(rng):
    from fovealseg_tpu.ops.pallas_jfa import nearest_class_pallas

    valid = rng.uniform(0, 1, (1, 16, 16)) > 0.7
    valid[:, 3, 3] = True
    cls = rng.integers(0, 4, (1, 16, 16)).astype(np.int32)
    full = np.asarray(
        nearest_class_pallas(jnp.asarray(valid), jnp.asarray(cls), cls_bits=2,
                             interpret=True)
    )
    capped = np.asarray(
        nearest_class_pallas(jnp.asarray(valid), jnp.asarray(cls), cls_bits=2,
                             rounds=jnp.int32(4), interpret=True)
    )
    # 4 rounds cover the full 16x16 extent -> same result
    np.testing.assert_array_equal(full, capped)


def test_pallas_relpay_jfa_matches_payload_variant(rng):
    """'relpay' (relative-offset packed, one roll) must match the two-array
    variant exactly: identical candidate order and integer distances imply
    identical winners, only the position encoding differs."""
    from fovealseg_tpu.ops.pallas_jfa import nearest_payload_packed_pallas

    valid = rng.uniform(0, 1, (2, 64, 64)) > 0.97
    valid[:, 5, 7] = True
    pay = rng.integers(0, 6400, (2, 64, 64)).astype(np.int32)
    rel = np.asarray(
        nearest_payload_packed_pallas(
            jnp.asarray(valid), jnp.asarray(pay), pay_bits=13,
            rounds=jnp.int32(6), interpret=True)
    )
    two = np.asarray(
        nearest_payload_pallas(jnp.asarray(valid), jnp.asarray(pay),
                               rounds=jnp.int32(6), interpret=True)
    )
    np.testing.assert_array_equal(rel, two)


def test_pallas_relpay_round_fallback(rng):
    """rounds > REL_MAX_ROUNDS must take the lax.cond two-array branch (the
    offset fields cannot represent the displacement) and still be exact."""
    from fovealseg_tpu.ops.pallas_jfa import (
        REL_MAX_ROUNDS,
        nearest_payload_packed_pallas,
    )

    valid = np.zeros((1, 512, 512), bool)
    valid[:, 2, 3] = True  # single far seed: needs the full chain
    pay = np.full((1, 512, 512), 4321, np.int32)
    out = np.asarray(
        nearest_payload_packed_pallas(
            jnp.asarray(valid), jnp.asarray(pay), pay_bits=13,
            rounds=jnp.int32(REL_MAX_ROUNDS + 2), interpret=True)
    )
    np.testing.assert_array_equal(out, pay)


def test_unaligned_canvas_padding_matches_lax(rng):
    """Lane-unaligned canvases (e.g. 320^2 under segm_downsampling_rate=2 +
    loss_at_high_res) run the Pallas JFA on a vreg-padded tile (Mosaic's
    dynamic_rotate needs W%128==0, H%8==0); invalid-seed padding must leave
    the original region's distances/payloads unchanged."""
    from fovealseg_tpu.core.unwarp import (
        _pad_to_vreg,
        nearest_seed_jfa,
        nearest_seed_payload,
    )
    from fovealseg_tpu.ops.pallas_jfa import (
        nearest_payload_packed_pallas,
        nearest_seed_pallas,
    )

    h = w = 72  # not multiples of 8*?/128
    valid = rng.uniform(0, 1, (1, h, w)) > 0.95
    valid[:, 3, 5] = True
    pay = rng.integers(0, 6400, (1, h, w)).astype(np.int32)

    (v, p), hw = _pad_to_vreg([jnp.asarray(valid), jnp.asarray(pay)], [False, 0])
    assert v.shape == (1, 72, 128) and hw == (72, 72)

    # seed kernel on the padded tile == lax chain on the original (distances)
    out = np.asarray(nearest_seed_pallas(v, interpret=True))
    pw = v.shape[-1]
    out = ((out // pw) * w + out % pw)[:, :h, :w]
    lax_out = np.asarray(nearest_seed_jfa(jnp.asarray(valid)))
    ys, xs = np.mgrid[0:h, 0:w]

    def d2(flat):
        return (flat // w - ys) ** 2 + (flat % w - xs) ** 2

    np.testing.assert_array_equal(d2(out[0]), d2(lax_out[0]))

    # relpay payload kernel on the padded tile: payloads of nearest seeds
    rel = np.asarray(nearest_payload_packed_pallas(
        v, p, pay_bits=13, rounds=jnp.int32(7), interpret=True))[:, :h, :w]
    ref = np.asarray(nearest_seed_payload(jnp.asarray(valid), jnp.asarray(pay)))
    assert (rel == ref).mean() > 0.95  # tie-breaks may differ
    assert set(rel.reshape(-1).tolist()) <= set(pay[valid].tolist())
