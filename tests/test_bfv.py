"""BFV end-to-end tests with plaintext-recompute oracles.

Mirrors the reference test strategy (SURVEY §4: test_bfv_encoding /
encryption / addition / multiplication / relinearization / rotation run
encode→encrypt→op→decrypt→decode and EXPECT_EQ against plain recomputation,
at sec_level none so small parameters are allowed)."""

import numpy as np
import pytest

from heongpu_tpu.models import bfv
from heongpu_tpu.utils import rng, params

RNG = np.random.default_rng(7)


def _ctx_small():
    # n=1024, t ≡ 1 mod 2048, 3 x 29-bit Q primes
    t = params.plain_modulus_for(1024, 20)
    return bfv.make_context(1024, t, q_bits=[29, 29, 29], sec_level="none")


CTX = _ctx_small()
SK = bfv.keygen_secret(CTX, rng.new_key(1))
PK = bfv.keygen_public(CTX, rng.new_key(2), SK)


def _msg(ctx):
    return RNG.integers(0, ctx.t, size=ctx.n, dtype=np.int64)


def test_encode_decode_roundtrip():
    m = _msg(CTX)
    np.testing.assert_array_equal(bfv.decode(CTX, bfv.encode(CTX, m)),
                                  m.astype(np.uint32))


def test_encrypt_decrypt():
    m = _msg(CTX)
    ct = bfv.encrypt(CTX, PK, bfv.encode(CTX, m), rng.new_key(3))
    got = bfv.decode(CTX, bfv.decrypt(CTX, SK, ct))
    np.testing.assert_array_equal(got, m.astype(np.uint32))


def test_noise_budget_positive():
    m = _msg(CTX)
    ct = bfv.encrypt(CTX, PK, bfv.encode(CTX, m), rng.new_key(4))
    nb = bfv.noise_budget(CTX, SK, ct)
    assert nb > 20, f"fresh ciphertext noise budget too small: {nb}"


def test_add_sub():
    m1, m2 = _msg(CTX), _msg(CTX)
    ct1 = bfv.encrypt(CTX, PK, bfv.encode(CTX, m1), rng.new_key(5))
    ct2 = bfv.encrypt(CTX, PK, bfv.encode(CTX, m2), rng.new_key(6))
    got = bfv.decode(CTX, bfv.decrypt(CTX, SK, bfv.add(CTX, ct1, ct2)))
    np.testing.assert_array_equal(got, ((m1 + m2) % CTX.t).astype(np.uint32))
    got = bfv.decode(CTX, bfv.decrypt(CTX, SK, bfv.sub(CTX, ct1, ct2)))
    np.testing.assert_array_equal(got, ((m1 - m2) % CTX.t).astype(np.uint32))


def test_add_plain_mult_plain():
    m1, m2 = _msg(CTX), _msg(CTX)
    ct = bfv.encrypt(CTX, PK, bfv.encode(CTX, m1), rng.new_key(8))
    pt2 = bfv.encode(CTX, m2)
    got = bfv.decode(CTX, bfv.decrypt(CTX, SK, bfv.add_plain(CTX, ct, pt2)))
    np.testing.assert_array_equal(got, ((m1 + m2) % CTX.t).astype(np.uint32))
    got = bfv.decode(CTX, bfv.decrypt(CTX, SK, bfv.multiply_plain(CTX, ct, pt2)))
    np.testing.assert_array_equal(got, (m1 * m2 % CTX.t).astype(np.uint32))


def test_multiply_relinearize():
    m1, m2 = _msg(CTX), _msg(CTX)
    rk = bfv.keygen_relin(CTX, rng.new_key(9), SK)
    ct1 = bfv.encrypt(CTX, PK, bfv.encode(CTX, m1), rng.new_key(10))
    ct2 = bfv.encrypt(CTX, PK, bfv.encode(CTX, m2), rng.new_key(11))
    ct3 = bfv.multiply(CTX, ct1, ct2)
    want = (m1 * m2 % CTX.t).astype(np.uint32)
    # decrypt the 3-poly ciphertext directly
    got = bfv.decode(CTX, bfv.decrypt(CTX, SK, ct3))
    np.testing.assert_array_equal(got, want)
    # and after relinearization
    ct2p = bfv.relinearize(CTX, ct3, rk)
    got = bfv.decode(CTX, bfv.decrypt(CTX, SK, ct2p))
    np.testing.assert_array_equal(got, want)
    assert bfv.noise_budget(CTX, SK, ct2p) > 5


def test_rotate_rows_columns():
    m = _msg(CTX)
    gk = bfv.keygen_galois(CTX, rng.new_key(12), SK, steps=[1, 2, -1])
    ct = bfv.encrypt(CTX, PK, bfv.encode(CTX, m), rng.new_key(13))
    half = CTX.n // 2
    rows = m.reshape(2, half)

    got = bfv.decode(CTX, bfv.decrypt(CTX, SK, bfv.rotate_rows(CTX, ct, gk, 1)))
    want = np.concatenate([np.roll(rows[0], -1), np.roll(rows[1], -1)])
    np.testing.assert_array_equal(got, want.astype(np.uint32))

    got = bfv.decode(CTX, bfv.decrypt(CTX, SK, bfv.rotate_columns(CTX, ct, gk)))
    want = np.concatenate([rows[1], rows[0]])
    np.testing.assert_array_equal(got, want.astype(np.uint32))


def test_switch_key():
    m = _msg(CTX)
    sk2 = bfv.keygen_secret(CTX, rng.new_key(14))
    swk = bfv.keygen_switch(CTX, rng.new_key(15), SK, sk2)
    ct = bfv.encrypt(CTX, PK, bfv.encode(CTX, m), rng.new_key(16))
    ct2 = bfv.switch_key(CTX, ct, swk)
    got = bfv.decode(CTX, bfv.decrypt(CTX, sk2, ct2))
    np.testing.assert_array_equal(got, m.astype(np.uint32))


def test_method2_keyswitch():
    """Hybrid Method-II relinearization and rotation (reference METHOD_II)."""
    from heongpu_tpu.utils import params as prm
    t2 = prm.plain_modulus_for(1024, 20)
    ctx2 = bfv.make_context(1024, t2, q_bits=[29, 29, 29, 29], sec_level="none",
                            ks_type="II", alpha=2)
    sk = bfv.keygen_secret(ctx2, rng.new_key(80))
    pk = bfv.keygen_public(ctx2, rng.new_key(81), sk)
    rk = bfv.keygen_relin(ctx2, rng.new_key(82), sk)
    gk = bfv.keygen_galois(ctx2, rng.new_key(83), sk, steps=[1])
    m1 = RNG.integers(0, ctx2.t, size=ctx2.n, dtype=np.int64)
    m2 = RNG.integers(0, ctx2.t, size=ctx2.n, dtype=np.int64)
    ct1 = bfv.encrypt(ctx2, pk, bfv.encode(ctx2, m1), rng.new_key(84))
    ct2 = bfv.encrypt(ctx2, pk, bfv.encode(ctx2, m2), rng.new_key(85))
    ct3 = bfv.relinearize(ctx2, bfv.multiply(ctx2, ct1, ct2), rk)
    got = bfv.decode(ctx2, bfv.decrypt(ctx2, sk, ct3))
    np.testing.assert_array_equal(got, (m1 * m2 % ctx2.t).astype(np.uint32))
    rot = bfv.rotate_rows(ctx2, ct3, gk, 1)
    got = bfv.decode(ctx2, bfv.decrypt(ctx2, sk, rot))
    half = ctx2.n // 2
    rows = (m1 * m2 % ctx2.t).reshape(2, half)
    want = np.concatenate([np.roll(rows[0], -1), np.roll(rows[1], -1)])
    np.testing.assert_array_equal(got, want.astype(np.uint32))


def test_hoisted_rotations_and_custom_elts():
    """BFV hoisting (decompose once, rotate many) + custom Galois elements
    (reference fast rotations / custom-elt keygen)."""
    from heongpu_tpu.ops import polyops
    from heongpu_tpu.utils import params as prm
    n = 1024
    t = prm.plain_modulus_for(n, 17)
    ctx = bfv.make_context(n, t, q_bits=[29, 29], sec_level="none")
    sk = bfv.keygen_secret(ctx, rng.new_key(501))
    pk = bfv.keygen_public(ctx, rng.new_key(502), sk)
    gk = bfv.keygen_galois(ctx, rng.new_key(503), sk, steps=[1, 3])
    m = (np.arange(n, dtype=np.uint64) * 7) % t
    ct = bfv.encrypt(ctx, pk, bfv.encode(ctx, m), rng.new_key(504))
    d = bfv.hoist(ctx, ct)
    for s in (1, 3):
        g = polyops.steps_to_galois_elt(s, n)
        got = bfv.decode(ctx, bfv.decrypt(
            ctx, sk, bfv.rotate_rows_hoisted(ctx, ct, d, gk.keys[g])))
        want = np.concatenate([np.roll(m[: n // 2], -s),
                               np.roll(m[n // 2:], -s)])
        np.testing.assert_array_equal(got, want)
    g5 = polyops.steps_to_galois_elt(5, n)
    gk2 = bfv.keygen_galois(ctx, rng.new_key(505), sk, elts=[g5])
    assert g5 in gk2.keys


def test_hoisted_rotations_method2():
    """BFV hoisting over a Method-II (hybrid) context: grouped FastBconv
    digits + multi-stage exact /P (reference hoists both methods,
    operator.cu:4674/5092)."""
    from heongpu_tpu.ops import polyops
    from heongpu_tpu.utils import params as prm
    n = 1024
    t = prm.plain_modulus_for(n, 17)
    ctx = bfv.make_context(n, t, q_bits=[29] * 4, sec_level="none",
                           ks_type="II", alpha=2)
    sk = bfv.keygen_secret(ctx, rng.new_key(511))
    pk = bfv.keygen_public(ctx, rng.new_key(512), sk)
    gk = bfv.keygen_galois(ctx, rng.new_key(513), sk, steps=[1, 3])
    m = (np.arange(n, dtype=np.uint64) * 11) % t
    ct = bfv.encrypt(ctx, pk, bfv.encode(ctx, m), rng.new_key(514))
    d = bfv.hoist(ctx, ct)
    for s in (1, 3):
        g = polyops.steps_to_galois_elt(s, n)
        got = bfv.decode(ctx, bfv.decrypt(
            ctx, sk, bfv.rotate_rows_hoisted(ctx, ct, d, gk.keys[g])))
        want = np.concatenate([np.roll(m[: n // 2], -s),
                               np.roll(m[n // 2:], -s)])
        np.testing.assert_array_equal(got, want)


def test_inv_form_galois_bfv():
    """Inverse-form keys: simple + hoisted rotations match normal keys'
    results (BFV, both keyswitch methods dispatch the same GaloisKeyOne)."""
    from heongpu_tpu.ops import polyops
    n = 1024
    t = params.plain_modulus_for(n, 20)
    ctx = bfv.make_context(n, t, q_bits=[29, 29, 29], sec_level="none",
                           ks_type="II", alpha=2)
    sk = bfv.keygen_secret(ctx, rng.new_key(801))
    pk = bfv.keygen_public(ctx, rng.new_key(802), sk)
    gki = bfv.keygen_galois(ctx, rng.new_key(803), sk, steps=[1],
                            inv_form=True)
    m = np.arange(n) % 17
    ct = bfv.encrypt(ctx, pk, bfv.encode(ctx, m), rng.new_key(804))
    got = bfv.decode(ctx, bfv.decrypt(ctx, sk, bfv.rotate_rows(ctx, ct, gki, 1)))
    half = n // 2
    want = np.concatenate([np.roll(m[:half], -1), np.roll(m[half:], -1)])
    np.testing.assert_array_equal(got, want)
    d = bfv.hoist(ctx, ct)
    g = polyops.steps_to_galois_elt(1, ctx.n)
    got = bfv.decode(ctx, bfv.decrypt(
        ctx, sk, bfv.rotate_rows_hoisted(ctx, ct, d, gki.keys[g])))
    np.testing.assert_array_equal(got, want)
