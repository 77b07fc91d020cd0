"""CKKS end-to-end tests (closeness oracles like the reference test_ckks_*)."""

import numpy as np
import pytest

from heongpu_tpu.models import ckks
from heongpu_tpu.utils import rng

RNG = np.random.default_rng(21)


def _ctx():
    # n=1024: q0 29-bit, three 25-bit scale primes, scale 2^25
    return ckks.make_context(1024, [29, 25, 25, 25], scale_bits=25, sec_level="none")


CTX = _ctx()
SK = ckks.keygen_secret(CTX, rng.new_key(31))
PK = ckks.keygen_public(CTX, rng.new_key(32), SK)


def _msg(scale=1.0):
    half = CTX.n // 2
    return (RNG.uniform(-scale, scale, half)
            + 1j * RNG.uniform(-scale, scale, half))


def test_encode_decode_roundtrip():
    z = _msg()
    got = ckks.decode(CTX, ckks.encode(CTX, z))
    np.testing.assert_allclose(got, z, atol=2e-5)


def test_encrypt_decrypt():
    z = _msg()
    ct = ckks.encrypt(CTX, PK, ckks.encode(CTX, z), rng.new_key(33))
    got = ckks.decode(CTX, ckks.decrypt(CTX, SK, ct))
    np.testing.assert_allclose(got, z, atol=5e-4)


def test_add_sub():
    z1, z2 = _msg(), _msg()
    ct1 = ckks.encrypt(CTX, PK, ckks.encode(CTX, z1), rng.new_key(34))
    ct2 = ckks.encrypt(CTX, PK, ckks.encode(CTX, z2), rng.new_key(35))
    got = ckks.decode(CTX, ckks.decrypt(CTX, SK, ckks.add(CTX, ct1, ct2)))
    np.testing.assert_allclose(got, z1 + z2, atol=1e-3)
    got = ckks.decode(CTX, ckks.decrypt(CTX, SK, ckks.sub(CTX, ct1, ct2)))
    np.testing.assert_allclose(got, z1 - z2, atol=1e-3)


def test_multiply_relin_rescale():
    z1, z2 = _msg(), _msg()
    rk = ckks.keygen_relin(CTX, rng.new_key(36), SK)
    ct1 = ckks.encrypt(CTX, PK, ckks.encode(CTX, z1), rng.new_key(37))
    ct2 = ckks.encrypt(CTX, PK, ckks.encode(CTX, z2), rng.new_key(38))
    ct3 = ckks.rescale(CTX, ckks.relinearize(CTX, ckks.multiply(CTX, ct1, ct2), rk))
    assert ct3.level == 1 and ct3.size == 2
    got = ckks.decode(CTX, ckks.decrypt(CTX, SK, ct3))
    np.testing.assert_allclose(got, z1 * z2, atol=5e-3)


def test_multiply_plain_and_depth2():
    z1, z2, z3 = _msg(), _msg(), _msg()
    rk = ckks.keygen_relin(CTX, rng.new_key(39), SK)
    ct1 = ckks.encrypt(CTX, PK, ckks.encode(CTX, z1), rng.new_key(40))
    pt2 = ckks.encode(CTX, z2)
    prod = ckks.rescale(CTX, ckks.multiply_plain(CTX, ct1, pt2))
    got = ckks.decode(CTX, ckks.decrypt(CTX, SK, prod))
    np.testing.assert_allclose(got, z1 * z2, atol=5e-3)
    # depth-2: (z1*z2) * z3
    ct3 = ckks.encrypt(CTX, PK, ckks.encode(CTX, z3), rng.new_key(41))
    ct3 = ckks.rescale(CTX, ckks.multiply_plain(CTX, ct3,
                                                ckks.encode(CTX, np.ones(CTX.n // 2))))
    out = ckks.rescale(CTX, ckks.relinearize(CTX, ckks.multiply(CTX, prod, ct3), rk))
    got = ckks.decode(CTX, ckks.decrypt(CTX, SK, out))
    np.testing.assert_allclose(got, z1 * z2 * z3, atol=5e-2)


def test_add_plain_scale_match():
    z1, z2 = _msg(), _msg()
    ct = ckks.encrypt(CTX, PK, ckks.encode(CTX, z1), rng.new_key(42))
    pt = ckks.encode(CTX, z2, scale=ct.scale)
    got = ckks.decode(CTX, ckks.decrypt(CTX, SK, ckks.add_plain(CTX, ct, pt)))
    np.testing.assert_allclose(got, z1 + z2, atol=1e-3)


def test_rotate_conjugate():
    z = _msg()
    gk = ckks.keygen_galois(CTX, rng.new_key(43), SK, steps=[1, 2])
    ct = ckks.encrypt(CTX, PK, ckks.encode(CTX, z), rng.new_key(44))
    got = ckks.decode(CTX, ckks.decrypt(CTX, SK, ckks.rotate(CTX, ct, gk, 1)))
    np.testing.assert_allclose(got, np.roll(z, -1), atol=2e-3)
    got = ckks.decode(CTX, ckks.decrypt(CTX, SK, ckks.rotate(CTX, ct, gk, 3)))
    np.testing.assert_allclose(got, np.roll(z, -3), atol=5e-3)
    got = ckks.decode(CTX, ckks.decrypt(CTX, SK, ckks.conjugate(CTX, ct, gk)))
    np.testing.assert_allclose(got, np.conj(z), atol=2e-3)


def test_rotate_at_level():
    z = _msg()
    gk = ckks.keygen_galois(CTX, rng.new_key(45), SK, steps=[1])
    ct = ckks.encrypt(CTX, PK, ckks.encode(CTX, z), rng.new_key(46))
    ct = ckks.rescale(CTX, ckks.multiply_plain(
        CTX, ct, ckks.encode(CTX, np.ones(CTX.n // 2))))
    got = ckks.decode(CTX, ckks.decrypt(CTX, SK, ckks.rotate(CTX, ct, gk, 1)))
    np.testing.assert_allclose(got, np.roll(z, -1), atol=5e-3)


def test_mod_drop():
    z = _msg()
    ct = ckks.encrypt(CTX, PK, ckks.encode(CTX, z), rng.new_key(47))
    ct = ckks.mod_drop(CTX, ct)
    assert ct.level == 1
    got = ckks.decode(CTX, ckks.decrypt(CTX, SK, ct))
    np.testing.assert_allclose(got, z, atol=1e-3)


def test_method2_keyswitch():
    """Hybrid (Method II) keyswitching: relin + rotation at several levels."""
    ctx2 = ckks.make_context(1024, [29, 25, 25, 25, 25], scale_bits=25,
                             sec_level="none", ks_type="II", alpha=2)
    sk = ckks.keygen_secret(ctx2, rng.new_key(70))
    pk = ckks.keygen_public(ctx2, rng.new_key(71), sk)
    rk = ckks.keygen_relin(ctx2, rng.new_key(72), sk)
    gk = ckks.keygen_galois(ctx2, rng.new_key(73), sk, steps=[1])
    z1, z2 = _msg(), _msg()
    ct1 = ckks.encrypt(ctx2, pk, ckks.encode(ctx2, z1), rng.new_key(74))
    ct2 = ckks.encrypt(ctx2, pk, ckks.encode(ctx2, z2), rng.new_key(75))
    ct3 = ckks.rescale(ctx2, ckks.relinearize(ctx2, ckks.multiply(ctx2, ct1, ct2), rk))
    got = ckks.decode(ctx2, ckks.decrypt(ctx2, sk, ct3))
    np.testing.assert_allclose(got, z1 * z2, atol=5e-3)
    # rotation at level 1 (odd active count exercises partial groups)
    rot = ckks.rotate(ctx2, ct3, gk, 1)
    got = ckks.decode(ctx2, ckks.decrypt(ctx2, sk, rot))
    np.testing.assert_allclose(got, np.roll(z1 * z2, -1), atol=5e-3)
    # deeper: multiply again, then rotate at level 2
    ct4 = ckks.rescale(ctx2, ckks.relinearize(
        ctx2, ckks.multiply(ctx2, ct3, ckks.mod_drop(ctx2, ct1, 1)), rk))
    got = ckks.decode(ctx2, ckks.decrypt(ctx2, sk, ckks.rotate(ctx2, ct4, gk, 1)))
    np.testing.assert_allclose(got, np.roll(z1 * z1 * z2, -1), atol=5e-2)


@pytest.mark.slow
def test_hoisted_rotation_method_ii():
    """Method-II (hybrid) hoisting: grouped FastBconv digits rotate by the
    NTT-domain gather like Method I (reference
    fast_single_hoisting_rotation_ckks_method_II, operator.cu:5092)."""
    from heongpu_tpu.ops import polyops
    ctx = ckks.make_context(512, [29, 28, 28, 28], sec_level="none",
                            ks_type="II", alpha=2)
    sk = ckks.keygen_secret(ctx, rng.new_key(601))
    pk = ckks.keygen_public(ctx, rng.new_key(602), sk)
    gk = ckks.keygen_galois(ctx, rng.new_key(603), sk, steps=[1, 3])
    z = np.linspace(-1, 1, ctx.n // 2)
    ct = ckks.encrypt(ctx, pk, ckks.encode(ctx, z), rng.new_key(604))
    d = ckks.hoist(ctx, ct)
    for step in (1, 3):
        g = polyops.steps_to_galois_elt(step, ctx.n)
        got = ckks.decode(ctx, ckks.decrypt(
            ctx, sk, ckks.rotate_hoisted(ctx, ct, d, gk.keys[g]))).real
        np.testing.assert_allclose(got, np.roll(z, -step), atol=1e-3)


def test_inv_form_galois_keys():
    """inv_form keys (MAC unpermuted digits, permute the 2-poly result) are
    functionally identical to normal keys on both the simple and hoisted
    rotation paths, for rotations and conjugation, Methods I and II."""
    from heongpu_tpu.ops import polyops
    # Method II: full surface (simple, conj, hoisted); Method I: simple
    # rotate only (the dispatch point is shared, a second full sweep would
    # double the suite cost for no extra coverage)
    ctx = ckks.make_context(512, [29, 28, 28, 28], sec_level="none",
                            ks_type="II", alpha=2, p_count=3)
    sk = ckks.keygen_secret(ctx, rng.new_key(701))
    pk = ckks.keygen_public(ctx, rng.new_key(702), sk)
    gki = ckks.keygen_galois(ctx, rng.new_key(703), sk, steps=[1, 3],
                             inv_form=True)
    assert all(k.inv_form for k in gki.keys.values())
    z = np.linspace(-1, 1, ctx.n // 2)
    ct = ckks.encrypt(ctx, pk, ckks.encode(ctx, z), rng.new_key(704))
    got = ckks.decode(ctx, ckks.decrypt(
        ctx, sk, ckks.rotate(ctx, ct, gki, 3))).real
    np.testing.assert_allclose(got, np.roll(z, -3), atol=1e-3)
    got = ckks.decode(ctx, ckks.decrypt(
        ctx, sk, ckks.conjugate(ctx, ct, gki)))
    np.testing.assert_allclose(got.imag, -ckks.decode(
        ctx, ckks.decrypt(ctx, sk, ct)).imag, atol=1e-3)
    d = ckks.hoist(ctx, ct)
    g = polyops.steps_to_galois_elt(1, ctx.n)
    got = ckks.decode(ctx, ckks.decrypt(
        ctx, sk, ckks.rotate_hoisted(ctx, ct, d, gki.keys[g]))).real
    np.testing.assert_allclose(got, np.roll(z, -1), atol=1e-3)
    ctx1 = ckks.make_context(512, [29, 28, 28], sec_level="none")
    sk1 = ckks.keygen_secret(ctx1, rng.new_key(705))
    pk1 = ckks.keygen_public(ctx1, rng.new_key(706), sk1)
    gk1 = ckks.keygen_galois(ctx1, rng.new_key(707), sk1, steps=[1],
                             inv_form=True)
    ct1 = ckks.encrypt(ctx1, pk1, ckks.encode(ctx1, z), rng.new_key(708))
    got = ckks.decode(ctx1, ckks.decrypt(
        ctx1, sk1, ckks.rotate(ctx1, ct1, gk1, 1))).real
    np.testing.assert_allclose(got, np.roll(z, -1), atol=1e-3)


def test_inv_form_seed_expanded():
    """Seed-expanded inv_form keys: k1 is regenerated from the seed with NO
    device permutation (the uniform half of an inv-form key IS the raw
    expansion) and still rotates correctly."""
    from heongpu_tpu import models
    from heongpu_tpu.models import ringkit
    ctx = ckks.make_context(512, [29, 28, 28, 28], sec_level="none",
                            ks_type="II", alpha=2, p_count=3)
    sk = ckks.keygen_secret(ctx, rng.new_key(711))
    pk = ckks.keygen_public(ctx, rng.new_key(712), sk)
    gk = ckks.keygen_galois(ctx, rng.new_key(713), sk, steps=[1],
                            a_seed=12345, store_a=False, inv_form=True)
    one = next(iter(k for k in gk.keys.values() if k.galois_elt != 2 * ctx.n - 1))
    assert one.k1 is None and one.a_seed is not None
    z = np.linspace(-1, 1, ctx.n // 2)
    ct = ckks.encrypt(ctx, pk, ckks.encode(ctx, z), rng.new_key(714))
    got = ckks.decode(ctx, ckks.decrypt(
        ctx, sk, ckks.rotate(ctx, ct, gk, 1))).real
    np.testing.assert_allclose(got, np.roll(z, -1), atol=1e-3)
