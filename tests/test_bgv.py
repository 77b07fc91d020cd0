"""BGV end-to-end with plaintext-recompute oracles (scheme the reference
marks 'Very Soon', README.md:24 — delivered here; test style mirrors
test_bfv.py)."""

import numpy as np
import pytest

from heongpu_tpu.models import bgv
from heongpu_tpu.utils import params, rng

N = 256
T = params.plain_modulus_for(N, 20)


@pytest.fixture(scope="module")
def setup():
    ctx = bgv.make_context(N, T, q_bits=[29, 29, 29, 29], sec_level="none")
    sk = bgv.keygen_secret(ctx, rng.new_key(81))
    pk = bgv.keygen_public(ctx, rng.new_key(82), sk)
    return ctx, sk, pk


R = np.random.default_rng(17)


def test_encode_roundtrip(setup):
    ctx, sk, pk = setup
    m = R.integers(0, ctx.t, N, dtype=np.int64)
    np.testing.assert_array_equal(bgv.decode(ctx, bgv.encode(ctx, m)),
                                  m.astype(np.uint32))


def test_encrypt_decrypt(setup):
    ctx, sk, pk = setup
    m = R.integers(0, ctx.t, N, dtype=np.int64)
    ct = bgv.encrypt(ctx, pk, bgv.encode(ctx, m), rng.new_key(83))
    got = bgv.decode(ctx, bgv.decrypt(ctx, sk, ct))
    np.testing.assert_array_equal(got, m.astype(np.uint32))
    assert bgv.noise_budget(ctx, sk, ct) > 30


def test_add_sub_plain(setup):
    ctx, sk, pk = setup
    m1 = R.integers(0, ctx.t, N, dtype=np.int64)
    m2 = R.integers(0, ctx.t, N, dtype=np.int64)
    ct1 = bgv.encrypt(ctx, pk, bgv.encode(ctx, m1), rng.new_key(84))
    ct2 = bgv.encrypt(ctx, pk, bgv.encode(ctx, m2), rng.new_key(85))
    got = bgv.decode(ctx, bgv.decrypt(ctx, sk, bgv.add(ctx, ct1, ct2)))
    np.testing.assert_array_equal(got, ((m1 + m2) % ctx.t).astype(np.uint32))
    got = bgv.decode(ctx, bgv.decrypt(ctx, sk, bgv.sub(ctx, ct1, ct2)))
    np.testing.assert_array_equal(got, ((m1 - m2) % ctx.t).astype(np.uint32))
    got = bgv.decode(ctx, bgv.decrypt(
        ctx, sk, bgv.add_plain(ctx, ct1, bgv.encode(ctx, m2))))
    np.testing.assert_array_equal(got, ((m1 + m2) % ctx.t).astype(np.uint32))
    got = bgv.decode(ctx, bgv.decrypt(ctx, sk, bgv.negate(ctx, ct1)))
    np.testing.assert_array_equal(got, ((-m1) % ctx.t).astype(np.uint32))


def test_multiply_plain(setup):
    ctx, sk, pk = setup
    m1 = R.integers(0, ctx.t, N, dtype=np.int64)
    m2 = R.integers(0, ctx.t, N, dtype=np.int64)
    ct = bgv.encrypt(ctx, pk, bgv.encode(ctx, m1), rng.new_key(86))
    out = bgv.multiply_plain(ctx, ct, bgv.encode(ctx, m2))
    got = bgv.decode(ctx, bgv.decrypt(ctx, sk, out))
    np.testing.assert_array_equal(got, (m1 * m2 % ctx.t).astype(np.uint32))


@pytest.mark.slow
def test_multiply_relinearize_modswitch(setup):
    ctx, sk, pk = setup
    rk = bgv.keygen_relin(ctx, rng.new_key(87), sk)
    m1 = R.integers(0, ctx.t, N, dtype=np.int64)
    m2 = R.integers(0, ctx.t, N, dtype=np.int64)
    ct1 = bgv.encrypt(ctx, pk, bgv.encode(ctx, m1), rng.new_key(88))
    ct2 = bgv.encrypt(ctx, pk, bgv.encode(ctx, m2), rng.new_key(89))
    prod = bgv.relinearize(ctx, bgv.multiply(ctx, ct1, ct2), rk)
    want = (m1 * m2 % ctx.t).astype(np.uint32)
    np.testing.assert_array_equal(
        bgv.decode(ctx, bgv.decrypt(ctx, sk, prod)), want)
    # mod switch down and keep computing
    low = bgv.mod_switch(ctx, prod)
    assert low.level == 1
    np.testing.assert_array_equal(
        bgv.decode(ctx, bgv.decrypt(ctx, sk, low)), want)
    # square at the lower level
    sq = bgv.mod_switch(ctx, bgv.relinearize(ctx, bgv.multiply(ctx, low, low), rk))
    np.testing.assert_array_equal(
        bgv.decode(ctx, bgv.decrypt(ctx, sk, sq)),
        (want.astype(object) ** 2 % ctx.t).astype(np.uint32))


def test_rotation(setup):
    ctx, sk, pk = setup
    gk = bgv.keygen_galois(ctx, rng.new_key(90), sk)
    m = R.integers(0, ctx.t, N, dtype=np.int64)
    ct = bgv.encrypt(ctx, pk, bgv.encode(ctx, m), rng.new_key(91))
    got = bgv.decode(ctx, bgv.decrypt(ctx, sk, bgv.rotate_rows(ctx, ct, gk, 1)))
    half = N // 2
    want = np.concatenate([np.roll(m[:half], -1), np.roll(m[half:], -1)])
    np.testing.assert_array_equal(got, (want % ctx.t).astype(np.uint32))


@pytest.mark.slow
def test_deep_chain(setup):
    """Repeated square-and-modswitch down the whole chain stays exact."""
    ctx, sk, pk = setup
    rk = bgv.keygen_relin(ctx, rng.new_key(92), sk)
    m = R.integers(0, ctx.t, N, dtype=np.int64)
    ct = bgv.encrypt(ctx, pk, bgv.encode(ctx, m), rng.new_key(93))
    want = m % ctx.t
    for _ in range(ctx.k - 1):
        ct = bgv.mod_switch(ctx, bgv.relinearize(ctx, bgv.multiply(ctx, ct, ct), rk))
        want = want * want % ctx.t
        np.testing.assert_array_equal(
            bgv.decode(ctx, bgv.decrypt(ctx, sk, ct)),
            want.astype(np.uint32))


def test_inv_form_galois_bgv():
    """Inverse-form keys rotate identically to normal keys (BGV)."""
    ctx = bgv.make_context(N, T, q_bits=[30, 30, 30], sec_level="none")
    sk = bgv.keygen_secret(ctx, rng.new_key(811))
    pk = bgv.keygen_public(ctx, rng.new_key(812), sk)
    gki = bgv.keygen_galois(ctx, rng.new_key(813), sk, steps=[1],
                            inv_form=True)
    m = np.arange(N) % 23
    ct = bgv.encrypt(ctx, pk, bgv.encode(ctx, m), rng.new_key(814))
    got = bgv.decode(ctx, bgv.decrypt(ctx, sk, bgv.rotate_rows(ctx, ct, gki, 1)))
    half = N // 2
    want = np.concatenate([np.roll(m[:half], -1), np.roll(m[half:], -1)])
    np.testing.assert_array_equal(got, want)
