"""huint arithmetic over TFHE gate bootstrapping (reference README.md:52-66
advertised huint8..256 types; Kogge-Stone batched adder)."""

import numpy as np
import pytest

from heongpu_tpu.models import tfhe, tfhe_int
from heongpu_tpu.utils import rng

pytestmark = pytest.mark.slow


@pytest.fixture(scope="module")
def setup():
    # lwe_n=128 (test-only knob): 4x shorter CMux chain so the CPU-oracle
    # huint suite stays re-runnable (~quarter the time of STD128); the
    # STD128 production parameters are covered by test_tfhe.py
    ctx = tfhe.make_context(lwe_n=128)
    sk = tfhe.keygen_secret(rng.new_key(41), lwe_n=128)
    bk = tfhe.keygen_boot(ctx, rng.new_key(42), sk)
    return ctx, sk, bk


def test_huint8_add(setup):
    ctx, sk, bk = setup
    R = np.random.default_rng(5)
    xs = R.integers(0, 256, 3)
    ys = R.integers(0, 256, 3)
    hx = tfhe_int.encrypt_huint(ctx, sk, xs, 8, rng.new_key(43))
    hy = tfhe_int.encrypt_huint(ctx, sk, ys, 8, rng.new_key(44))
    hs, cout = tfhe_int.add(ctx, bk, hx, hy)
    np.testing.assert_array_equal(
        tfhe_int.decrypt_huint(ctx, sk, hs).astype(np.int64), (xs + ys) % 256)
    np.testing.assert_array_equal(
        tfhe.decrypt(ctx, sk, cout).astype(np.int64), (xs + ys) >> 8)


def test_huint8_sub(setup):
    ctx, sk, bk = setup
    R = np.random.default_rng(6)
    xs = R.integers(0, 256, 2)
    ys = R.integers(0, 256, 2)
    hx = tfhe_int.encrypt_huint(ctx, sk, xs, 8, rng.new_key(45))
    hy = tfhe_int.encrypt_huint(ctx, sk, ys, 8, rng.new_key(46))
    hd, noborrow = tfhe_int.sub(ctx, bk, hx, hy)
    np.testing.assert_array_equal(
        tfhe_int.decrypt_huint(ctx, sk, hd).astype(np.int64), (xs - ys) % 256)
    np.testing.assert_array_equal(
        tfhe.decrypt(ctx, sk, noborrow).astype(np.int64),
        (xs >= ys).astype(np.int64))


def test_huint16_roundtrip_and_rounds(setup):
    ctx, sk, bk = setup
    xs = np.array([40000, 123])
    hx = tfhe_int.encrypt_huint(ctx, sk, xs, 16, rng.new_key(47))
    np.testing.assert_array_equal(
        tfhe_int.decrypt_huint(ctx, sk, hx).astype(np.int64), xs)
    # round count formula (carry-gate prefix): 1 + log2(W) + 1
    assert tfhe_int.bootstrap_rounds(8) == 5
    assert tfhe_int.bootstrap_rounds(256) == 10


def test_variance_tracking(setup):
    """Per-gate noise-variance bookkeeping (reference variances_ fields)."""
    import math
    from heongpu_tpu.models.tfhe import (bootstrap_output_variance,
                                         noise_margin_bits)
    ctx, sk, bk = setup
    c = tfhe.encrypt(ctx, sk, np.array([1, 0]), rng.new_key(50))
    assert c.variance > 0
    g = tfhe.AND(ctx, bk, c, c)
    assert g.variance == bootstrap_output_variance(ctx)
    # decryption margin must be comfortably positive at STD128
    assert noise_margin_bits(g) > 1
    # XOR pre-computation quadruples the linear variance (tracked, then reset)
    assert tfhe.NOT(ctx, c).variance == c.variance


def test_huint_comparisons(setup):
    ctx, sk, bk = setup
    xs = np.array([200, 13]); ys = np.array([100, 13])
    hx = tfhe_int.encrypt_huint(ctx, sk, xs, 8, rng.new_key(51))
    hy = tfhe_int.encrypt_huint(ctx, sk, ys, 8, rng.new_key(52))
    geb = tfhe.decrypt(ctx, sk, tfhe_int.ge(ctx, bk, hx, hy)).astype(int)
    eqb = tfhe.decrypt(ctx, sk, tfhe_int.eq(ctx, bk, hx, hy)).astype(int)
    np.testing.assert_array_equal(geb, (xs >= ys).astype(int))
    np.testing.assert_array_equal(eqb, (xs == ys).astype(int))


def test_huint8_shift_mux(setup):
    ctx, sk, bk = setup
    R = np.random.default_rng(9)
    xs = R.integers(0, 256, 2)
    hx = tfhe_int.encrypt_huint(ctx, sk, xs, 8, rng.new_key(50))
    np.testing.assert_array_equal(
        tfhe_int.decrypt_huint(ctx, sk, tfhe_int.shift_left(hx, 3)).astype(np.int64),
        (xs << 3) % 256)
    np.testing.assert_array_equal(
        tfhe_int.decrypt_huint(ctx, sk, tfhe_int.shift_right(hx, 2)).astype(np.int64),
        xs >> 2)
    ys = R.integers(0, 256, 2)
    hy = tfhe_int.encrypt_huint(ctx, sk, ys, 8, rng.new_key(51))
    sel = tfhe.encrypt(ctx, sk, np.array([True, False]), rng.new_key(52))
    got = tfhe_int.decrypt_huint(ctx, sk, tfhe_int.mux(ctx, bk, sel, hx, hy))
    np.testing.assert_array_equal(got.astype(np.int64),
                                  np.where([True, False], xs, ys))


def test_huint8_mul(setup):
    ctx, sk, bk = setup
    R = np.random.default_rng(10)
    xs = R.integers(0, 256, 2)
    ys = R.integers(0, 256, 2)
    hx = tfhe_int.encrypt_huint(ctx, sk, xs, 8, rng.new_key(53))
    hy = tfhe_int.encrypt_huint(ctx, sk, ys, 8, rng.new_key(54))
    got = tfhe_int.decrypt_huint(ctx, sk, tfhe_int.mul(ctx, bk, hx, hy))
    np.testing.assert_array_equal(got.astype(np.int64), (xs * ys) % 256)


def test_hint8_signed(setup):
    ctx, sk, bk = setup
    xs = np.array([-5, 100, -128], object)
    ys = np.array([3, -100, 127], object)
    hx = tfhe_int.encrypt_hint(ctx, sk, xs, 8, rng.new_key(60))
    hy = tfhe_int.encrypt_hint(ctx, sk, ys, 8, rng.new_key(61))
    # roundtrip
    np.testing.assert_array_equal(tfhe_int.decrypt_hint(ctx, sk, hx), xs)
    # signed add (two's complement wrap)
    hs, _ = tfhe_int.add(ctx, bk, hx, hy)
    want = np.array([((int(a) + int(b) + 128) % 256) - 128
                     for a, b in zip(xs, ys)], object)
    np.testing.assert_array_equal(tfhe_int.decrypt_hint(ctx, sk, hs), want)
    # negate / abs
    hn = tfhe_int.neg(ctx, bk, hx)
    np.testing.assert_array_equal(
        tfhe_int.decrypt_hint(ctx, sk, hn),
        np.array([((-int(a) + 128) % 256) - 128 for a in xs], object))
    ha = tfhe_int.abs_(ctx, bk, hx)
    np.testing.assert_array_equal(
        tfhe_int.decrypt_hint(ctx, sk, ha),
        np.array([abs(int(a)) if int(a) != -128 else -128 for a in xs],
                 object))
    # signed compare
    geb = tfhe.decrypt(ctx, sk, tfhe_int.ge_signed(ctx, bk, hx, hy))
    np.testing.assert_array_equal(
        geb, np.array([int(a) >= int(b) for a, b in zip(xs, ys)]))
    # arithmetic shift (free)
    hr = tfhe_int.shift_right_arith(ctx, hx, 2)
    np.testing.assert_array_equal(
        tfhe_int.decrypt_hint(ctx, sk, hr),
        np.array([int(a) >> 2 for a in xs], object))
