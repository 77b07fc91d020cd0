"""Golden tests for uint32 modular primitives vs python big-int arithmetic."""

import numpy as np
import jax.numpy as jnp

from heongpu_tpu.ops import modmath as mm
from heongpu_tpu.utils import nt

RNG = np.random.default_rng(0)
PRIMES = [536608769, 268582913, (1 << 29) - 3 - 2 * ((1 << 29) - 3) % 2]  # overwritten below
PRIMES = nt.generate_ntt_primes(30, 3, 4096) + nt.generate_ntt_primes(29, 2, 4096)


def _rand(p, shape=(1024,)):
    return RNG.integers(0, p, size=shape, dtype=np.uint32)


def test_widening_mul():
    a = RNG.integers(0, 1 << 32, size=2048, dtype=np.uint64).astype(np.uint32)
    b = RNG.integers(0, 1 << 32, size=2048, dtype=np.uint64).astype(np.uint32)
    hi, lo = mm.widening_mul(jnp.asarray(a), jnp.asarray(b))
    full = a.astype(object) * b.astype(object)
    np.testing.assert_array_equal(np.asarray(hi), (full >> 16 >> 16).astype(np.uint64).astype(np.uint32))
    np.testing.assert_array_equal(np.asarray(lo), (full & 0xFFFFFFFF).astype(np.uint64).astype(np.uint32))


def test_add_sub_neg_mod():
    for p in PRIMES:
        a, b = _rand(p), _rand(p)
        pj = jnp.uint32(p)
        np.testing.assert_array_equal(
            np.asarray(mm.add_mod(jnp.asarray(a), jnp.asarray(b), pj)),
            (a.astype(np.uint64) + b) % p)
        np.testing.assert_array_equal(
            np.asarray(mm.sub_mod(jnp.asarray(a), jnp.asarray(b), pj)),
            (a.astype(np.int64) - b) % p)
        np.testing.assert_array_equal(
            np.asarray(mm.neg_mod(jnp.asarray(a), pj)),
            (-a.astype(np.int64)) % p)


def test_mont_mul_roundtrip():
    for p in PRIMES:
        a, b = _rand(p), _rand(p)
        pinv, r2 = jnp.uint32(mm.mont_pinv(p)), jnp.uint32(mm.mont_r2(p))
        pj = jnp.uint32(p)
        got = mm.mul_mod(jnp.asarray(a), jnp.asarray(b), pj, pinv, r2)
        np.testing.assert_array_equal(
            np.asarray(got), a.astype(np.uint64) * b % p)
        am = mm.to_mont(jnp.asarray(a), pj, pinv, r2)
        np.testing.assert_array_equal(np.asarray(mm.from_mont(am, pj, pinv)), a)


def test_shoup_mul():
    for p in PRIMES:
        a = _rand(p)
        w = int(_rand(p, ())[()])
        got = mm.shoup_mul(jnp.asarray(a), jnp.uint32(w),
                           jnp.uint32(mm.shoup(w, p)), jnp.uint32(p))
        np.testing.assert_array_equal(np.asarray(got),
                                      a.astype(np.uint64) * w % p)


def test_barrett32_and_reduce64():
    for p in PRIMES:
        x = RNG.integers(0, 1 << 32, size=4096, dtype=np.uint64).astype(np.uint32)
        mu = jnp.uint32(mm.barrett_mu(p))
        np.testing.assert_array_equal(
            np.asarray(mm.barrett32(jnp.asarray(x), jnp.uint32(p), mu)),
            x.astype(np.uint64) % p)
        hi = RNG.integers(0, 1 << 32, size=4096, dtype=np.uint64).astype(np.uint32)
        lo = RNG.integers(0, 1 << 32, size=4096, dtype=np.uint64).astype(np.uint32)
        r1 = mm.mont_r1(p)
        got = mm.reduce64(jnp.asarray(hi), jnp.asarray(lo), jnp.uint32(p), mu,
                          jnp.uint32(r1), jnp.uint32(mm.shoup(r1, p)))
        want = ((hi.astype(object) * (1 << 32)) + lo.astype(object)) % p
        np.testing.assert_array_equal(np.asarray(got).astype(object), want)


def test_add64():
    a = RNG.integers(0, 1 << 64, size=1024, dtype=np.uint64)
    b = RNG.integers(0, 1 << 64, size=1024, dtype=np.uint64)
    hi, lo = mm.add64(jnp.asarray((a >> np.uint64(32)).astype(np.uint32)),
                      jnp.asarray((a & np.uint64(0xFFFFFFFF)).astype(np.uint32)),
                      jnp.asarray((b >> np.uint64(32)).astype(np.uint32)),
                      jnp.asarray((b & np.uint64(0xFFFFFFFF)).astype(np.uint32)))
    s = a + b  # wraps mod 2**64
    np.testing.assert_array_equal(np.asarray(hi), (s >> np.uint64(32)).astype(np.uint32))
    np.testing.assert_array_equal(np.asarray(lo), (s & np.uint64(0xFFFFFFFF)).astype(np.uint32))
