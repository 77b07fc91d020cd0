"""Native C++ parameter engine vs pure-Python reference — bit-identical."""

import numpy as np
import pytest

from heongpu_tpu.utils import native, nt
from heongpu_tpu.ops import ntt as nttm


pytestmark = pytest.mark.skipif(not native.available(),
                                reason="no C++ toolchain")


def test_is_prime_matches():
    for n in [1, 2, 3, 4, 561, 7919, (1 << 29) - 3, 536903681, 2147483647]:
        want = nt.is_prime(n)
        assert native.is_prime(n) == want, n


def test_generate_primes_match():
    for bits, n in [(29, 1024), (30, 4096), (25, 256)]:
        py = _py_primes(bits, 4, n)
        nat = native.generate_ntt_primes(bits, 4, n)
        assert py == nat


def _py_primes(bit_size, count, n, exclude=None):
    m = 2 * n
    exclude = exclude or set()
    out = []
    c = (1 << bit_size) - 1
    c -= (c - 1) % m
    while len(out) < count and c > (1 << (bit_size - 1)):
        if c not in exclude and nt.is_prime(c):
            out.append(c)
        c -= m
    return out


def test_roots_and_pow_series_match():
    p = _py_primes(29, 1, 512)[0]
    w_nat = native.minimal_primitive_root_2n(1024, p)
    # python path (bypass the native shortcut)
    w = nt.root_of_unity(1024, p)
    best, x = w, w
    for k in range(3, 512, 2):
        x = x * pow(w, 2, p) % p
        if pow(x, 512, p) == p - 1 and x < best:
            best = x
    assert w_nat == best
    ps = native.pow_series(best, 1024, p)
    np.testing.assert_array_equal(ps, nttm.pow_series(best, 1024, p))
    a, b, c, d = native.psi_tables(best, 1024, p)
    np.testing.assert_array_equal(a, ps)
    np.testing.assert_array_equal(b, nttm.shoup_np(ps, p))
    ninv = pow(1024, -1, p)
    ipsi = pow(best, -1, p)
    ip = (nttm.pow_series(ipsi, 1024, p).astype(np.uint64) * ninv % p)
    np.testing.assert_array_equal(c, ip.astype(np.uint32))
