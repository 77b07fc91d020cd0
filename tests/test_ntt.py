"""NTT correctness: roundtrip, naive-DFT cross-check, negacyclic convolution."""

import numpy as np
import jax.numpy as jnp

from heongpu_tpu.ops import ntt
from heongpu_tpu.utils import nt

RNG = np.random.default_rng(1)


def _tables(n, nprimes=2, bits=29):
    primes = nt.generate_ntt_primes(bits, nprimes, n)
    return primes, ntt.build_ntt_tables(primes, n)


def test_roundtrip_small():
    for n in (16, 256, 4096):
        primes, tb = _tables(n)
        x = np.stack([RNG.integers(0, p, size=n, dtype=np.uint32) for p in primes])
        y = ntt.ntt_inv(ntt.ntt_fwd(jnp.asarray(x), tb), tb)
        np.testing.assert_array_equal(np.asarray(y), x)


def test_vs_naive():
    n = 32
    primes, tb = _tables(n)
    x = np.stack([RNG.integers(0, p, size=n, dtype=np.uint32) for p in primes])
    got = np.asarray(ntt.ntt_fwd(jnp.asarray(x), tb))
    psis = [int(tb.psi[li, 1]) for li in range(len(primes))]
    eo = ntt.eval_order(n)
    for li, (p, psi) in enumerate(zip(primes, psis)):
        want = np.array(ntt.ntt_naive_host([int(v) for v in x[li]], p, psi),
                        dtype=np.uint32)
        np.testing.assert_array_equal(got[li], want[eo])


def test_negacyclic_convolution():
    """NTT-domain pointwise product == negacyclic polynomial product."""
    from heongpu_tpu.ops import modmath as mm
    n = 128
    primes, tb = _tables(n)
    a = np.stack([RNG.integers(0, p, size=n, dtype=np.uint32) for p in primes])
    b = np.stack([RNG.integers(0, p, size=n, dtype=np.uint32) for p in primes])
    A = ntt.ntt_fwd(jnp.asarray(a), tb)
    B = ntt.ntt_fwd(jnp.asarray(b), tb)
    p_b = tb.p[:, None]
    C = mm.mul_mod(A, B, p_b, tb.pinv[:, None], tb.r2[:, None])
    c = np.asarray(ntt.ntt_inv(C, tb))
    for li, p in enumerate(primes):
        aa, bb = a[li].astype(object), b[li].astype(object)
        want = np.zeros(n, dtype=object)
        for i in range(n):
            for j in range(n):
                k = i + j
                s = 1 if k < n else -1
                want[k % n] = (want[k % n] + s * aa[i] * bb[j]) % p
        np.testing.assert_array_equal(c[li].astype(object), want)


def test_batched_shapes():
    n = 64
    primes, tb = _tables(n, nprimes=3)
    x = RNG.integers(0, min(primes), size=(4, 2, 3, n), dtype=np.uint32)
    y = ntt.ntt_inv(ntt.ntt_fwd(jnp.asarray(x), tb), tb)
    np.testing.assert_array_equal(np.asarray(y), x)
