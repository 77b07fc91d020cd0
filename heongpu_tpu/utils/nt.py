"""Host-side number theory: primes, primitive roots, NTT parameter generation.

Pure Python integers (arbitrary precision) — runs once at context-generation
time, never on device.  Plays the role of the reference's host helpers
(HEonGPU `src/lib/util/util.cu`: generate_primes / generate_proper_primes /
generate_primitive_root_of_unity / generate_ntt_table) but generates
TPU-friendly primes (< 2**31 so device arithmetic fits in uint32 lanes).
"""

from __future__ import annotations

import random
from typing import List

# Deterministic Miller-Rabin witnesses valid for all n < 3,317,044,064,679,887,385,961,981
_MR_WITNESSES = (2, 3, 5, 7, 11, 13, 17, 19, 23, 29, 31, 37)


def is_prime(n: int) -> bool:
    if n < 2:
        return False
    for p in (2, 3, 5, 7, 11, 13, 17, 19, 23, 29, 31, 37):
        if n % p == 0:
            return n == p
    d = n - 1
    r = 0
    while d % 2 == 0:
        d //= 2
        r += 1
    for a in _MR_WITNESSES:
        x = pow(a, d, n)
        if x == 1 or x == n - 1:
            continue
        for _ in range(r - 1):
            x = x * x % n
            if x == n - 1:
                break
        else:
            return False
    return True


def generate_ntt_primes(bit_size: int, count: int, n: int,
                        exclude: set | None = None,
                        descending_from_top: bool = True) -> List[int]:
    """Generate `count` primes p with p ≡ 1 (mod 2n), p < 2**bit_size.

    Mirrors HEonGPU generate_proper_primes (util.cu) but constrained to
    bit_size ≤ 31 for uint32 device lanes.  Uses the native C++ engine
    (utils/native.py) when available; both paths are bit-identical.
    """
    assert bit_size <= 31, "TPU uint32 lanes require primes < 2**31"
    from . import native
    if native.available():
        return native.generate_ntt_primes(bit_size, count, n, exclude)
    m = 2 * n
    exclude = exclude or set()
    out: List[int] = []
    # Largest candidate ≡ 1 mod 2n below 2**bit_size
    c = (1 << bit_size) - 1
    c -= (c - 1) % m
    while len(out) < count and c > (1 << (bit_size - 1)):
        if c not in exclude and is_prime(c):
            out.append(c)
        c -= m
    if len(out) < count:
        raise ValueError(
            f"not enough {bit_size}-bit NTT primes for n={n} (found {len(out)}/{count})")
    return out


def _factorize(n: int) -> List[int]:
    fs = []
    d = 2
    while d * d <= n:
        if n % d == 0:
            fs.append(d)
            while n % d == 0:
                n //= d
        d += 1
    if n > 1:
        fs.append(n)
    return fs


def primitive_root(p: int) -> int:
    """Smallest generator of (Z/p)*."""
    phi = p - 1
    factors = _factorize(phi)
    g = 2
    while True:
        if all(pow(g, phi // f, p) != 1 for f in factors):
            return g
        g += 1


def root_of_unity(order: int, p: int) -> int:
    """A primitive `order`-th root of unity mod p; requires order | p-1."""
    assert (p - 1) % order == 0
    g = primitive_root(p)
    w = pow(g, (p - 1) // order, p)
    assert pow(w, order, p) == 1 and pow(w, order // 2, p) == p - 1
    return w


def minimal_primitive_root_2n(n2: int, p: int) -> int:
    """Smallest primitive 2n-th root of unity mod p (deterministic tables).
    Native C++ fast path when available (bit-identical)."""
    from . import native
    if native.available():
        return native.minimal_primitive_root_2n(n2, p)
    w = root_of_unity(n2, p)
    # all primitive roots are w^k for odd k coprime to 2n; take the minimum of a few
    best = w
    x = w
    for k in range(3, min(n2, 512), 2):
        x = x * pow(w, 2, p) % p
        if pow(x, n2 // 2, p) == p - 1 and x < best:
            best = x
    return best


def bit_reverse(x: int, bits: int) -> int:
    r = 0
    for _ in range(bits):
        r = (r << 1) | (x & 1)
        x >>= 1
    return r


def crt_garner_coeffs(primes: List[int]):
    """Mixed-radix (Garner) coefficients for CRT composition on host."""
    k = len(primes)
    inv = [[0] * k for _ in range(k)]
    for i in range(k):
        for j in range(i + 1, k):
            inv[i][j] = pow(primes[i], -1, primes[j])
    return inv


def crt_compose(residues: List[int], primes: List[int]) -> int:
    """CRT compose to the centered integer in [-Q/2, Q/2)."""
    q = 1
    for p in primes:
        q *= p
    x = 0
    for r, p in zip(residues, primes):
        qi = q // p
        x = (x + r * qi * pow(qi, -1, p)) % q
    if x >= q // 2:
        x -= q
    return x
