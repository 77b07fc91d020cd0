"""Device modular arithmetic over uint32 lanes.

This is the TPU-native replacement for GPU-NTT's 64-bit `modular_arith.cuh`
(OPERATOR_GPU_64 Barrett mul/add) used throughout the reference
(HEonGPU kernel layer, SURVEY §2.0/§2.2).  TPUs have no 64-bit integer
multiply, so the entire framework standardises on RNS primes p < 2**31 held
in uint32 lanes; a 64-bit product is materialised as a (hi, lo) uint32 pair
via 16-bit limb decomposition, and reduction uses Montgomery (variable ×
variable) or Shoup (variable × precomputed-constant) forms.

All functions broadcast: operands usually have shape (..., L, N) with per-RNS
limb constants shaped (L, 1).
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

U32 = jnp.uint32
_M16 = np.uint32(0xFFFF)


# ---------------------------------------------------------------------------
# host-side constant builders
# ---------------------------------------------------------------------------

def mont_pinv(p: int) -> int:
    """-p^{-1} mod 2**32 (Montgomery n')."""
    return (-pow(p, -1, 1 << 32)) % (1 << 32)


def mont_r1(p: int) -> int:
    """R = 2**32 mod p."""
    return (1 << 32) % p


def mont_r2(p: int) -> int:
    """R^2 = 2**64 mod p."""
    return (1 << 64) % p


def shoup(w: int, p: int) -> int:
    """floor(w * 2**32 / p) — Shoup precomputation for fixed multiplicand w."""
    return (w << 32) // p


def barrett_mu(p: int) -> int:
    """floor(2**32 / p) for the 32-bit Barrett reduction."""
    return (1 << 32) // p


# ---------------------------------------------------------------------------
# 64-bit building blocks on (hi, lo) uint32 pairs
# ---------------------------------------------------------------------------

def widening_mul(a, b):
    """Full 32x32 -> 64-bit product as (hi, lo) uint32 pair."""
    a = a.astype(U32)
    b = b.astype(U32)
    a0 = a & _M16
    a1 = a >> 16
    b0 = b & _M16
    b1 = b >> 16
    ll = a0 * b0
    lh = a0 * b1
    hl = a1 * b0
    hh = a1 * b1
    t = (ll >> 16) + (lh & _M16) + (hl & _M16)
    lo = (t << 16) | (ll & _M16)
    hi = hh + (lh >> 16) + (hl >> 16) + (t >> 16)
    return hi, lo


def mul_hi(a, b):
    """High 32 bits of the 64-bit product."""
    return widening_mul(a, b)[0]


def add64(hi_a, lo_a, hi_b, lo_b):
    """(hi,lo) + (hi,lo) mod 2**64 with carry propagation."""
    lo = lo_a + lo_b
    carry = (lo < lo_a).astype(U32)
    hi = hi_a + hi_b + carry
    return hi, lo


# ---------------------------------------------------------------------------
# modular primitives (all inputs < p, p < 2**31, p odd)
# ---------------------------------------------------------------------------

def add_mod(a, b, p):
    s = a + b
    return jnp.where(s >= p, s - p, s)


def sub_mod(a, b, p):
    return jnp.where(a >= b, a - b, (a + p) - b)


def neg_mod(a, p):
    return jnp.where(a == 0, a, p - a)


def cond_sub(a, p):
    """Reduce a in [0, 2p) to [0, p)."""
    return jnp.where(a >= p, a - p, a)


def mont_mul(a, b, p, pinv):
    """a*b*2^-32 mod p (Montgomery REDC).  a,b < p < 2**31, pinv = -p^-1 mod 2**32."""
    hi, lo = widening_mul(a, b)
    m = lo * pinv
    mhi, _ = widening_mul(m, p)
    # lo + mlo ≡ 0 mod 2**32, so the carry out is 1 exactly when lo != 0.
    t = hi + mhi + (lo != 0).astype(U32)
    return cond_sub(t, p)


def mont_redc(hi, lo, p, pinv):
    """(hi*2^32 + lo) * 2^-32 mod p for hi < 2**31 (one REDC step)."""
    m = lo * pinv
    mhi, _ = widening_mul(m, p)
    t = hi + mhi + (lo != 0).astype(U32)
    return cond_sub(t, p)


def mul_mod(a, b, p, pinv, r2):
    """Exact a*b mod p: two REDC passes (fold the R factor back with r2=2^64 mod p)."""
    return mont_mul(mont_mul(a, b, p, pinv), r2, p, pinv)


def to_mont(a, p, pinv, r2):
    return mont_mul(a, r2, p, pinv)


def from_mont(a, p, pinv):
    """Multiply by R^-1: REDC(a * 1)."""
    m = a * pinv
    mhi, _ = widening_mul(m, p)
    t = mhi + (a != 0).astype(U32)
    return cond_sub(t, p)


def shoup_mul(a, w, w_shoup, p):
    """a*w mod p with w fixed and w_shoup = floor(w*2^32/p) precomputed.

    Requires a < p (p < 2**31).  7 int32 multiplies — the cheapest modmul;
    used for NTT twiddles and any precomputed-constant scaling (the TPU
    analog of the reference's table-driven butterflies).
    """
    q = mul_hi(a, w_shoup)
    r = a * w - q * p  # exact in uint32 wraparound arithmetic (true value < 2p)
    return cond_sub(r, p)


def shoup_mul_lazy(a, w, w_shoup, p):
    """Harvey lazy Shoup product: a*w mod p in [0, 2p) — the final
    conditional subtraction is deferred to the caller.

    Valid for ANY uint32 a (including lazy inputs in [0, 4p)) and w < p:
    q = floor(a*w_sh/2^32) is within 1 of floor(a*w/p), so a*w - q*p lands
    in [0, 2p).  This is what lets NTT butterfly chains keep values in
    [0, 2p) across stages with one reduction at the end (the TPU analog of
    GPU-NTT's lazy 64-bit butterflies)."""
    q = mul_hi(a, w_shoup)
    return a * w - q * p


def barrett32(x, p, mu):
    """x mod p for any uint32 x; mu = floor(2^32/p).  Up to 3 corrections."""
    q = mul_hi(x, mu)
    r = x - q * p
    r = cond_sub(r, p)
    r = cond_sub(r, p)
    return cond_sub(r, p)


def reduce64(hi, lo, p, mu, r1, r1_shoup):
    """(hi*2^32 + lo) mod p exactly.  r1 = 2^32 mod p (with Shoup companion)."""
    hi_m = barrett32(hi, p, mu)
    lo_m = barrett32(lo, p, mu)
    return add_mod(shoup_mul(hi_m, r1, r1_shoup, p), lo_m, p)


def pow_mod_host(a: int, e: int, p: int) -> int:
    return pow(a, e, p)
