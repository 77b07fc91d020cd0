"""Double-float ("df64") arithmetic: ~49-bit-precision reals as pairs of
float32, vectorized for the TPU VPU.

TPUs have no native float64 ALU; the reference's CKKS encoder runs
double-precision complex FFTs on the GPU (src/lib/host/ckks/encoder.cu:
103-220 via GPU-FFT).  The TPU-native equivalent used by ops/sfft.py is
error-free-transformation arithmetic (Knuth two_sum, Dekker split/two_prod)
over f32 pairs — giving 2^-48-level relative precision, far below the
inherent half-ulp coefficient rounding of any CKKS encode at Δ ≤ 2^40.

A df64 value is a pair (hi, lo) with |lo| <= ulp(hi)/2; arrays are pairs of
same-shaped float32 jnp arrays.  All functions are elementwise and jit/fusion
friendly.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

_SPLIT = np.float32(4097.0)  # 2^12 + 1 (Dekker split constant for f32)


def from_f64(x: np.ndarray):
    """Host float64 -> df64 pair (exact to f32-pair precision)."""
    hi = np.asarray(x, np.float64).astype(np.float32)
    lo = (np.asarray(x, np.float64) - hi.astype(np.float64)).astype(np.float32)
    return jnp.asarray(hi), jnp.asarray(lo)


def to_f64(a) -> np.ndarray:
    """df64 pair -> host float64."""
    return np.asarray(a[0], np.float64) + np.asarray(a[1], np.float64)


def _quick_two_sum(a, b):
    """|a| >= |b| assumed."""
    s = a + b
    return s, b - (s - a)


def _two_sum(a, b):
    s = a + b
    bb = s - a
    return s, (a - (s - bb)) + (b - bb)


def _split(a):
    t = _SPLIT * a
    hi = t - (t - a)
    return hi, a - hi


def _two_prod(a, b):
    p = a * b
    ah, al = _split(a)
    bh, bl = _split(b)
    return p, ((ah * bh - p) + ah * bl + al * bh) + al * bl


def add(a, b):
    s, e = _two_sum(a[0], b[0])
    e = e + a[1] + b[1]
    return _quick_two_sum(s, e)


def sub(a, b):
    return add(a, neg(b))


def neg(a):
    return -a[0], -a[1]


def mul(a, b):
    p, e = _two_prod(a[0], b[0])
    e = e + a[0] * b[1] + a[1] * b[0]
    return _quick_two_sum(p, e)


def scale_pow2(a, k: int):
    """Multiply by an exact power of two (error-free)."""
    f = np.float32(2.0 ** k)
    return a[0] * f, a[1] * f


# ---- complex df64: ((re_hi, re_lo), (im_hi, im_lo)) ----

def cadd(a, b):
    return add(a[0], b[0]), add(a[1], b[1])


def csub(a, b):
    return sub(a[0], b[0]), sub(a[1], b[1])


def cmul(a, b):
    re = sub(mul(a[0], b[0]), mul(a[1], b[1]))
    im = add(mul(a[0], b[1]), mul(a[1], b[0]))
    return re, im


def cfrom_host(z: np.ndarray):
    return from_f64(np.real(z)), from_f64(np.imag(z))


def cto_host(c) -> np.ndarray:
    return to_f64(c[0]) + 1j * to_f64(c[1])


# ---- exact integer round / split (for RNS reduction on device) ----

def round_to_int_parts3(a, shift: int = 24):
    """Round a df64 value (|v| < 2^59) to an integer and return the exact
    base-2^shift THREE-part decomposition (c2, c1, c0) as float32 exact
    integers:  v_int = c2*2^(2*shift) + c1*2^shift + c0, with c1, c0 in
    [0, 2^shift) and c2 signed (|c2| < 2^(59-2*shift)).

    The wide-scale companion of round_to_int_parts — needed by composite
    scales Delta ~ 2^56 (models/ckks_boot.BootConfig.base_count), where the
    2-part split's c_hi overflows int32 and its remainder arithmetic stops
    being exact.  |v_int - v| <= 1/2 + the df64 representation tail (~2^-48
    relative), which is the inherent encode rounding at such scales.

    Every step is error-free: each component is a float whose base-2^shift
    digits extract exactly (floor of power-of-two scalings and Sterbenz
    subtractions of same-ulp values); the digit sums (< 2^26) and carry
    propagation are exact small-integer float arithmetic."""
    a = add(a, (np.float32(0.5), np.float32(0.0)))   # floor(v+1/2) = round
    base = np.float32(2.0 ** shift)
    base2 = np.float32(2.0 ** (2 * shift))

    def dec(x):
        # sign-magnitude: digit extraction must not wrap negatives through
        # base2 (y - (-1)*base2 would round away the low bits)
        s = jnp.where(x < 0, np.float32(-1.0), np.float32(1.0))
        y = jnp.abs(x)
        h = jnp.floor(y / base2)
        r = y - h * base2
        m = jnp.floor(r / base)
        return s * h, s * m, s * (r - m * base)

    h0, m0, l0 = dec(a[0])
    h1, m1, l1 = dec(a[1])
    # commit the (sub-integer) fractional tail BEFORE carrying — the base
    # renormalization adds 2^shift-scale terms that would round it away
    l = jnp.floor(l0 + l1)
    cl = jnp.floor(l / base)
    l = l - cl * base
    m = m0 + m1 + cl
    cm = jnp.floor(m / base)
    m = m - cm * base
    h = h0 + h1 + cm
    return h, m, l


def round_to_int_parts(a, shift: int = 24):
    """Round a df64 value (|v| < 2^49) to the nearest integer and return the
    exact base-2^shift decomposition (c_hi, c_lo, sign-carrying) as float32
    arrays of exact small integers:

        round(v) = c_hi * 2^shift + c_lo     (signed, |c_lo| < 2^shift,
                                              |c_hi| < 2^(49-shift))

    Every step is error-free: n1 = rint(hi) is exact (hi's integer part fits
    f32's representable integers at its own magnitude), the remainder
    (hi - n1) + lo is exact, and the final split is float modular
    arithmetic on exact integers."""
    n1 = jnp.round(a[0])
    frac = (a[0] - n1) + a[1]
    n2 = jnp.round(frac)
    # r = n1 + n2 exactly, but n1 may exceed f32 integer-exact range when
    # combined — keep parts separate through the base-2^shift split.
    base = np.float32(2.0 ** shift)
    c_hi1 = jnp.floor(n1 / base)
    c_lo1 = n1 - c_hi1 * base          # in [0, 2^shift), exact
    c_lo = c_lo1 + n2                  # |c_lo| < 2^shift + 2^?, still exact
    return c_hi1, c_lo
