"""Homomorphic polynomial evaluation (BSGS power basis) and Chebyshev
interpolation helpers.

Capability match for the reference's polynomial-evaluation stack used by
EvalMod: gen_power / evaluate_poly(_recurse/_from_polynomial_basis) BSGS
evaluation (src/lib/host/ckks/operator.cu:4036-4673, bsgs_index helpers
util/util.cuh) and the Chebyshev/cosine coefficient generators
(src/lib/host/ckks/chebyshev_interpolation.cu, cosine_approx.cu).

TPU-first design notes:
  * Power basis with baby-step/giant-step recursion: depth ceil(log2(d))+1
    instead of Horner's d, so the XLA program is logarithmic in ct-ct
    multiplies along the critical path.
  * Exact scale threading: CKKS rescale divides by a prime that is only
    approximately the scale, so naive ct-ct adds between different
    multiplication chains would silently inject relative error ~|q/S - 1|.
    We thread a *target scale* top-down through the recursion and realise it
    exactly via the free choice of plaintext-coefficient scales (plaintext
    encoding scale is a continuous knob), so every ciphertext addition is
    between exactly-matching scales.  The reference instead tracks per-level
    rescale constants; this is the TPU/functional analog.
"""

from __future__ import annotations

import math
from typing import Dict, List, Optional, Sequence

import numpy as np

from . import ckks
from .ckks import CkksContext, Ciphertext


# =========================================================================
# Host-side approximation helpers (reference chebyshev_interpolation.cu)
# =========================================================================

def chebyshev_interp_coeffs(f, degree: int, a: float = -1.0, b: float = 1.0):
    """Chebyshev interpolation coefficients of f on [a, b] at Chebyshev
    nodes (reference chebyshev_interpolation.cuh:23-48)."""
    k = degree + 1
    nodes = np.cos((2 * np.arange(k) + 1) * np.pi / (2 * k))
    x = 0.5 * (b - a) * nodes + 0.5 * (b + a)
    y = np.array([f(v) for v in x], dtype=np.float64)
    return np.polynomial.chebyshev.chebfit(nodes, y, degree)


def cheb_to_monomial(cheb_coeffs) -> np.ndarray:
    """Chebyshev-basis -> power-basis coefficients (stable to degree ~31)."""
    return np.polynomial.chebyshev.cheb2poly(cheb_coeffs)


def cosine_approx_coeffs(R: float, degree: int, phase: float = 0.0) -> np.ndarray:
    """Power-basis coefficients of cos(R*y + phase) on y in [-1, 1]
    (reference cosine_approx.cu)."""
    return cheb_to_monomial(
        chebyshev_interp_coeffs(lambda y: math.cos(R * y + phase), degree))


# =========================================================================
# Homomorphic power basis (reference gen_power, operator.cu:4036)
# =========================================================================

def gen_powers(ctx: CkksContext, y: Ciphertext, max_pow: int,
               rk) -> Dict[int, Ciphertext]:
    """All powers y^1..y^max_pow built with log-depth squaring chains.
    Power j sits at level(y) + ceil(log2(j)) — callers mod_drop to align."""
    pows = {1: y}

    def get(j: int) -> Ciphertext:
        if j in pows:
            return pows[j]
        half = j // 2
        a = get(half)
        b = get(j - half)
        lvl = max(a.level, b.level)
        aa = ckks.mod_drop(ctx, a, lvl - a.level) if a.level < lvl else a
        bb = ckks.mod_drop(ctx, b, lvl - b.level) if b.level < lvl else b
        out = ckks.rescale(ctx, ckks.relinearize(
            ctx, ckks.multiply(ctx, aa, bb), rk))
        pows[j] = out
        return out

    for j in range(2, max_pow + 1):
        get(j)
    return pows


def _const_full(ctx, value, scale, level):
    return ckks.encode_const(ctx, value, scale, level=level)


def _leaf_block(ctx: CkksContext, coeffs: Sequence[complex],
                pows: Dict[int, Ciphertext], level: int,
                target_scale: float) -> Optional[Ciphertext]:
    """Sum_j coeffs[j] * y^j for j < n1, returned at exactly
    (level, target_scale).  Products run one level up at scale
    target_scale*q so the plaintext coefficients keep ~q bits of precision,
    then one rescale lands the block on target_scale exactly.  Constant term
    deferred to add_plain."""
    import jax.numpy as jnp
    lvl_in = level - 1
    q_drop = float(ctx.q_primes[ctx.active(lvl_in) - 1])
    acc = None
    for j, c in enumerate(coeffs):
        if j == 0 or abs(c) < 1e-30:
            continue
        t = pows[j]
        t = ckks.mod_drop(ctx, t, lvl_in - t.level) if t.level < lvl_in else t
        assert t.level == lvl_in, "power deeper than evaluation level"
        pt = _const_full(ctx, c, target_scale * q_drop / t.scale, lvl_in)
        term = Ciphertext(ckks._mul_plain_core(ctx, t.c, pt.m, lvl_in),
                          t.size, lvl_in, target_scale * q_drop)
        acc = term if acc is None else ckks.add(ctx, acc, term)
    if acc is None:  # constant-only block
        z = jnp.zeros((2, ctx.active(level), ctx.n), jnp.uint32)
        acc = Ciphertext(z, 2, level, target_scale)
    else:
        acc = ckks.rescale(ctx, acc)
        acc = Ciphertext(acc.c, acc.size, acc.level, target_scale)
    if abs(coeffs[0]) > 1e-30:
        acc = ckks.add_plain(ctx, acc, _const_full(ctx, coeffs[0],
                                                   target_scale, level))
    return acc


def _eval_rec(ctx: CkksContext, coeffs: List[complex],
              pows: Dict[int, Ciphertext], giants: Dict[int, Ciphertext],
              n1: int, level: int, target_scale: float, rk) -> Ciphertext:
    """Evaluate sum_j coeffs[j] y^j producing a ciphertext at exactly
    (level, target_scale).  Splits at the largest giant power <= len-1."""
    if len(coeffs) <= n1:
        return _leaf_block(ctx, coeffs, pows, level, target_scale)
    g = n1
    while g * 2 < len(coeffs):
        g *= 2
    Tg = giants[g]
    lo, hi = coeffs[:g], coeffs[g:]
    # hi branch evaluated one level up so (hi * Tg) rescales into `level`
    q_drop = float(ctx.q_primes[ctx.active(level - 1) - 1])
    tg_lvl = max(Tg.level, level - 1)
    assert tg_lvl == level - 1, "giant power deeper than evaluation level"
    Tg_a = ckks.mod_drop(ctx, Tg, level - 1 - Tg.level) \
        if Tg.level < level - 1 else Tg
    tau_q = target_scale * q_drop / Tg_a.scale
    q_ct = _eval_rec(ctx, hi, pows, giants, n1, level - 1, tau_q, rk)
    prod = ckks.rescale(ctx, ckks.relinearize(
        ctx, ckks.multiply(ctx, q_ct, Tg_a), rk))
    # float rounding: the computed scale equals target_scale by construction
    prod = Ciphertext(prod.c, prod.size, prod.level, target_scale)
    r_ct = _eval_rec(ctx, lo, pows, giants, n1, level, target_scale, rk)
    return ckks.add(ctx, prod, r_ct)


def eval_poly_bsgs(ctx: CkksContext, y: Ciphertext, coeffs, rk,
                   n1: Optional[int] = None) -> Ciphertext:
    """Evaluate p(y) = sum_j coeffs[j] * y^j with BSGS
    (reference evaluate_poly_from_polynomial_basis + bsgs_index).

    Depth: ceil(log2(deg+1)) + 1 levels from y's level."""
    coeffs = list(np.asarray(coeffs, np.complex128))
    while len(coeffs) > 1 and abs(coeffs[-1]) < 1e-30:
        coeffs.pop()
    deg = len(coeffs) - 1
    if deg == 0:
        raise ValueError("constant polynomial")
    m = max(1, deg.bit_length())            # 2^m > deg
    if n1 is None:
        n1 = 1 << ((m + 1) // 2)
    pows = gen_powers(ctx, y, min(n1 - 1, deg), rk)

    def build_pow(j):
        if j in pows:
            return pows[j]
        half = j // 2
        a, b = build_pow(half), build_pow(j - half)
        lvl = max(a.level, b.level)
        aa = ckks.mod_drop(ctx, a, lvl - a.level) if a.level < lvl else a
        bb = ckks.mod_drop(ctx, b, lvl - b.level) if b.level < lvl else b
        out = ckks.rescale(ctx, ckks.relinearize(
            ctx, ckks.multiply(ctx, aa, bb), rk))
        pows[j] = out
        return out

    giants = {}
    g = n1
    while g <= deg:
        giants[g] = build_pow(g)
        g *= 2
    # output level: deepest hi-branch leaf sits (m - l0) splits below the
    # top and still needs one level for its block products above the babies
    max_lvl = max(p.level for p in list(pows.values()) + list(giants.values()))
    out_level = max(max_lvl + 1, y.level + m + 1)
    target = float(ctx.default_scale)
    return _eval_rec(ctx, coeffs, pows, giants, n1, out_level, target, rk)
