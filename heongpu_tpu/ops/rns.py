"""RNS machinery: exact 64-bit accumulation, fast base conversion, RNS digit
decomposition, and divide-round-by-last-modulus.

These are the TPU equivalents of the reference's base-change kernels
(HEonGPU kernel/multiplication.cu fast_convertion / fast_floor,
kernel/switchkey.cu cipher_broadcast / divide_round_lastq_*): every one is a
small matrix-vector product over the limb axis plus pointwise fixups, which
maps onto large fused VPU ops (and later onto MXU digit matmuls).

Convention: conversion matrices are stored in Montgomery form
(M * 2^32 mod p_out) so a single REDC per term yields the exact product.
"""

from __future__ import annotations

import dataclasses
from functools import partial, reduce
from typing import Sequence

import numpy as np
import jax
import jax.numpy as jnp

from . import modmath as mm


@partial(
    jax.tree_util.register_dataclass,
    data_fields=["p", "pinv", "r2", "mu", "r1", "r1_sh"],
    meta_fields=[],
)
@dataclasses.dataclass(frozen=True)
class Base:
    """Per-modulus constants for a list of RNS primes, shape (L,) each."""
    p: jnp.ndarray
    pinv: jnp.ndarray
    r2: jnp.ndarray
    mu: jnp.ndarray
    r1: jnp.ndarray
    r1_sh: jnp.ndarray

    @staticmethod
    def build(primes: Sequence[int]) -> "Base":
        j = lambda f: jnp.asarray(np.array([f(int(q)) for q in primes], np.uint32))
        return Base(
            p=jnp.asarray(np.asarray(primes, np.uint32)),
            pinv=j(mm.mont_pinv), r2=j(mm.mont_r2), mu=j(mm.barrett_mu),
            r1=j(mm.mont_r1),
            r1_sh=jnp.asarray(np.array(
                [mm.shoup(mm.mont_r1(int(q)), int(q)) for q in primes], np.uint32)),
        )

    def bview(self, extra_dims: int = 1):
        """Constants reshaped (L, 1, ..., 1) for broadcasting over (..., L, N...)."""
        shp = (self.p.shape[0],) + (1,) * extra_dims
        r = lambda a: a.reshape(shp)
        return (r(self.p), r(self.pinv), r(self.r2), r(self.mu),
                r(self.r1), r(self.r1_sh))

    def slice(self, lo: int, hi: int) -> "Base":
        t = lambda a: a[lo:hi]
        return Base(t(self.p), t(self.pinv), t(self.r2), t(self.mu),
                    t(self.r1), t(self.r1_sh))

    def __len__(self):
        return int(self.p.shape[0])


def mul_pointwise(a, b, base: Base):
    """Exact a*b mod p over (..., L, N)."""
    p, pinv, r2, *_ = base.bview()
    return mm.mul_mod(a, b, p, pinv, r2)


def mont_mul_pointwise(a, b_mont, base: Base):
    """a * b with b pre-scaled by 2^32 (one REDC)."""
    p, pinv, *_ = base.bview()
    return mm.mont_mul(a, b_mont, p, pinv)


def add_pointwise(a, b, base: Base):
    return mm.add_mod(a, b, base.bview()[0])


def sub_pointwise(a, b, base: Base):
    return mm.sub_mod(a, b, base.bview()[0])


def neg_pointwise(a, base: Base):
    return mm.neg_mod(a, base.bview()[0])


def sum64(terms_hi_lo):
    """Exact pairwise-tree sum of a list of (hi, lo) uint32 pairs mod 2^64."""
    items = list(terms_hi_lo)
    while len(items) > 1:
        nxt = []
        for i in range(0, len(items) - 1, 2):
            nxt.append(mm.add64(items[i][0], items[i][1],
                                items[i + 1][0], items[i + 1][1]))
        if len(items) % 2:
            nxt.append(items[-1])
        items = nxt
    return items[0]


def sum_u32_axis64(vals, axis: int):
    """Exact sum of uint32 values along `axis`, returned as (hi, lo) pair."""
    vals = jnp.moveaxis(vals, axis, 0)
    k = vals.shape[0]
    zero = jnp.zeros_like(vals[0])
    # pack pairs first (uint32+uint32 < 2^33 needs the carry)
    items = []
    for i in range(0, k - 1, 2):
        s = vals[i] + vals[i + 1]
        carry = (s < vals[i]).astype(jnp.uint32)
        items.append((carry, s))
    if k % 2:
        items.append((zero, vals[-1]))
    return sum64(items)


def lazy_mac_mont(d_ntt, karr, base: "Base", axis: int = -3):
    """Σ_j d_j · k_j mod p with k in Montgomery form — the keyswitch hot MAC
    (reference keyswitch_multiply_accumulate_kernel, kernel/switchkey.cu:61).

    Lazy: raw 64-bit products accumulate exactly as (hi, lo) pairs with no
    per-term reduction (≤16 products of <2^30 values fit 64 bits), then one
    REDC-with-pre-Barrett per output element."""
    p, pinv, _, mu, *_ = base.bview()
    d = d_ntt.shape[axis]
    take = lambda a, j: jnp.take(a, j, axis=axis)

    def fold(hi, lo):
        # X = hi·2^32 + lo = Σ d·(k·R) exactly; want X·R^{-1} mod p.
        # Pre-reduce hi (hi·2^32 ≡ (hi mod p)·2^32) so one REDC pass lands
        # below 2p+1.
        hi_m = mm.barrett32(hi, p, mu)
        m = lo * pinv
        mhi, _ = mm.widening_mul(m, p)
        t = hi_m + mhi + (lo != 0).astype(lo.dtype)
        return mm.cond_sub(mm.cond_sub(t, p), p)

    acc = None
    for c0 in range(0, d, 16):          # 16 30-bit products fit 64 bits
        hi = lo = None
        for j in range(c0, min(c0 + 16, d)):
            phi, plo = mm.widening_mul(take(d_ntt, j), take(karr, j))
            if hi is None:
                hi, lo = phi, plo
            else:
                hi, lo = mm.add64(hi, lo, phi, plo)
        part = fold(hi, lo)
        acc = part if acc is None else mm.add_mod(acc, part, p)
    return acc


@partial(
    jax.tree_util.register_dataclass,
    data_fields=["ibase", "obase", "qhat_inv", "qhat_inv_sh", "mat_mont"],
    meta_fields=[],
)
@dataclasses.dataclass(frozen=True)
class BaseConv:
    """Fast base conversion q -> m (Bajard FastBconv): x̂_m = Σ_i |x_i q̂_i^{-1}|_{q_i} · |q/q_i|_m.

    The result equals [x]_m + α·q·(mod m) with 0 ≤ α < k (the classic
    approximate conversion); callers correct α per scheme (SmMRq for BEHZ,
    Shenoy-Kumaresan for Bsk→q, γ-trick for decryption).
    """
    ibase: Base
    obase: Base
    qhat_inv: jnp.ndarray     # (k_in,)  |(q/q_i)^{-1}|_{q_i}
    qhat_inv_sh: jnp.ndarray  # (k_in,)  shoup companion
    mat_mont: jnp.ndarray     # (k_in, k_out)  |q/q_i|_m * 2^32 mod m

    @staticmethod
    def build(in_primes: Sequence[int], out_primes: Sequence[int]) -> "BaseConv":
        q = reduce(lambda a, b: a * b, in_primes, 1)
        k_in, k_out = len(in_primes), len(out_primes)
        qh_inv = [pow(q // qi, -1, qi) for qi in in_primes]
        mat = np.empty((k_in, k_out), np.uint32)
        for i, qi in enumerate(in_primes):
            for mj, m in enumerate(out_primes):
                mat[i, mj] = ((q // qi) % m) * (1 << 32) % m
        return BaseConv(
            ibase=Base.build(in_primes), obase=Base.build(out_primes),
            qhat_inv=jnp.asarray(np.array(qh_inv, np.uint32)),
            qhat_inv_sh=jnp.asarray(np.array(
                [mm.shoup(v, p) for v, p in zip(qh_inv, in_primes)], np.uint32)),
            mat_mont=jnp.asarray(mat),
        )

    def scaled_digits(self, x):
        """z_i = |x_i * (q/q_i)^{-1}|_{q_i} — pointwise Shoup scaling."""
        return mm.shoup_mul(x, self.qhat_inv[:, None], self.qhat_inv_sh[:, None],
                            self.ibase.p[:, None])

    def convert_from_digits(self, z):
        """Given z (..., k_in, N) return x̂ (..., k_out, N) in the out base.
        Lazy MAC over the input limbs (same trick as the keyswitch inner
        product): raw 64-bit products, one REDC per output element."""
        zz = z[..., :, None, :]                       # (..., k_in, 1, N)
        mat = self.mat_mont[:, :, None]               # (k_in, k_out, 1)
        return lazy_mac_mont(zz, mat, self.obase, axis=-3)

    def __call__(self, x):
        return self.convert_from_digits(self.scaled_digits(x))


def decompose_to_base(x, obase: Base):
    """RNS-digit broadcast: x (..., k, N) residues (digit i = limb i's value)
    reduced into every modulus of `obase` → (..., k, k_out, N).

    TPU analog of the reference's cipher_broadcast_kernel (kernel/switchkey.cu)."""
    po, _, _, muo, _, _ = obase.bview()
    return mm.barrett32(x[..., :, None, :], po, muo)


@partial(
    jax.tree_util.register_dataclass,
    data_fields=["qbase", "half", "half_mod", "pinv_mod", "pinv_mod_sh", "p_last"],
    meta_fields=[],
)
@dataclasses.dataclass(frozen=True)
class DivRoundLastq:
    """Exact rounding division by the last modulus (the special prime P or a
    dropped CKKS level): out_j = (x_j + h_j - [x_P + h]_P) * P^{-1} mod q_j.

    TPU analog of divide_round_lastq_* (reference kernel/switchkey.cu)."""
    qbase: Base              # remaining moduli
    half: jnp.ndarray        # () uint32: floor(P/2)
    half_mod: jnp.ndarray    # (k,) floor(P/2) mod q_j
    pinv_mod: jnp.ndarray    # (k,) P^{-1} mod q_j
    pinv_mod_sh: jnp.ndarray
    p_last: jnp.ndarray      # () uint32: P

    @staticmethod
    def build(q_primes: Sequence[int], p_last: int) -> "DivRoundLastq":
        half = p_last // 2
        pin = [pow(p_last, -1, qj) for qj in q_primes]
        return DivRoundLastq(
            qbase=Base.build(q_primes),
            half=jnp.uint32(half),
            half_mod=jnp.asarray(np.array([half % qj for qj in q_primes], np.uint32)),
            pinv_mod=jnp.asarray(np.array(pin, np.uint32)),
            pinv_mod_sh=jnp.asarray(np.array(
                [mm.shoup(v, qj) for v, qj in zip(pin, q_primes)], np.uint32)),
            p_last=jnp.uint32(p_last),
        )

    def __call__(self, x):
        """x: (..., k+1, N) coeff-domain over q_0..q_{k-1}, P.  Returns (..., k, N)."""
        xq = x[..., :-1, :]
        xp = x[..., -1:, :]
        r = mm.add_mod(xp, self.half, self.p_last)     # [x_P + h]_P
        pj, _, _, muj, _, _ = self.qbase.bview()
        r_mod = mm.barrett32(r, pj, muj)               # broadcast reduce to each q_j
        num = mm.sub_mod(mm.add_mod(xq, self.half_mod[:, None], pj), r_mod, pj)
        return mm.shoup_mul(num, self.pinv_mod[:, None], self.pinv_mod_sh[:, None], pj)
