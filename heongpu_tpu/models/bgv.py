"""BGV scheme (exact integer SIMD, least-significant-bit noise) — TPU-native.

The reference advertises BGV as "Very Soon" (/root/reference/README.md:24);
this module delivers it ahead of the reference, built on the same ring
machinery as BFV/CKKS (models/ringkit.py) with the two BGV-specific twists:

  * noise lives at the LSB: phase = m + t*e, so keys/encryption use t-scaled
    gaussians (ringkit noise_scale=t) and plaintexts lift as plain m (no
    Delta scaling);
  * every division (encrypt's /P, keyswitch's /P, leveled mod-switch by
    q_last) is the *t-exact* division: add t*v with v = [-x t^{-1}]_{q_last}
    so the division is exact over the integers and the phase stays congruent
    to m modulo t up to a known factor q_last^{-1} mod t, which is tracked
    as per-level metadata and folded out at decode (the standard RNS-BGV
    correction-factor bookkeeping).

Leveled structure mirrors models/ckks.py (mod_switch instead of rescale);
decryption composes [phase]_Q centered mod t fully on device
(ops/compose.py mod_prime_centered).  Method-I keyswitching.
"""

from __future__ import annotations

import dataclasses
import math
from functools import partial, reduce
from typing import Optional, Sequence

import numpy as np
import jax
import jax.numpy as jnp

from ..ops import compose, modmath as mm
from ..ops import ntt as nttm
from ..ops import polyops, rns
from ..utils import errors, nt, rng
from ..utils.params import validate_security
from . import ringkit
from .ringkit import SecretKey, PublicKey, KSKey, GaloisKey, GaloisKeyOne

_prod = lambda xs: reduce(lambda a, b: a * b, xs, 1)


# =========================================================================
# t-exact division stage
# =========================================================================

@partial(jax.tree_util.register_dataclass,
         data_fields=["qbase", "neg_tinv", "neg_tinv_sh", "t_mod",
                      "t_mod_mont", "qlast_half", "qlast_inv", "qlast_inv_sh",
                      "p_last", "mu_last"],
         meta_fields=[])
@dataclasses.dataclass(frozen=True)
class DivExactT:
    """out_j = (x_j + t*v) * q_last^{-1} mod q_j with v = [-x_last t^{-1}]
    centered — exact integer division that preserves the message mod t up to
    the q_last^{-1} factor (BGV mod-switch / keyswitch divide; the BGV
    counterpart of the reference's divide_round_lastq_* kernels)."""
    qbase: rns.Base
    neg_tinv: jnp.ndarray       # () [-t^{-1}]_{q_last}
    neg_tinv_sh: jnp.ndarray
    t_mod: jnp.ndarray          # (k,) [t]_{q_j}
    t_mod_mont: jnp.ndarray     # (k,) Montgomery form
    qlast_half: jnp.ndarray     # () floor(q_last/2)
    qlast_inv: jnp.ndarray      # (k,) q_last^{-1} mod q_j
    qlast_inv_sh: jnp.ndarray
    p_last: jnp.ndarray         # () q_last
    mu_last: jnp.ndarray

    @staticmethod
    def build(q_remaining: Sequence[int], q_last: int, t: int) -> "DivExactT":
        ninv = (-pow(t, -1, q_last)) % q_last
        qin = [pow(q_last, -1, qj) for qj in q_remaining]
        base = rns.Base.build(q_remaining)
        tm = np.array([t % qj for qj in q_remaining], np.uint32)
        r2 = np.array([mm.mont_r2(qj) for qj in q_remaining], np.uint64)
        tmont = (tm.astype(np.uint64) << np.uint64(32)) % \
            np.array(q_remaining, np.uint64)
        return DivExactT(
            qbase=base,
            neg_tinv=jnp.uint32(ninv),
            neg_tinv_sh=jnp.uint32(mm.shoup(ninv, q_last)),
            t_mod=jnp.asarray(tm),
            t_mod_mont=jnp.asarray(tmont.astype(np.uint32)),
            qlast_half=jnp.uint32(q_last // 2),
            qlast_inv=jnp.asarray(np.array(qin, np.uint32)),
            qlast_inv_sh=jnp.asarray(np.array(
                [mm.shoup(v, qj) for v, qj in zip(qin, q_remaining)],
                np.uint32)),
            p_last=jnp.uint32(q_last),
            mu_last=jnp.uint32(mm.barrett_mu(q_last)),
        )

    def __call__(self, x):
        """x: (..., k+1, N) coeff domain over q_0..q_{k-1}, q_last ->
        (..., k, N)."""
        xq = x[..., :-1, :]
        xl = x[..., -1:, :]
        v = mm.shoup_mul(xl, self.neg_tinv, self.neg_tinv_sh, self.p_last)
        # centered lift of v into each q_j
        neg = v > self.qlast_half
        vmag = jnp.where(neg, self.p_last - v, v)
        pj, pinv, _, muj, _, _ = self.qbase.bview()
        vm = mm.barrett32(vmag, pj, muj)
        v_j = jnp.where(neg, mm.neg_mod(vm, pj), vm)
        tv = mm.mont_mul(v_j, self.t_mod_mont[:, None], pj, pinv)
        num = mm.add_mod(xq, tv, pj)
        return mm.shoup_mul(num, self.qlast_inv[:, None],
                            self.qlast_inv_sh[:, None], pj)


# =========================================================================
# Context
# =========================================================================

@partial(
    jax.tree_util.register_dataclass,
    data_fields=["ntt_qp", "ntt_t", "base_q", "base_qp", "slot_index",
                 "enc_div", "div_p_lvl", "mod_sw"],
    meta_fields=["n", "logn", "k", "t", "q_primes", "p_primes",
                 "sec_level", "p_inv_t"],
)
@dataclasses.dataclass(frozen=True)
class BgvContext:
    """Precomputed tables for one BGV parameter set (a JAX pytree);
    the BGV analog of HEContextImpl (reference context engines §2.3/§2.4)."""
    n: int
    logn: int
    k: int
    t: int
    q_primes: tuple
    p_primes: tuple
    sec_level: str
    p_inv_t: int                # [P^{-1}]_t (fresh-ciphertext factor)
    ntt_qp: nttm.NttTables
    ntt_t: nttm.NttTables
    base_q: rns.Base
    base_qp: rns.Base
    slot_index: jnp.ndarray
    enc_div: tuple              # t-exact ÷p stages over Q·P (encrypt path)
    div_p_lvl: tuple            # per-level t-exact ÷P (keyswitch)
    mod_sw: tuple               # per-level t-exact ÷q_last (mod switch)

    def active(self, level: int) -> int:
        return self.k - level

    @property
    def qp_primes(self):
        return tuple(self.q_primes) + tuple(self.p_primes)

    def ntt_q(self, level: int) -> nttm.NttTables:
        return self.ntt_qp.slice_limbs(0, self.active(level))

    def base_q_at(self, level: int) -> rns.Base:
        ka = self.active(level)
        return rns.Base.build(self.q_primes[:ka])


def make_context(n: int, plain_modulus: int,
                 q_bits: Optional[Sequence[int]] = None,
                 sec_level: str = "none") -> BgvContext:
    logn = n.bit_length() - 1
    if (1 << logn) != n:
        raise errors.ParameterError("poly degree must be a power of two")
    t = int(plain_modulus)
    if not (t % (2 * n) == 1 and nt.is_prime(t)):
        raise errors.ParameterError(
            "plain modulus must be an NTT-friendly prime (t = 1 mod 2n)")
    if q_bits is None:
        q_bits = [29, 29, 29]
    q_primes, used = [], {t}
    for b in q_bits:
        pr = nt.generate_ntt_primes(b, 1, n, exclude=used)[0]
        used.add(pr)
        q_primes.append(pr)
    p_primes = nt.generate_ntt_primes(30, 1, n, exclude=used)
    validate_security(n, q_primes + p_primes, sec_level)
    k = len(q_primes)

    ntt_qp = nttm.build_ntt_tables(q_primes + p_primes, n)
    ntt_t = nttm.build_ntt_tables([t], n)

    # slot map: 5^j orbit composed with the NTT storage order (same as BFV)
    m2 = 2 * n
    slot_eval = np.empty(n, np.int64)
    g5 = 1
    for j in range(n // 2):
        slot_eval[j] = (g5 - 1) // 2
        slot_eval[j + n // 2] = (m2 - g5 - 1) // 2
        g5 = g5 * 5 % m2
    slot = nttm.inv_eval_order(n)[slot_eval].astype(np.int32)
    assert len(set(slot.tolist())) == n

    # encrypt-path t-exact ÷p over QP (sequentially drop the special primes)
    enc_div = []
    remaining = list(q_primes) + list(p_primes)
    for sp in reversed(p_primes):
        remaining = remaining[:-1]
        enc_div.append(DivExactT.build(remaining, sp, t))

    P = _prod(p_primes)
    # single special prime: one t-exact ÷P stage per level (Method-I ks)
    div_p_lvl = tuple(DivExactT.build(list(q_primes[: k - l]), p_primes[-1], t)
                      for l in range(k))
    mod_sw = tuple(DivExactT.build(list(q_primes[: k - l - 1]),
                                   q_primes[k - l - 1], t)
                   for l in range(k - 1))

    return BgvContext(
        n=n, logn=logn, k=k, t=t,
        q_primes=tuple(q_primes), p_primes=tuple(p_primes),
        sec_level=sec_level, p_inv_t=pow(P % t, -1, t),
        ntt_qp=ntt_qp, ntt_t=ntt_t,
        base_q=rns.Base.build(q_primes),
        base_qp=rns.Base.build(q_primes + p_primes),
        slot_index=jnp.asarray(slot),
        enc_div=tuple(enc_div), div_p_lvl=div_p_lvl, mod_sw=mod_sw,
    )


def _ring(ctx: BgvContext) -> ringkit.RingView:
    return ringkit.RingView(
        n=ctx.n, q_primes=ctx.q_primes, p_primes=ctx.p_primes,
        base_q=ctx.base_q, base_qp=ctx.base_qp, ntt_qp=ctx.ntt_qp,
        div_p=None)


# =========================================================================
# Objects
# =========================================================================

@partial(jax.tree_util.register_dataclass,
         data_fields=["c"], meta_fields=["size", "level", "factor"])
@dataclasses.dataclass(frozen=True)
class Ciphertext:
    """Coefficient-domain leveled BGV ciphertext (size, k-level, n).
    `factor` is the accumulated [Π divisors^{-1}]_t correction the phase
    carries (phase ≡ m * factor mod t) — the standard RNS-BGV bookkeeping."""
    c: jnp.ndarray
    size: int
    level: int
    factor: int = 1


# =========================================================================
# Keygen
# =========================================================================

def keygen_secret(ctx, key, hamming_weight=None) -> SecretKey:
    return ringkit.keygen_secret(_ring(ctx), key, hamming_weight)


def keygen_public(ctx, key, sk, a_seed=None) -> PublicKey:
    return ringkit.keygen_public(_ring(ctx), key, sk, a_seed=a_seed,
                                 noise_scale=ctx.t)


def keygen_relin(ctx, key, sk, a_seed=None) -> KSKey:
    return ringkit.keygen_relin(_ring(ctx), key, sk, a_seed=a_seed,
                                noise_scale=ctx.t)


def keygen_galois(ctx, key, sk, steps=None, max_shift: int = 8,
                  elts=None, a_seed=None, inv_form: bool = False) -> GaloisKey:
    return ringkit.keygen_galois(_ring(ctx), key, sk, steps, max_shift,
                                 elts=elts, a_seed=a_seed, noise_scale=ctx.t,
                                 inv_form=inv_form)


def keygen_switch(ctx, key, sk_old, sk_new, a_seed=None) -> KSKey:
    return ringkit.keygen_switch(_ring(ctx), key, sk_old, sk_new,
                                 a_seed=a_seed, noise_scale=ctx.t)


# =========================================================================
# Encoder (identical slot map to BFV)
# =========================================================================

def encode(ctx: BgvContext, values) -> jnp.ndarray:
    v = np.asarray(values)
    if v.size > ctx.n:
        raise errors.ParameterError("too many slots")
    buf = np.zeros(ctx.n, np.int64)
    buf[: v.size] = np.asarray(v, np.int64)
    buf %= ctx.t
    slots = jnp.asarray(buf.astype(np.uint32))
    e = jnp.zeros((ctx.n,), jnp.uint32).at[ctx.slot_index].set(slots)
    return nttm.ntt_inv(e[None, :], ctx.ntt_t)[0]


def decode(ctx: BgvContext, plain) -> np.ndarray:
    e = nttm.ntt_fwd(plain[None, :], ctx.ntt_t)[0]
    return np.asarray(jnp.take(e, ctx.slot_index))


# =========================================================================
# Encrypt / decrypt
# =========================================================================

def _lift_m(ctx: BgvContext, plain_t, level: int):
    """plain (n,) mod t -> centered residues over the active base."""
    half = ctx.t // 2
    neg = plain_t > jnp.uint32(half)
    mag = jnp.where(neg, jnp.uint32(ctx.t) - plain_t, plain_t)
    ka = ctx.active(level)
    out = []
    for qj in ctx.q_primes[:ka]:
        pj = jnp.uint32(int(qj))
        muj = jnp.uint32(mm.barrett_mu(int(qj)))
        mj = mm.barrett32(mag, pj, muj)
        out.append(jnp.where(neg, mm.neg_mod(mj, pj), mj))
    return jnp.stack(out)


@rng.drbg_eager
@jax.jit
def encrypt(ctx: BgvContext, pk: PublicKey, plain, key) -> Ciphertext:
    """plain: (n,) uint32 mod t (from encode)."""
    ku, k0, k1 = rng.split(key, 3)
    qp = ctx.base_qp
    p, pinv, *_ = qp.bview()
    u = nttm.ntt_fwd(rng.ternary_rns(ku, ctx.qp_primes, (ctx.n,)), ctx.ntt_qp)
    c0 = nttm.ntt_inv(mm.mont_mul(pk.pk0, u, p, pinv), ctx.ntt_qp)
    c1 = nttm.ntt_inv(mm.mont_mul(pk.pk1, u, p, pinv), ctx.ntt_qp)
    e0 = rng.gaussian_rns(k0, ctx.qp_primes, (ctx.n,), noise_scale=ctx.t)
    e1 = rng.gaussian_rns(k1, ctx.qp_primes, (ctx.n,), noise_scale=ctx.t)
    c0 = mm.add_mod(c0, e0, p)
    c1 = mm.add_mod(c1, e1, p)
    for stage in ctx.enc_div:
        c0 = stage(c0)
        c1 = stage(c1)
    qb = ctx.base_q
    # m is added AFTER the exact /P (the divided part is a multiple of t up
    # to the t-correction), so the fresh factor is 1
    c0 = mm.add_mod(c0, _lift_m(ctx, plain, 0), qb.p[:, None])
    return Ciphertext(jnp.stack([c0, c1]), 2, 0, 1)


def _phase(ctx: BgvContext, sk: SecretKey, ct: Ciphertext):
    ka = ctx.active(ct.level)
    tb = ctx.ntt_q(ct.level)
    p = tb.p[:, None]
    pinv = tb.pinv[:, None]
    s = sk.s_ntt_mont_qp[:ka]
    acc = nttm.ntt_fwd(ct.c[1], tb)
    cur = s
    out = mm.mont_mul(acc, cur, p, pinv)
    for j in range(2, ct.size):
        cur = mm.mont_mul(cur, sk.s_ntt_mont_qp[:ka], p, pinv)
        out = mm.add_mod(out, mm.mont_mul(nttm.ntt_fwd(ct.c[j], tb),
                                          cur, p, pinv), p)
    return mm.add_mod(ct.c[0], nttm.ntt_inv(out, tb), p)


def decrypt(ctx: BgvContext, sk: SecretKey, ct: Ciphertext) -> jnp.ndarray:
    """-> (n,) uint32 mod t (feed to decode)."""
    ka = ctx.active(ct.level)
    primes = tuple(int(q) for q in ctx.q_primes[:ka])
    ph = _phase(ctx, sk, ct)
    tabs = compose.build_tables(primes)
    raw = compose.mod_prime_centered(ph, primes, ctx.t, tabs)
    # undo the accumulated division factor
    f = pow(int(ct.factor), -1, ctx.t)
    tp = jnp.uint32(ctx.t)
    return mm.shoup_mul(raw, jnp.uint32(f), jnp.uint32(mm.shoup(f, ctx.t)), tp)


def noise_budget(ctx: BgvContext, sk: SecretKey, ct: Ciphertext) -> float:
    """log2(Q_l / 2|phase|): bits until decryption failure."""
    ka = ctx.active(ct.level)
    primes = tuple(int(q) for q in ctx.q_primes[:ka])
    ph = _phase(ctx, sk, ct)
    tabs = compose.build_tables(primes)
    logq = math.log2(_prod(primes))
    big = float(compose.frac_log2_norm(ph, primes, tabs))
    return max(0.0, logq - 1.0 - big)


# =========================================================================
# Arithmetic
# =========================================================================

def _check(a: Ciphertext, b: Ciphertext):
    errors.check_level(a.level, b.level)
    if a.factor != b.factor:
        raise errors.ScaleMismatchError(
            f"BGV correction factors differ ({a.factor} vs {b.factor}); "
            f"align levels the same way on both operands")


def add(ctx, a: Ciphertext, b: Ciphertext) -> Ciphertext:
    _check(a, b)
    p = ctx.base_q_at(a.level).p[:, None]
    return Ciphertext(mm.add_mod(a.c, b.c, p), a.size, a.level, a.factor)


def sub(ctx, a: Ciphertext, b: Ciphertext) -> Ciphertext:
    _check(a, b)
    p = ctx.base_q_at(a.level).p[:, None]
    return Ciphertext(mm.sub_mod(a.c, b.c, p), a.size, a.level, a.factor)


def negate(ctx, a: Ciphertext) -> Ciphertext:
    p = ctx.base_q_at(a.level).p[:, None]
    return Ciphertext(mm.neg_mod(a.c, p), a.size, a.level, a.factor)


def add_plain(ctx, a: Ciphertext, plain) -> Ciphertext:
    """plain: (n,) mod t.  The ciphertext phase is m*factor; scale the
    plaintext the same way so the sum stays consistent."""
    f = int(a.factor)
    tp = jnp.uint32(ctx.t)
    pf = mm.shoup_mul(plain, jnp.uint32(f), jnp.uint32(mm.shoup(f, ctx.t)), tp)
    lift = _lift_m(ctx, pf, a.level)
    p = ctx.base_q_at(a.level).p[:, None]
    return Ciphertext(a.c.at[0].set(mm.add_mod(a.c[0], lift, p)),
                      a.size, a.level, a.factor)


def sub_plain(ctx, a: Ciphertext, plain) -> Ciphertext:
    f = int(a.factor)
    tp = jnp.uint32(ctx.t)
    pf = mm.shoup_mul(plain, jnp.uint32(f), jnp.uint32(mm.shoup(f, ctx.t)), tp)
    lift = _lift_m(ctx, pf, a.level)
    p = ctx.base_q_at(a.level).p[:, None]
    return Ciphertext(a.c.at[0].set(mm.sub_mod(a.c[0], lift, p)),
                      a.size, a.level, a.factor)


def multiply_plain(ctx, a: Ciphertext, plain) -> Ciphertext:
    """Pointwise NTT-domain multiply by the plaintext polynomial (unscaled:
    factors are unaffected)."""
    tb = ctx.ntt_q(a.level)
    p = tb.p[:, None]
    pinv = tb.pinv[:, None]
    r2 = tb.r2[:, None]
    m = _lift_m(ctx, plain, a.level)
    m_ntt = mm.to_mont(nttm.ntt_fwd(m, tb), p, pinv, r2)
    out = nttm.ntt_inv(mm.mont_mul(nttm.ntt_fwd(a.c, tb), m_ntt[None],
                                   p, pinv), tb)
    return Ciphertext(out, a.size, a.level, a.factor)


def multiply(ctx, a: Ciphertext, b: Ciphertext) -> Ciphertext:
    """(c0,c1)x(d0,d1) -> 3 polys (NTT-domain cross product); factors
    multiply, which mod_switch/decrypt bookkeeping absorbs because both
    operands carry the same level factor (phase product = m1 m2 f_l^2; the
    squared factor is rebased by dec_factor tracking at decrypt)."""
    _check(a, b)
    errors.check_size(a.size, 2, "multiply")
    errors.check_size(b.size, 2, "multiply")
    tb = ctx.ntt_q(a.level)
    p = tb.p[:, None]
    pinv = tb.pinv[:, None]
    r2 = tb.r2[:, None]
    A = nttm.ntt_fwd(a.c, tb)
    B = mm.to_mont(nttm.ntt_fwd(b.c, tb), p, pinv, r2)
    c0 = mm.mont_mul(A[0], B[0], p, pinv)
    c1 = mm.add_mod(mm.mont_mul(A[0], B[1], p, pinv),
                    mm.mont_mul(A[1], B[0], p, pinv), p)
    c2 = mm.mont_mul(A[1], B[1], p, pinv)
    out = nttm.ntt_inv(jnp.stack([c0, c1, c2]), tb)
    return Ciphertext(out, 3, a.level, a.factor * b.factor % ctx.t)


def _ks(ctx, poly, k0, k1, level):
    """Method-I keyswitch of one poly over the leveled basis with the t-exact
    ÷P (assumes a single special prime)."""
    ka = ctx.active(level)
    lp = len(ctx.p_primes)
    limbs = list(range(ka)) + list(range(ctx.k, ctx.k + lp))
    base = rns.Base.build([ctx.qp_primes[i] for i in limbs])
    tb_full = ctx.ntt_qp
    idx = jnp.asarray(np.array(limbs, np.int32))
    # leveled tables: take the sub-basis rows
    sub = _sub_tables(ctx, level)
    d_ntt = ringkit.hoist_digits(poly, base, sub, in_ntt=False)
    acc0, acc1 = ringkit.hoisted_mac(
        d_ntt, _slice_key(ctx, k0, level), _slice_key(ctx, k1, level), base)
    coeff = nttm.ntt_inv(jnp.stack([acc0, acc1]), sub)
    out = ctx.div_p_lvl[level](coeff)
    return out[0], out[1]


def _sub_tables(ctx, level):
    ka = ctx.active(level)
    full = ctx.ntt_qp
    if level == 0:
        return full
    # rows [0:ka] + the special rows
    return _concat_tables(full.slice_limbs(0, ka),
                          full.slice_limbs(ctx.k, ctx.k + len(ctx.p_primes)))


def _concat_tables(a: nttm.NttTables, b: nttm.NttTables) -> nttm.NttTables:
    cat = lambda x, y: jnp.concatenate([x, y], axis=0)
    return nttm.NttTables(
        n=a.n, logn=a.logn, n1=a.n1, n2=a.n2, mxu=None,
        p=cat(a.p, b.p), pinv=cat(a.pinv, b.pinv), r2=cat(a.r2, b.r2),
        mu=cat(a.mu, b.mu), r1=cat(a.r1, b.r1), r1_sh=cat(a.r1_sh, b.r1_sh),
        psi=cat(a.psi, b.psi), psi_sh=cat(a.psi_sh, b.psi_sh),
        ipsi_n=cat(a.ipsi_n, b.ipsi_n), ipsi_n_sh=cat(a.ipsi_n_sh, b.ipsi_n_sh),
        tw_mat=cat(a.tw_mat, b.tw_mat), tw_mat_sh=cat(a.tw_mat_sh, b.tw_mat_sh),
        itw_mat=cat(a.itw_mat, b.itw_mat),
        itw_mat_sh=cat(a.itw_mat_sh, b.itw_mat_sh),
        tw1=tuple(cat(x, y) for x, y in zip(a.tw1, b.tw1)),
        tw1_sh=tuple(cat(x, y) for x, y in zip(a.tw1_sh, b.tw1_sh)),
        itw1=tuple(cat(x, y) for x, y in zip(a.itw1, b.itw1)),
        itw1_sh=tuple(cat(x, y) for x, y in zip(a.itw1_sh, b.itw1_sh)),
        tw2=tuple(cat(x, y) for x, y in zip(a.tw2, b.tw2)),
        tw2_sh=tuple(cat(x, y) for x, y in zip(a.tw2_sh, b.tw2_sh)),
        itw2=tuple(cat(x, y) for x, y in zip(a.itw2, b.itw2)),
        itw2_sh=tuple(cat(x, y) for x, y in zip(a.itw2_sh, b.itw2_sh)),
    )


def _slice_key(ctx, k_arr, level):
    """Restrict a (d, k+p, n) Method-I key to the level basis."""
    ka = ctx.active(level)
    return jnp.concatenate([k_arr[:ka, :ka], k_arr[:ka, ctx.k:]], axis=1)


def relinearize(ctx, a: Ciphertext, rk: KSKey) -> Ciphertext:
    errors.check_size(a.size, 3, "relinearize")
    d0, d1 = _ks(ctx, a.c[2], rk.k0, ringkit.ensure_k1(_ring(ctx), rk), a.level)
    p = ctx.base_q_at(a.level).p[:, None]
    return Ciphertext(jnp.stack([mm.add_mod(a.c[0], d0, p),
                                 mm.add_mod(a.c[1], d1, p)]), 2, a.level,
                      a.factor)


def mod_switch(ctx, a: Ciphertext) -> Ciphertext:
    """Drop the last active limb with the t-exact division (BGV noise
    management; the reference's leveled mod-drop analog)."""
    if ctx.active(a.level) <= 1:
        raise errors.LevelMismatchError("no limb left to switch away")
    stage = ctx.mod_sw[a.level]
    q_dropped = int(ctx.q_primes[ctx.active(a.level) - 1])
    f = a.factor * pow(q_dropped % ctx.t, -1, ctx.t) % ctx.t
    return Ciphertext(stage(a.c), a.size, a.level + 1, f)


def apply_galois(ctx, a: Ciphertext, gk1: GaloisKeyOne) -> Ciphertext:
    errors.check_size(a.size, 2, "apply_galois")
    p = ctx.base_q_at(a.level).p[:, None]
    if gk1.inv_form:
        d0, d1 = _ks(ctx, a.c[1], gk1.k0,
                     ringkit.ensure_k1(_ring(ctx), gk1), a.level)
        out = jnp.stack([mm.add_mod(a.c[0], d0, p), d1])
        return Ciphertext(polyops.apply_galois_coeff(
            out, gk1.perm_coeff_src, gk1.perm_coeff_neg, p), 2, a.level,
            a.factor)
    g0 = polyops.apply_galois_coeff(a.c[0], gk1.perm_coeff_src,
                                    gk1.perm_coeff_neg, p)
    g1 = polyops.apply_galois_coeff(a.c[1], gk1.perm_coeff_src,
                                    gk1.perm_coeff_neg, p)
    d0, d1 = _ks(ctx, g1, gk1.k0, ringkit.ensure_k1(_ring(ctx), gk1), a.level)
    return Ciphertext(jnp.stack([mm.add_mod(g0, d0, p), d1]), 2, a.level,
                      a.factor)


def rotate_rows(ctx, a: Ciphertext, gk: GaloisKey, step: int) -> Ciphertext:
    g = polyops.steps_to_galois_elt(step, ctx.n)
    if g in gk.keys:
        return apply_galois(ctx, a, gk.keys[g])
    out = a
    remaining = step % (ctx.n // 2)
    j = 0
    while remaining:
        if remaining & 1:
            out = apply_galois(ctx, out,
                               gk.keys[polyops.steps_to_galois_elt(1 << j, ctx.n)])
        remaining >>= 1
        j += 1
    return out


def print_parameters(ctx: BgvContext):
    total = sum(int(q).bit_length() for q in ctx.q_primes)
    print(f"/ BGV parameters\n"
          f"| poly_modulus_degree: {ctx.n}\n"
          f"| coeff_modulus: {total} bits ({ctx.k} Q + "
          f"{len(ctx.p_primes)} P primes)\n"
          f"| plain_modulus: {ctx.t}\n"
          f"\\ security: {ctx.sec_level}")
