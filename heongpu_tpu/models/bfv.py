"""BFV scheme (exact integer SIMD) — TPU-native implementation.

Functional core (jittable pure functions over pytree contexts/keys/cts) plus
thin class wrappers mirroring the reference API surface
(HEonGPU src/lib/host/bfv/*: HEContextImpl<BFV>, HEKeyGenerator, HEEncoder,
HEEncryptor, HEDecryptor, HEArithmeticOperator — see SURVEY.md §2.3).

Design choices vs the reference (deliberate, TPU-first):
  * RNS primes < 2**30 in uint32 lanes (reference: 60-bit primes, CUDA u64).
  * Public key and evaluation keys live over Q·P in the NTT domain and in
    Montgomery form (scaled by 2^32), so every key MAC is a single-REDC
    mont_mul — the TPU analog of the reference's fused `__ldg` MAC kernel
    (kernel/switchkey.cu:61).
  * BFV ct-ct multiply uses the BEHZ RNS algorithm like the reference
    (kernel/multiplication.cu fast_convertion / cross_multiplication /
    fast_floor), expressed as limb-axis matvecs (ops/rns.py BaseConv).
  * Decryption uses the Bajard {t, gamma} scaled-remainder technique
    (reference kernel/decryption.cu decryption_kernel) — no big-int compose
    on the hot path.
"""

from __future__ import annotations

import dataclasses
import math
from functools import partial, reduce
from typing import Optional, Sequence

import numpy as np
import jax
import jax.numpy as jnp

from ..ops import modmath as mm
from ..ops import ntt as nttm
from ..ops import compose, df64, keyswitch2, polyops, rns
from ..utils import errors, nt, rng
from ..utils.params import default_coeff_modulus, validate_security
from . import ringkit
from .ringkit import (SecretKey, PublicKey, KSKey, GaloisKey, GaloisKeyOne,
                      RingView)

RelinKey = KSKey  # reference-API alias

_prod = lambda xs: reduce(lambda a, b: a * b, xs, 1)


# =========================================================================
# Context
# =========================================================================

@partial(
    jax.tree_util.register_dataclass,
    data_fields=[
        "ntt_qp", "ntt_t", "base_q", "base_qp",
        "delta_mont", "q_mod_t", "half_t", "t_inv_2_32",
        "gt_qhatinv_mont", "gt_half_qhatinv", "dec_mat_mont", "dec_off",
        "gamma_inv_t", "gamma_inv_t_sh",
        "div_p", "enc_div", "ks2", "slot_index",
        "ntt_qbsk", "conv_q_bsk", "conv_q_mt_mat", "neg_qinv_mt",
        "mt_inv_bsk", "mt_inv_bsk_sh", "q_mod_bsk", "q_mod_bsk_mont",
        "t_mont_qbsk", "conv_tq_bsk", "qinv_bsk", "qinv_bsk_sh",
        "conv_b_q", "conv_b_msk_mat", "binv_msk", "binv_msk_sh",
        "b_mod_q", "b_mod_q_sh", "msk_half", "msk_half_mod_q",
    ],
    meta_fields=["n", "logn", "k", "t", "gamma", "mt_bits", "bsk_k",
                 "q_primes", "p_primes", "bsk_primes", "sec_level",
                 "ks_type", "alpha"],
)
@dataclasses.dataclass(frozen=True)
class BfvContext:
    """All precomputed tables for one BFV parameter set (a JAX pytree).

    Plays the role of HEContextImpl<BFV>::generate()
    (reference src/lib/host/bfv/context.cu:391-717)."""
    # --- static metadata
    n: int
    logn: int
    k: int                     # number of Q primes
    t: int                     # plain modulus
    gamma: int
    mt_bits: int               # m_tilde = 2**mt_bits
    bsk_k: int                 # number of B primes (Bsk = B + m_sk)
    q_primes: tuple
    p_primes: tuple
    bsk_primes: tuple          # B primes + [m_sk]
    sec_level: str
    ks_type: str
    alpha: int
    # --- NTT/base tables
    ntt_qp: nttm.NttTables     # over Q ∪ P
    ntt_t: nttm.NttTables      # over [t] (encoder)
    base_q: rns.Base
    base_qp: rns.Base
    # --- plaintext lift (encrypt / add_plain)
    delta_mont: jnp.ndarray    # (k,)  Δ=floor(Q/t) mod q_i, Montgomery form
    q_mod_t: jnp.ndarray       # ()    Q mod t
    half_t: jnp.ndarray        # ()    floor(t/2)
    t_inv_2_32: jnp.ndarray    # ()    t^{-1} mod 2^32
    # --- {t, gamma} decryption
    gt_qhatinv_mont: jnp.ndarray   # (k,) [γt(Q/q_i)^{-1}]_{q_i} mont form
    gt_half_qhatinv: jnp.ndarray   # (k,) [⌊Q/2⌋(Q/q_i)^{-1}]_{q_i}
    dec_mat_mont: jnp.ndarray      # (k, 2) [-(Q/q_i)Q^{-1}]_s mont, s∈{t,γ}
    dec_off: jnp.ndarray           # (2,) [⌊Q/2⌋ Q^{-1}]_s
    gamma_inv_t: jnp.ndarray       # () γ^{-1} mod t
    gamma_inv_t_sh: jnp.ndarray
    # --- keyswitch P-drop
    div_p: rns.DivRoundLastq
    enc_div: tuple             # sequential ÷p stages over Q·P (encrypt path)
    ks2: tuple                 # (KS2Level,) when ks_type == "II"
    # --- encoder slot map
    slot_index: jnp.ndarray        # (n,) int32 NTT-domain index per slot
    # --- BEHZ multiply tables
    ntt_qbsk: nttm.NttTables       # over Q ∪ Bsk
    conv_q_bsk: rns.BaseConv       # q → Bsk
    conv_q_mt_mat: jnp.ndarray     # (k,) [(Q/q_i)]_{m̃}
    neg_qinv_mt: jnp.ndarray       # ()  [-Q^{-1}]_{m̃}
    mt_inv_bsk: jnp.ndarray        # (k_bsk+1,) m̃^{-1} mod b
    mt_inv_bsk_sh: jnp.ndarray
    q_mod_bsk: jnp.ndarray         # (k_bsk+1,) Q mod b
    q_mod_bsk_mont: jnp.ndarray
    t_mont_qbsk: jnp.ndarray       # (k + k_bsk+1,) t in mont form per limb
    conv_tq_bsk: rns.BaseConv      # q → Bsk (for t·u)
    qinv_bsk: jnp.ndarray          # (k_bsk+1,) Q^{-1} mod b
    qinv_bsk_sh: jnp.ndarray
    conv_b_q: rns.BaseConv         # B → q (Shenoy main part)
    conv_b_msk_mat: jnp.ndarray    # (k_bsk,) [(B/b)]_{m_sk} mont form
    binv_msk: jnp.ndarray          # () B^{-1} mod m_sk
    binv_msk_sh: jnp.ndarray
    b_mod_q: jnp.ndarray           # (k,) B mod q_j
    b_mod_q_sh: jnp.ndarray
    msk_half: jnp.ndarray          # () floor(m_sk/2)
    msk_half_mod_q: jnp.ndarray    # (k,) per q_j

    # convenience
    @property
    def qp_primes(self):
        return tuple(self.q_primes) + tuple(self.p_primes)


def make_context(n: int,
                 plain_modulus: int,
                 q_bits: Optional[Sequence[int]] = None,
                 q_primes: Optional[Sequence[int]] = None,
                 sec_level: str = "none",
                 ks_type: str = "I",
                 alpha: int = 1,
                 seed_tables: bool = True) -> BfvContext:
    """Build a BFV context.  `q_bits` like [29,29,29] (last entry NOT special);
    `alpha` 30-bit special primes are appended (Method II uses alpha > 1
    grouped digits, reference keyswitching_type METHOD_II)."""
    logn = n.bit_length() - 1
    assert 1 << logn == n
    if ks_type == "I":
        alpha = 1

    if q_primes is None:
        if q_bits is None:
            q_primes = default_coeff_modulus(n, sec_level)
        else:
            q_primes = []
            used = set()
            for b in q_bits:
                pr = nt.generate_ntt_primes(b, 1, n, exclude=used)[0]
                used.add(pr)
                q_primes.append(pr)
    q_primes = [int(q) for q in q_primes]
    used = set(q_primes)
    p_primes = nt.generate_ntt_primes(30, alpha, n, exclude=used)
    used |= set(p_primes)
    validate_security(n, q_primes + p_primes, sec_level)

    t = int(plain_modulus)
    if not (t % (2 * n) == 1 and nt.is_prime(t)):
        raise errors.ParameterError(
            "plain modulus must be an NTT-friendly prime (t = 1 mod 2n) "
            "for batching; use params.plain_modulus_for(n, bits)")
    if t >= min(q_primes):
        raise errors.ParameterError(
            "plain modulus must be below every Q prime")
    k = len(q_primes)
    Q = _prod(q_primes)
    QP = Q * _prod(p_primes)

    # gamma for decryption: a prime coprime to t and Q, ~2^29
    gamma = nt.generate_ntt_primes(29, 1, n, exclude=used | {t})[0]
    used.add(gamma)

    # BEHZ aux base: B primes (enough to hold N * t * 4 * Q) + m_sk
    extra_bits = logn + t.bit_length() + 3
    bsk_b = k + max(1, math.ceil(extra_bits / 29))
    bsk_primes = nt.generate_ntt_primes(30, bsk_b, n, exclude=used)
    used |= set(bsk_primes)
    m_sk = nt.generate_ntt_primes(29, 1, n, exclude=used)[0]
    bsk_all = list(bsk_primes) + [m_sk]
    mt_bits = 16
    mt = 1 << mt_bits

    qp = q_primes + p_primes
    P = _prod(p_primes)
    B = _prod(bsk_primes)

    u32 = lambda arr: jnp.asarray(np.array(arr, np.uint32))
    mont = lambda vals, ps: u32([v * (1 << 32) % p for v, p in zip(vals, ps)])

    delta = Q // t
    qh = [Q // qi for qi in q_primes]
    qh_inv = [pow(h, -1, qi) for h, qi in zip(qh, q_primes)]
    half_q = Q // 2

    # {t, gamma} decrypt tables
    gt = gamma * t
    gt_qhatinv = [gt % qi * qi_inv % qi for qi, qi_inv in zip(q_primes, qh_inv)]
    gt_half = [half_q % qi * qi_inv % qi for qi, qi_inv in zip(q_primes, qh_inv)]
    dec_mat = np.empty((k, 2), np.uint32)
    for i, qi in enumerate(q_primes):
        for si, s in enumerate((t, gamma)):
            v = (-(qh[i] % s) * pow(Q % s, -1, s)) % s
            dec_mat[i, si] = v * (1 << 32) % s
    dec_off = [half_q % s * pow(Q % s, -1, s) % s for s in (t, gamma)]
    g_inv_t = pow(gamma % t, -1, t)

    # slot index map (5^j orbit composed with the NTT storage order;
    # see SURVEY §2.3 HEEncoder<BFV>)
    m2 = 2 * n
    slot_eval = np.empty(n, np.int64)
    g5 = 1
    for j in range(n // 2):
        slot_eval[j] = (g5 - 1) // 2
        slot_eval[j + n // 2] = (m2 - g5 - 1) // 2
        g5 = g5 * 5 % m2
    slot_index = nttm.inv_eval_order(n)[slot_eval].astype(np.int32)
    assert len(set(slot_index.tolist())) == n

    # BEHZ tables
    conv_q_bsk = rns.BaseConv.build(q_primes, bsk_all)
    conv_q_mt_mat = u32([(Q // qi) % mt for qi in q_primes])
    neg_qinv_mt = jnp.uint32((-pow(Q % mt, -1, mt)) % mt)
    mt_inv_bsk_v = [pow(mt, -1, b) for b in bsk_all]
    qinv_bsk_v = [pow(Q % b, -1, b) for b in bsk_all]
    conv_b_q = rns.BaseConv.build(list(bsk_primes), q_primes)
    conv_b_msk = [(B // b) % m_sk * (1 << 32) % m_sk for b in bsk_primes]
    binv_msk_v = pow(B % m_sk, -1, m_sk)
    b_mod_q_v = [B % qj for qj in q_primes]

    enc_div = []
    remaining = list(q_primes) + list(p_primes)
    for sp in reversed(p_primes):
        remaining = remaining[:-1]
        enc_div.append(rns.DivRoundLastq.build(remaining, sp))
    ks2 = ()
    if ks_type == "II":
        ks2 = (keyswitch2.build_ks2_level(q_primes, p_primes, k, alpha),)

    return BfvContext(
        n=n, logn=logn, k=k, t=t, gamma=gamma, mt_bits=mt_bits, bsk_k=bsk_b,
        q_primes=tuple(q_primes), p_primes=tuple(p_primes),
        bsk_primes=tuple(bsk_all), sec_level=sec_level,
        ks_type=ks_type, alpha=alpha,
        enc_div=tuple(enc_div), ks2=ks2,
        ntt_qp=nttm.build_ntt_tables(qp, n),
        ntt_t=nttm.build_ntt_tables([t], n),
        base_q=rns.Base.build(q_primes),
        base_qp=rns.Base.build(qp),
        delta_mont=mont([delta % qi for qi in q_primes], q_primes),
        q_mod_t=jnp.uint32(Q % t),
        half_t=jnp.uint32(t // 2),
        t_inv_2_32=jnp.uint32(pow(t, -1, 1 << 32)),
        gt_qhatinv_mont=mont(gt_qhatinv, q_primes),
        gt_half_qhatinv=u32(gt_half),
        dec_mat_mont=jnp.asarray(dec_mat),
        dec_off=u32(dec_off),
        gamma_inv_t=jnp.uint32(g_inv_t),
        gamma_inv_t_sh=jnp.uint32(mm.shoup(g_inv_t, t)),
        div_p=rns.DivRoundLastq.build(q_primes, p_primes[0]),
        slot_index=jnp.asarray(slot_index),
        ntt_qbsk=nttm.build_ntt_tables(q_primes + bsk_all, n),
        conv_q_bsk=conv_q_bsk,
        conv_q_mt_mat=conv_q_mt_mat,
        neg_qinv_mt=neg_qinv_mt,
        mt_inv_bsk=u32(mt_inv_bsk_v),
        mt_inv_bsk_sh=u32([mm.shoup(v, b) for v, b in zip(mt_inv_bsk_v, bsk_all)]),
        q_mod_bsk=u32([Q % b for b in bsk_all]),
        q_mod_bsk_mont=mont([Q % b for b in bsk_all], bsk_all),
        t_mont_qbsk=mont([t % p for p in q_primes + bsk_all], q_primes + bsk_all),
        conv_tq_bsk=rns.BaseConv.build(q_primes, bsk_all),
        qinv_bsk=u32(qinv_bsk_v),
        qinv_bsk_sh=u32([mm.shoup(v, b) for v, b in zip(qinv_bsk_v, bsk_all)]),
        conv_b_q=conv_b_q,
        conv_b_msk_mat=u32(conv_b_msk),
        binv_msk=jnp.uint32(binv_msk_v),
        binv_msk_sh=jnp.uint32(mm.shoup(binv_msk_v, m_sk)),
        b_mod_q=u32(b_mod_q_v),
        b_mod_q_sh=u32([mm.shoup(v, qj) for v, qj in zip(b_mod_q_v, q_primes)]),
        msk_half=jnp.uint32(m_sk // 2),
        msk_half_mod_q=u32([(m_sk // 2) % qj for qj in q_primes]),
    )


@partial(jax.tree_util.register_dataclass,
         data_fields=["c"], meta_fields=["size", "in_ntt"])
@dataclasses.dataclass(frozen=True)
class Ciphertext:
    c: jnp.ndarray  # (size, k, n) uint32, coefficient domain unless in_ntt
    size: int
    in_ntt: bool


# =========================================================================
# Encoder (batch slots over Z_t)
# =========================================================================

def encode(ctx: BfvContext, values) -> jnp.ndarray:
    """int64 array (≤ n values, signed ok) -> plaintext poly (n,) uint32 mod t."""
    v = np.asarray(values)
    assert v.size <= ctx.n
    buf = np.zeros(ctx.n, np.int64)
    buf[: v.size] = v
    buf %= ctx.t
    slots = jnp.asarray(buf.astype(np.uint32))
    e = jnp.zeros((ctx.n,), jnp.uint32).at[ctx.slot_index].set(slots)
    return nttm.ntt_inv(e[None, :], ctx.ntt_t)[0]


def decode(ctx: BfvContext, plain) -> np.ndarray:
    e = nttm.ntt_fwd(plain[None, :], ctx.ntt_t)[0]
    return np.asarray(jnp.take(e, ctx.slot_index))


def decode_signed(ctx: BfvContext, plain) -> np.ndarray:
    """Slots as centered signed integers in [-t/2, t/2) (reference int64
    decode overload)."""
    v = decode(ctx, plain).astype(np.int64)
    return np.where(v > (ctx.t - 1) // 2, v - ctx.t, v)


# =========================================================================
# Keygen (delegates to ringkit; cold path, not jitted)
# =========================================================================

def _ring(ctx: BfvContext) -> RingView:
    return RingView(ctx.n, ctx.q_primes, ctx.p_primes, ctx.base_q,
                    ctx.base_qp, ctx.ntt_qp, ctx.div_p)


def keygen_secret(ctx: BfvContext, key, hamming_weight=None) -> SecretKey:
    return ringkit.keygen_secret(_ring(ctx), key, hamming_weight)


def keygen_public(ctx: BfvContext, key, sk: SecretKey, a_seed=None) -> PublicKey:
    return ringkit.keygen_public(_ring(ctx), key, sk, a_seed=a_seed)


def _groups(ctx):
    if ctx.ks_type == "II":
        return tuple(tuple(range(j, min(j + ctx.alpha, ctx.k)))
                     for j in range(0, ctx.k, ctx.alpha))
    return None


def keygen_relin(ctx: BfvContext, key, sk: SecretKey, a_seed=None) -> KSKey:
    return ringkit.keygen_relin(_ring(ctx), key, sk, groups=_groups(ctx),
                                a_seed=a_seed)


def keygen_galois(ctx: BfvContext, key, sk: SecretKey, steps=None,
                  max_shift: int = 8, elts=None, a_seed=None,
                  inv_form: bool = False) -> GaloisKey:
    return ringkit.keygen_galois(_ring(ctx), key, sk, steps, max_shift,
                                 groups=_groups(ctx), elts=elts, a_seed=a_seed,
                                 inv_form=inv_form)


def keygen_switch(ctx: BfvContext, key, sk_old: SecretKey, sk_new: SecretKey) -> KSKey:
    return ringkit.keygen_switch(_ring(ctx), key, sk_new=sk_new, sk_old=sk_old,
                                 groups=_groups(ctx))


# =========================================================================
# Encrypt / Decrypt
# =========================================================================

def _plain_lift(ctx: BfvContext, m):
    """round(Q*m/t) over the Q limbs: Δ·m + fix where
    fix = floor(((Q mod t)·m + t/2)/t)  (exact division trick, see module doc)."""
    qb = ctx.base_q
    p, pinv, *_ = qb.bview()
    dm = mm.mont_mul(m[None, :].astype(jnp.uint32), ctx.delta_mont[:, None], p, pinv)
    # fix term, computed once (independent of limb)
    hi, lo = mm.widening_mul(m.astype(jnp.uint32), ctx.q_mod_t)
    lo2 = lo + ctx.half_t
    hi = hi + (lo2 < lo).astype(jnp.uint32)
    t32 = jnp.uint32(ctx.t)
    mu_t = jnp.uint32(mm.barrett_mu(ctx.t))
    r1t = jnp.uint32(mm.mont_r1(ctx.t))
    r1ts = jnp.uint32(mm.shoup(mm.mont_r1(ctx.t), ctx.t))
    rem = mm.reduce64(hi, lo2, t32, mu_t, r1t, r1ts)
    fix = (lo2 - rem) * ctx.t_inv_2_32          # exact quotient < t (uint32 wrap math)
    return mm.add_mod(dm, fix[None, :], p)      # fix < t < q_i


@rng.drbg_eager
@jax.jit
def encrypt(ctx: BfvContext, pk: PublicKey, plain, key) -> Ciphertext:
    """plain: (n,) uint32 mod t."""
    ku, k0, k1 = rng.split(key, 3)
    qp = ctx.base_qp
    p, pinv, *_ = qp.bview()
    u = nttm.ntt_fwd(rng.ternary_rns(ku, ctx.qp_primes, (ctx.n,)), ctx.ntt_qp)
    c0 = nttm.ntt_inv(mm.mont_mul(pk.pk0, u, p, pinv), ctx.ntt_qp)
    c1 = nttm.ntt_inv(mm.mont_mul(pk.pk1, u, p, pinv), ctx.ntt_qp)
    for stage in ctx.enc_div:
        c0 = stage(c0)
        c1 = stage(c1)
    qb = ctx.base_q
    e0 = rng.gaussian_rns(k0, ctx.q_primes, (ctx.n,))
    e1 = rng.gaussian_rns(k1, ctx.q_primes, (ctx.n,))
    c0 = mm.add_mod(mm.add_mod(c0, e0, qb.p[:, None]), _plain_lift(ctx, plain), qb.p[:, None])
    c1 = mm.add_mod(c1, e1, qb.p[:, None])
    return Ciphertext(jnp.stack([c0, c1]), 2, False)


def _ct_dot_sk(ctx: BfvContext, ct: Ciphertext, sk: SecretKey):
    """c0 + c1 s (+ c2 s^2) mod Q, coefficient domain."""
    kq = ctx.k
    qb = ctx.base_q
    p, pinv, *_ = qb.bview()
    s_mont_q = sk.s_ntt_mont_qp[:kq]
    acc_ntt = mm.mont_mul(nttm.ntt_fwd(ct.c[1], ctx.ntt_qp.slice_limbs(0, kq)),
                          s_mont_q, p, pinv)
    if ct.size == 3:
        s2 = mm.mont_mul(s_mont_q, s_mont_q, p, pinv)
        acc_ntt = mm.add_mod(
            acc_ntt,
            mm.mont_mul(nttm.ntt_fwd(ct.c[2], ctx.ntt_qp.slice_limbs(0, kq)), s2, p, pinv),
            p)
    acc = nttm.ntt_inv(acc_ntt, ctx.ntt_qp.slice_limbs(0, kq))
    return mm.add_mod(ct.c[0], acc, p)


@jax.jit
def decrypt(ctx: BfvContext, sk: SecretKey, ct: Ciphertext) -> jnp.ndarray:
    """Returns plaintext poly (n,) mod t via the {t,γ} scaled-remainder method."""
    y = _ct_dot_sk(ctx, ct, sk)
    qb = ctx.base_q
    p, pinv, *_ = qb.bview()
    z = mm.add_mod(mm.mont_mul(y, ctx.gt_qhatinv_mont[:, None], p, pinv),
                   ctx.gt_half_qhatinv[:, None], p)
    # matvec (k,) x (k,2) -> (2,) over {t, gamma}
    sbase = np.array([ctx.t, ctx.gamma], np.uint64)
    s_p = jnp.asarray(sbase.astype(np.uint32))[:, None]
    s_pinv = jnp.asarray(np.array([mm.mont_pinv(int(v)) for v in sbase], np.uint32))[:, None]
    s_mu = jnp.asarray(np.array([mm.barrett_mu(int(v)) for v in sbase], np.uint32))[:, None]
    s_r1 = np.array([mm.mont_r1(int(v)) for v in sbase], np.uint64)
    s_r1j = jnp.asarray(s_r1.astype(np.uint32))[:, None]
    s_r1sh = jnp.asarray(np.array(
        [mm.shoup(int(r), int(v)) for r, v in zip(s_r1, sbase)], np.uint32))[:, None]
    terms = mm.mont_mul(z[:, None, :], ctx.dec_mat_mont[:, :, None], s_p, s_pinv)
    hi, lo = rns.sum_u32_axis64(terms, axis=0)       # (2, n)
    w = mm.reduce64(hi, lo, s_p, s_mu, s_r1j, s_r1sh)
    w = mm.add_mod(w, ctx.dec_off[:, None], s_p)
    w_t, w_g = w[0], w[1]
    # center w_g mod gamma, fold into w_t
    g32 = jnp.uint32(ctx.gamma)
    neg = w_g > (g32 >> 1)
    mag = jnp.where(neg, g32 - w_g, w_g)
    t32 = jnp.uint32(ctx.t)
    mu_t = jnp.uint32(mm.barrett_mu(ctx.t))
    mag_t = mm.barrett32(mag, t32, mu_t)
    diff = jnp.where(neg, mm.add_mod(w_t, mag_t, t32), mm.sub_mod(w_t, mag_t, t32))
    return mm.shoup_mul(diff, ctx.gamma_inv_t, ctx.gamma_inv_t_sh, t32)


def noise_budget(ctx: BfvContext, sk: SecretKey, ct: Ciphertext) -> float:
    """Bits of remaining noise budget, all on device — the TPU analog of the
    reference's compose_kernel + find_max_norm_kernel block reduction
    (src/lib/kernel/decryption.cu).  Large noise is measured by the
    fractional-sum log2 (ops/compose.py frac_log2_norm, exact to ~2^-44
    relative); once the noise is small enough to escape that window the
    gamma-pair exact compose takes over."""
    y = _ct_dot_sk(ctx, ct, sk)
    m = decrypt(ctx, sk, ct)
    lift = _plain_lift(ctx, m)
    diff = mm.sub_mod(y, lift, ctx.base_q.p[:, None])
    primes = tuple(int(q) for q in ctx.q_primes)
    tabs = compose.build_tables(primes)
    logq = math.log2(_prod(ctx.q_primes))
    big = float(compose.frac_log2_norm(diff, primes, tabs))
    if big > logq - 44:
        return max(0.0, logq - 1.0 - big)
    v = df64.to_f64(compose.compose_small(diff, primes, tabs))
    max_norm = float(np.max(np.abs(v)))
    if max_norm == 0:
        return float(logq - 1.0)
    return max(0.0, logq - 1.0 - math.log2(max_norm))


# =========================================================================
# Arithmetic operator
# =========================================================================

@jax.jit
def add(ctx: BfvContext, a: Ciphertext, b: Ciphertext) -> Ciphertext:
    assert a.size == b.size
    return Ciphertext(mm.add_mod(a.c, b.c, ctx.base_q.p[:, None]), a.size, False)


@jax.jit
def sub(ctx: BfvContext, a: Ciphertext, b: Ciphertext) -> Ciphertext:
    return Ciphertext(mm.sub_mod(a.c, b.c, ctx.base_q.p[:, None]), a.size, False)


@jax.jit
def negate(ctx: BfvContext, a: Ciphertext) -> Ciphertext:
    return Ciphertext(mm.neg_mod(a.c, ctx.base_q.p[:, None]), a.size, False)


@jax.jit
def add_plain(ctx: BfvContext, a: Ciphertext, plain) -> Ciphertext:
    c0 = mm.add_mod(a.c[0], _plain_lift(ctx, plain), ctx.base_q.p[:, None])
    return Ciphertext(a.c.at[0].set(c0), a.size, False)


@jax.jit
def sub_plain(ctx: BfvContext, a: Ciphertext, plain) -> Ciphertext:
    c0 = mm.sub_mod(a.c[0], _plain_lift(ctx, plain), ctx.base_q.p[:, None])
    return Ciphertext(a.c.at[0].set(c0), a.size, False)


@jax.jit
def multiply_plain(ctx: BfvContext, a: Ciphertext, plain) -> Ciphertext:
    """ct × encoded plaintext (NTT pointwise over Q)."""
    qb = ctx.base_q
    p, pinv, r2, *_ = qb.bview()
    tb = ctx.ntt_qp.slice_limbs(0, ctx.k)
    m_rns = mm.barrett32(plain[None, :].astype(jnp.uint32), p, qb.bview()[3])
    m_ntt_mont = mm.to_mont(nttm.ntt_fwd(m_rns, tb), p, pinv, r2)
    out = []
    for i in range(a.size):
        prod = mm.mont_mul(nttm.ntt_fwd(a.c[i], tb), m_ntt_mont, p, pinv)
        out.append(nttm.ntt_inv(prod, tb))
    return Ciphertext(jnp.stack(out), a.size, False)


def _behz_lift_to_bsk(ctx: BfvContext, x):
    """[x]_q -> representative of x in Bsk (SmMRq'd), x: (..., k, n)."""
    # scale by m_tilde in q
    qb = ctx.base_q
    p, pinv, *_ = qb.bview()
    mt = 1 << ctx.mt_bits
    mt_mont = jnp.asarray(np.array(
        [mt * (1 << 32) % q for q in ctx.q_primes], np.uint32))[:, None]
    x_mt = mm.mont_mul(x, mt_mont, p, pinv)
    z = ctx.conv_q_bsk.scaled_digits(x_mt)
    x_bsk = ctx.conv_q_bsk.convert_from_digits(z)          # (..., k_bsk+1, n)
    # m_tilde row: power-of-two modulus, plain wraparound arithmetic + mask
    mask = jnp.uint32(mt - 1)
    x_mtld = jnp.sum(z * ctx.conv_q_mt_mat[:, None], axis=-2) & mask
    r = (x_mtld * ctx.neg_qinv_mt) & mask                  # [-x/Q]_mt
    # center r, then x'' = (x' + Q*r) * mt^{-1} mod b
    half_mt = jnp.uint32(mt // 2)
    r_neg = r > half_mt
    r_mag = jnp.where(r_neg, mt - r, r)                    # (..., n)
    bb = ctx.conv_q_bsk.obase
    pb, pbinv, pbr2, *_ = bb.bview()
    q_r = mm.mont_mul(r_mag[..., None, :].astype(jnp.uint32),
                      ctx.q_mod_bsk_mont[:, None], pb, pbinv)
    x_corr = jnp.where(r_neg[..., None, :], mm.sub_mod(x_bsk, q_r, pb),
                       mm.add_mod(x_bsk, q_r, pb))
    return mm.shoup_mul(x_corr, ctx.mt_inv_bsk[:, None], ctx.mt_inv_bsk_sh[:, None], pb)


def _behz_scale_floor(ctx: BfvContext, u_q, u_bsk):
    """floor(t*u/Q) in Bsk given u over q and Bsk (fast_floor)."""
    qb, bb = ctx.base_q, ctx.conv_q_bsk.obase
    kq = ctx.k
    p, pinv, *_ = qb.bview()
    pb, pbinv, *_ = bb.bview()
    t_mont_q = ctx.t_mont_qbsk[:kq, None]
    t_mont_b = ctx.t_mont_qbsk[kq:, None]
    tu_q = mm.mont_mul(u_q, t_mont_q, p, pinv)
    tu_b = mm.mont_mul(u_bsk, t_mont_b, pb, pbinv)
    conv = ctx.conv_tq_bsk(tu_q)                           # [tu]_q lifted to Bsk (+αQ)
    num = mm.sub_mod(tu_b, conv, pb)
    return mm.shoup_mul(num, ctx.qinv_bsk[:, None], ctx.qinv_bsk_sh[:, None], pb)


def _behz_bsk_to_q(ctx: BfvContext, w):
    """Exact Shenoy-Kumaresan conversion Bsk -> q.  w: (..., k_bsk+1, n)."""
    kb = ctx.bsk_k
    w_b, w_msk = w[..., :kb, :], w[..., kb, :]
    z = ctx.conv_b_q.scaled_digits(w_b)
    w_q = ctx.conv_b_q.convert_from_digits(z)              # (..., k, n)
    # alpha_sk = [(conv_msk - w_msk) * B^{-1}]_{m_sk}, centered
    msk = int(ctx.bsk_primes[-1])
    msk32 = jnp.uint32(msk)
    msk_pinv = jnp.uint32(mm.mont_pinv(msk))
    msk_mu = jnp.uint32(mm.barrett_mu(msk))
    r1 = mm.mont_r1(msk)
    terms = mm.mont_mul(z, ctx.conv_b_msk_mat[:, None], msk32, msk_pinv)
    hi, lo = rns.sum_u32_axis64(terms, axis=-2)
    conv_msk = mm.reduce64(hi, lo, msk32, msk_mu, jnp.uint32(r1),
                           jnp.uint32(mm.shoup(r1, msk)))
    diff = mm.sub_mod(conv_msk, w_msk, msk32)
    alpha = mm.shoup_mul(diff, ctx.binv_msk, ctx.binv_msk_sh, msk32)
    a_neg = alpha > ctx.msk_half
    a_mag = jnp.where(a_neg, msk32 - alpha, alpha)          # (..., n)
    qb = ctx.base_q
    p, _, _, mu, _, _ = qb.bview()
    a_mag_q = mm.barrett32(a_mag[..., None, :], p, mu)
    corr = mm.shoup_mul(a_mag_q, ctx.b_mod_q[:, None], ctx.b_mod_q_sh[:, None], p)
    return jnp.where(a_neg[..., None, :], mm.add_mod(w_q, corr, p),
                     mm.sub_mod(w_q, corr, p))


@jax.jit
def multiply(ctx: BfvContext, a: Ciphertext, b: Ciphertext) -> Ciphertext:
    """BEHZ ct-ct multiply: (2-poly) x (2-poly) -> 3-poly, relin required."""
    errors.check_size(a.size, 2, "multiply")
    errors.check_size(b.size, 2, "multiply")
    kq = ctx.k
    tb_q = ctx.ntt_qp.slice_limbs(0, kq)
    tb_bsk = ctx.ntt_qbsk.slice_limbs(kq, kq + ctx.bsk_k + 1)
    qb = ctx.base_q
    bb = ctx.conv_q_bsk.obase
    p, pinv, r2, *_ = qb.bview()
    pb, pbinv, pbr2, *_ = bb.bview()

    a_bsk = _behz_lift_to_bsk(ctx, a.c)
    b_bsk = _behz_lift_to_bsk(ctx, b.c)

    a_q_ntt = nttm.ntt_fwd(a.c, tb_q)
    b_q_ntt = nttm.ntt_fwd(b.c, tb_q)
    a_b_ntt = nttm.ntt_fwd(a_bsk, tb_bsk)
    b_b_ntt = nttm.ntt_fwd(b_bsk, tb_bsk)

    def cross(x, y, pp, ppinv, rr2):
        x0m = mm.to_mont(x[0], pp, ppinv, rr2)
        x1m = mm.to_mont(x[1], pp, ppinv, rr2)
        c0 = mm.mont_mul(x0m, y[0], pp, ppinv)
        c1 = mm.add_mod(mm.mont_mul(x0m, y[1], pp, ppinv),
                        mm.mont_mul(x1m, y[0], pp, ppinv), pp)
        c2 = mm.mont_mul(x1m, y[1], pp, ppinv)
        return jnp.stack([c0, c1, c2])

    u_q = nttm.ntt_inv(cross(a_q_ntt, b_q_ntt, p, pinv, r2), tb_q)
    u_bsk = nttm.ntt_inv(cross(a_b_ntt, b_b_ntt, pb, pbinv, pbr2), tb_bsk)

    w = _behz_scale_floor(ctx, u_q, u_bsk)
    out = _behz_bsk_to_q(ctx, w)
    return Ciphertext(out, 3, False)


def _ks_dispatch(ctx: BfvContext, poly_q, k0, k1):
    """Keyswitch one coeff-domain poly over Q (Method I or II)."""
    if ctx.ks_type == "II":
        return keyswitch2.keyswitch2(
            poly_q, k0, k1, ctx.ks2[0], ctx.ntt_qp, ctx.base_qp,
            in_ntt=False, out_ntt=False,
            ntt_q_level=ctx.ntt_qp.slice_limbs(0, ctx.k))
    return ringkit.keyswitch_core(poly_q, k0, k1, ctx.base_qp,
                                  ctx.ntt_qp, ctx.div_p, False, False)



def _k1_of(ctx, kk):
    """Uniform key half, regenerated on device when the key is stored
    stripped (seed-expanded, k1=None) — see ringkit.ensure_k1."""
    return ringkit.ensure_k1(_ring(ctx), kk)

@jax.jit
def relinearize(ctx: BfvContext, ct: Ciphertext, rk: RelinKey) -> Ciphertext:
    errors.check_size(ct.size, 3, "relinearize")
    d0, d1 = _ks_dispatch(ctx, ct.c[2], rk.k0, _k1_of(ctx, rk))
    p = ctx.base_q.p[:, None]
    return Ciphertext(jnp.stack([mm.add_mod(ct.c[0], d0, p),
                                 mm.add_mod(ct.c[1], d1, p)]), 2, False)


@jax.jit
def apply_galois(ctx: BfvContext, ct: Ciphertext, gk1: GaloisKeyOne) -> Ciphertext:
    errors.check_size(ct.size, 2, "apply_galois")
    p = ctx.base_q.p[:, None]
    if gk1.inv_form:
        # σ once on the combined pair: σ(c0 + KS'(c1)) = σ(c0) + KS(σ(c1))
        d0, d1 = _ks_dispatch(ctx, ct.c[1], gk1.k0, _k1_of(ctx, gk1))
        out = jnp.stack([mm.add_mod(ct.c[0], d0, p), d1])
        return Ciphertext(polyops.apply_galois_coeff(
            out, gk1.perm_coeff_src, gk1.perm_coeff_neg, p), 2, False)
    g0 = polyops.apply_galois_coeff(ct.c[0], gk1.perm_coeff_src, gk1.perm_coeff_neg, p)
    g1 = polyops.apply_galois_coeff(ct.c[1], gk1.perm_coeff_src, gk1.perm_coeff_neg, p)
    d0, d1 = _ks_dispatch(ctx, g1, gk1.k0, _k1_of(ctx, gk1))
    return Ciphertext(jnp.stack([mm.add_mod(g0, d0, p), d1]), 2, False)


def rotate_rows(ctx: BfvContext, ct: Ciphertext, gk: GaloisKey, step: int) -> Ciphertext:
    """Rotate row slots by `step` (power-of-two decomposition over stored keys)."""
    n = ctx.n
    step = step % (n // 2)
    if step == 0:
        return ct
    out = ct
    remaining = step
    for j in reversed(range(16)):
        sz = 1 << j
        while remaining >= sz:
            g = polyops.steps_to_galois_elt(sz, n)
            if g in gk.keys:
                out = apply_galois(ctx, out, gk.keys[g])
                remaining -= sz
            else:
                break
        if remaining == 0:
            break
    if remaining:
        raise ValueError(f"no galois key chain reaches step {step}")
    return out


def rotate_columns(ctx: BfvContext, ct: Ciphertext, gk: GaloisKey) -> Ciphertext:
    return apply_galois(ctx, ct, gk.keys["conj"])


@jax.jit
def switch_key(ctx: BfvContext, ct: Ciphertext, swk: RelinKey) -> Ciphertext:
    """Re-encrypt a size-2 ct from old key to new key (swk encrypts s_old)."""
    errors.check_size(ct.size, 2, "switch_key")
    d0, d1 = _ks_dispatch(ctx, ct.c[1], swk.k0, _k1_of(ctx, swk))
    p = ctx.base_q.p[:, None]
    return Ciphertext(jnp.stack([mm.add_mod(ct.c[0], d0, p), d1]), 2, False)





def multiply_power_of_x(ctx: BfvContext, ct: Ciphertext, k: int) -> Ciphertext:
    """ct * X^k (negacyclic monomial multiply; reference
    HEOperator<BFV>::multiply_power_of_X, operator.cuh:935)."""
    errors.check_ntt_domain(ct.in_ntt, False, "multiply_power_of_x")
    src, neg = polyops.negacyclic_shift_tables(k, ctx.n)
    out = polyops.negacyclic_shift(ct.c, src, neg, ctx.base_q.p[:, None])
    return Ciphertext(out, ct.size, False)


def transform_to_ntt(ctx: BfvContext, ct: Ciphertext) -> Ciphertext:
    """Coefficient -> NTT domain (reference transform_to_ntt_inplace,
    operator.cuh:1027-1157).  NTT-form cts support pointwise add/sub and
    plain multiplication without per-op transforms."""
    errors.check_ntt_domain(ct.in_ntt, False, "transform_to_ntt")
    return Ciphertext(nttm.ntt_fwd(ct.c, ctx.ntt_qp.slice_limbs(0, ctx.k)),
                      ct.size, True)


def transform_from_ntt(ctx: BfvContext, ct: Ciphertext) -> Ciphertext:
    errors.check_ntt_domain(ct.in_ntt, True, "transform_from_ntt")
    return Ciphertext(nttm.ntt_inv(ct.c, ctx.ntt_qp.slice_limbs(0, ctx.k)),
                      ct.size, False)


def print_parameters(ctx: BfvContext):
    """Reference HEContext::print_parameters analog."""
    total = sum(int(q).bit_length() for q in ctx.q_primes)
    ptotal = sum(int(q).bit_length() for q in ctx.p_primes)
    print(f"/ BFV parameters\n"
          f"| poly_modulus_degree: {ctx.n}\n"
          f"| coeff_modulus: {total}+{ptotal} bits "
          f"({len(ctx.q_primes)} Q + {len(ctx.p_primes)} P primes)\n"
          f"| plain_modulus: {ctx.t}\n"
          f"| keyswitching: METHOD_{ctx.ks_type} (alpha={ctx.alpha})\n"
          f"\\ security: {ctx.sec_level}")


def hoist(ctx: BfvContext, ct: Ciphertext):
    """Phase-1 keyswitch digits of ct.c[1] (decompose + NTT over Q̃) shared
    by many rotations — the BFV hoisting of the reference
    (bfv_duplicate_kernel + fast rotations, kernel/switchkey.cuh).
    Method I: per-prime broadcast digits; Method II: grouped FastBconv
    digits (the reference hoists both, operator.cu:4674/5092)."""
    errors.check_size(ct.size, 2, "hoist")
    errors.check_ntt_domain(ct.in_ntt, False, "hoist")
    if ctx.ks_type == "II":
        ks2 = ctx.ks2[0]
        digs = [ks2.convs[j](ct.c[1][..., g[0]: g[-1] + 1, :])
                for j, g in enumerate(ks2.groups)]
        return nttm.ntt_fwd(jnp.stack(digs, axis=-3), ctx.ntt_qp)
    return ringkit.hoist_digits(ct.c[1], ctx.base_qp, ctx.ntt_qp, in_ntt=False)


def rotate_rows_hoisted(ctx: BfvContext, ct: Ciphertext, d_ntt,
                        gk1: GaloisKeyOne) -> Ciphertext:
    """Apply one Galois rotation reusing hoisted digits: the automorphism is
    an NTT-domain gather on the digits (commutes with decomposition up to
    per-limb negation absorbed by the permutation table)."""
    p = ctx.base_q.p[:, None]
    gk1_k1 = _k1_of(ctx, gk1)
    # inv_form: MAC the UNPERMUTED digits, permute only the finished pair
    # ((d~+1) -> 2 gathered polys; same algebra as ckks.rotate_hoisted_qtilde)
    dp = d_ntt if gk1.inv_form else polyops.apply_galois_ntt(d_ntt,
                                                             gk1.perm_ntt)
    if ctx.ks_type == "II":
        acc0 = rns.lazy_mac_mont(dp, gk1.k0, ctx.base_qp)
        acc1 = rns.lazy_mac_mont(dp, gk1_k1, ctx.base_qp)
        coeff = nttm.ntt_inv(jnp.stack([acc0, acc1]), ctx.ntt_qp)
        for stage in ctx.ks2[0].div_stages:
            coeff = stage(coeff)
        out = coeff
    else:
        acc0, acc1 = ringkit.hoisted_mac(dp, gk1.k0, gk1_k1, ctx.base_qp)
        out = ringkit.ks_finish(jnp.stack([acc0, acc1]), ctx.ntt_qp,
                                ctx.div_p, out_ntt=False)
    if gk1.inv_form:
        comb = jnp.stack([mm.add_mod(ct.c[0], out[0], p), out[1]])
        return Ciphertext(polyops.apply_galois_coeff(
            comb, gk1.perm_coeff_src, gk1.perm_coeff_neg, p), 2, False)
    g0 = polyops.apply_galois_coeff(ct.c[0], gk1.perm_coeff_src,
                                    gk1.perm_coeff_neg, p)
    return Ciphertext(jnp.stack([mm.add_mod(g0, out[0], p), out[1]]),
                      2, False)
