"""N-out-of-N multiparty computation for BFV and CKKS.

Parity with HEonGPU's HEMultiPartyManager (src/lib/host/{bfv,ckks}/
mpcmanager.cu, SURVEY §2.3/§2.6/§3.6): collective public-key generation,
2-round collective relinearization-key generation, single-round collective
Galois keys, threshold (fuse) decryption with noise flooding, and
single-round collective bootstrapping.

Protocol notes (standard RLWE MPC, Mouchet et al. — matching the reference's
kernels):
  * the common reference string ('a' polynomials) is derived from a shared
    seed through the deterministic counter-based PRNG — the TPU analog of the
    reference reseeding its DRBG with a common seed
    (mpcmanager.cu:1578 RNG.set(common_seed));
  * all shares are ordinary arrays — parties exchange them out of band
    (serializer) exactly like the reference examples do in-process.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import List

import numpy as np
import jax
import jax.numpy as jnp

from ..ops import modmath as mm
from ..ops import ntt as nttm
from ..ops import polyops, rns
from ..utils import rng
from . import bfv, ckks, ringkit
from .ringkit import SecretKey, PublicKey, KSKey, GaloisKey, GaloisKeyOne, RingView

SMUDGE_BITS = 40  # noise-flooding magnitude for threshold decryption


# ---------------------------------------------------------------------
# Common reference strings
# ---------------------------------------------------------------------

def crs_uniform(ring: RingView, seed: int, shape) -> jnp.ndarray:
    """Common 'a' polynomial(s) over QP (NTT domain) from a shared seed."""
    return rng.uniform_rns(rng.new_key(seed), ring.qp_primes, shape)


# ---------------------------------------------------------------------
# Collective public key
# ---------------------------------------------------------------------

@rng.drbg_eager
@jax.jit
def pk_share(ring: RingView, sk: SecretKey, a, key):
    """Party share: -(a*s_i + e_i)  (reference threshold_pk_addition)."""
    p, pinv, *_ = ring.base_qp.bview()
    e = nttm.ntt_fwd(rng.gaussian_rns(key, ring.qp_primes, (ring.n,)), ring.ntt_qp)
    return mm.neg_mod(mm.add_mod(mm.mont_mul(a, sk.s_ntt_mont_qp, p, pinv), e, p), p)


def pk_assemble(ring: RingView, shares: List[jnp.ndarray], a) -> PublicKey:
    p, pinv, r2, *_ = ring.base_qp.bview()
    acc = shares[0]
    for s in shares[1:]:
        acc = mm.add_mod(acc, s, p)
    return PublicKey(mm.to_mont(acc, p, pinv, r2), mm.to_mont(a, p, pinv, r2))


# ---------------------------------------------------------------------
# Collective relinearization key (2-round protocol)
# ---------------------------------------------------------------------

@partial(jax.tree_util.register_dataclass, data_fields=["u_mont"], meta_fields=[])
@dataclasses.dataclass(frozen=True)
class RelinEphemeral:
    u_mont: jnp.ndarray  # ephemeral secret (NTT+mont over QP)


def relin_round1(ring: RingView, sk: SecretKey, a_d, key):
    """Round 1: d0_i = -u_i*a + s_i*g + e0, d1_i = s_i*a + e1.
    a_d: CRS of shape (d, k+p, n)."""
    k = ring.k
    ke_u, ke0, ke1 = rng.split(key, 3)
    p, pinv, r2, *_ = ring.base_qp.bview()
    u = rng.ternary_rns(ke_u, ring.qp_primes, (ring.n,))
    u_mont = mm.to_mont(nttm.ntt_fwd(u, ring.ntt_qp), p, pinv, r2)
    e0 = nttm.ntt_fwd(jnp.moveaxis(rng.gaussian_rns(ke0, ring.qp_primes, (k, ring.n)), 0, 1),
                      ring.ntt_qp)
    e1 = nttm.ntt_fwd(jnp.moveaxis(rng.gaussian_rns(ke1, ring.qp_primes, (k, ring.n)), 0, 1),
                      ring.ntt_qp)
    d0 = mm.neg_mod(mm.mont_mul(a_d, u_mont[None], p, pinv), p)
    # + s_i * g (P*s on limb i of digit i)
    P = 1
    for q in ring.p_primes:
        P *= q
    sel = np.zeros((k, len(ring.qp_primes)), np.uint32)
    for i, qi in enumerate(ring.q_primes):
        sel[i, i] = P % qi
    sg = mm.mont_mul(sk.s_ntt_mont_qp[None], jnp.asarray(sel)[:, :, None], p[None], pinv[None])
    d0 = mm.add_mod(mm.add_mod(d0, sg, p), e0, p)
    d1 = mm.add_mod(mm.mont_mul(a_d, sk.s_ntt_mont_qp[None], p, pinv), e1, p)
    return (d0, d1), RelinEphemeral(u_mont)


def relin_round2(ring: RingView, sk: SecretKey, eph: RelinEphemeral,
                 d0_sum, d1_sum, key):
    """Round 2: b_i = s_i*d0, c_i = (u_i - s_i)*d1 (fresh noise on each)."""
    ke0, ke1 = rng.split(key)
    k = ring.k
    p, pinv, *_ = ring.base_qp.bview()
    e2 = nttm.ntt_fwd(jnp.moveaxis(rng.gaussian_rns(ke0, ring.qp_primes, (k, ring.n)), 0, 1),
                      ring.ntt_qp)
    e3 = nttm.ntt_fwd(jnp.moveaxis(rng.gaussian_rns(ke1, ring.qp_primes, (k, ring.n)), 0, 1),
                      ring.ntt_qp)
    b = mm.add_mod(mm.mont_mul(d0_sum, sk.s_ntt_mont_qp[None], p, pinv), e2, p)
    u_minus_s = mm.sub_mod(eph.u_mont, sk.s_ntt_mont_qp, p)
    c = mm.add_mod(mm.mont_mul(d1_sum, u_minus_s[None], p, pinv), e3, p)
    return b, c


def relin_assemble(ring: RingView, round1_shares, round2_shares) -> KSKey:
    p, pinv, r2, *_ = ring.base_qp.bview()

    def _sum(xs):
        acc = xs[0]
        for x in xs[1:]:
            acc = mm.add_mod(acc, x, p)
        return acc

    d1 = _sum([s[1] for s in round1_shares])
    b = _sum([s[0] for s in round2_shares])
    c = _sum([s[1] for s in round2_shares])
    k0 = mm.add_mod(b, c, p)
    return KSKey(mm.to_mont(k0, p, pinv, r2), mm.to_mont(d1, p, pinv, r2))


def relin_crs(ring: RingView, seed: int):
    return crs_uniform(ring, seed, (ring.k, ring.n)).transpose(1, 0, 2)


# ---------------------------------------------------------------------
# Collective Galois keys (single round)
# ---------------------------------------------------------------------

def galois_share(ring: RingView, sk: SecretKey, g: int, a_d, key):
    """share_i = -(a*s_i + e_i) + gamma_g(s_i)*gadget."""
    k = ring.k
    src, neg = polyops.galois_perm_coeff(g, ring.n)
    p, pinv, r2, *_ = ring.base_qp.bview()
    s_g = polyops.apply_galois_coeff(
        rng.signed_to_rns(sk.s_coeff, ring.qp_primes), src, neg,
        ring.base_qp.p[:, None])
    sg_mont = mm.to_mont(nttm.ntt_fwd(s_g, ring.ntt_qp), p, pinv, r2)
    e = nttm.ntt_fwd(jnp.moveaxis(rng.gaussian_rns(key, ring.qp_primes, (k, ring.n)), 0, 1),
                     ring.ntt_qp)
    h = mm.neg_mod(mm.add_mod(mm.mont_mul(a_d, sk.s_ntt_mont_qp[None], p, pinv), e, p), p)
    P = 1
    for q in ring.p_primes:
        P *= q
    sel = np.zeros((k, len(ring.qp_primes)), np.uint32)
    for i, qi in enumerate(ring.q_primes):
        sel[i, i] = P % qi
    sg_g = mm.mont_mul(sg_mont[None], jnp.asarray(sel)[:, :, None], p[None], pinv[None])
    return mm.add_mod(h, sg_g, p)


def galois_assemble(ring: RingView, g: int, shares, a_d) -> GaloisKeyOne:
    p, pinv, r2, *_ = ring.base_qp.bview()
    acc = shares[0]
    for s in shares[1:]:
        acc = mm.add_mod(acc, s, p)
    src, neg = polyops.galois_perm_coeff(g, ring.n)
    perm_ntt = polyops.galois_perm_ntt(g, ring.n)
    return GaloisKeyOne(mm.to_mont(acc, p, pinv, r2), mm.to_mont(a_d, p, pinv, r2),
                        src, neg, perm_ntt, g)


# ---------------------------------------------------------------------
# Threshold decryption (partial decrypt + fuse)
# ---------------------------------------------------------------------

def _smudge_noise(key, primes, n, bits: int = SMUDGE_BITS):
    """Flooding noise (uniform in ±2^bits) in RNS form.  BFV uses the default
    2^40; CKKS threshold decryption uses a smaller magnitude because the
    flooding error lands directly in the decoded fixed-point values."""
    if bits <= 30:
        mag = rng.randint(key, (n,), -(1 << bits), 1 << bits)
        return rng.signed_to_rns(mag, primes)
    mag = rng.randint(key, (n,), -(1 << 30), 1 << 30)
    lo = rng.signed_to_rns(mag, primes)
    hi_bits = bits - 30
    mag2 = rng.randint(rng.fold_in(key, 1), (n,),
                              0, 1 << hi_bits, dtype=jnp.int32)
    hi = rng.signed_to_rns(mag2, primes)
    p = jnp.asarray(np.asarray(primes, np.uint32))[:, None]
    sh = jnp.asarray(np.array([(1 << 30) % int(q) for q in primes], np.uint32))[:, None]
    pinv = jnp.asarray(np.array([mm.mont_pinv(int(q)) for q in primes], np.uint32))[:, None]
    r2 = jnp.asarray(np.array([mm.mont_r2(int(q)) for q in primes], np.uint32))[:, None]
    return mm.add_mod(lo, mm.mul_mod(hi, jnp.broadcast_to(sh, hi.shape), p, pinv, r2), p)


def bfv_decrypt_partial(ctx: bfv.BfvContext, sk: SecretKey, ct, key):
    """p_i = c1*s_i + e_smudge (reference decrypt_partial)."""
    kq = ctx.k
    qb = ctx.base_q
    p, pinv, *_ = qb.bview()
    tb = ctx.ntt_qp.slice_limbs(0, kq)
    c1s = nttm.ntt_inv(mm.mont_mul(nttm.ntt_fwd(ct.c[1], tb),
                                   sk.s_ntt_mont_qp[:kq], p, pinv), tb)
    return mm.add_mod(c1s, _smudge_noise(key, ctx.q_primes, ctx.n), p)


def _zero_sk(ctx) -> SecretKey:
    """All-zero secret key: lets the shared decrypt path decode c0-only sums."""
    L = ctx.k + len(ctx.p_primes)
    return SecretKey(jnp.zeros((ctx.n,), jnp.int32),
                     jnp.zeros((L, ctx.n), jnp.uint32), 0)


def bfv_decrypt_fuse(ctx: bfv.BfvContext, ct, partials):
    """Combine c0 + sum(p_i) and decode mod t (reference decrypt fuse)."""
    p = ctx.base_q.p[:, None]
    acc = ct.c[0]
    for sh in partials:
        acc = mm.add_mod(acc, sh, p)
    fake = bfv.Ciphertext(jnp.stack([acc, jnp.zeros_like(acc)]), 2, False)
    return bfv.decrypt(ctx, _zero_sk(ctx), fake)


def ckks_decrypt_partial(ctx: ckks.CkksContext, sk: SecretKey, ct, key):
    ka = ctx.active(ct.level)
    qb = ctx.base_q_at(ct.level)
    p, pinv, *_ = qb.bview()
    c1s = mm.mont_mul(ct.c[1], sk.s_ntt_mont_qp[:ka], p, pinv)
    sm = nttm.ntt_fwd(_smudge_noise(key, ctx.q_primes[:ka], ctx.n, bits=13),
                      ctx.ntt_q(ct.level))
    return mm.add_mod(c1s, sm, p)


def ckks_decrypt_fuse(ctx: ckks.CkksContext, ct, partials) -> ckks.Plaintext:
    p = ctx.base_q_at(ct.level).p[:, None]
    acc = ct.c[0]
    for sh in partials:
        acc = mm.add_mod(acc, sh, p)
    return ckks.Plaintext(acc, ct.level, ct.scale)


# ---------------------------------------------------------------------
# Collective (distributed) bootstrapping — BFV
# ---------------------------------------------------------------------

def bfv_colboot_participant(ctx: bfv.BfvContext, sk: SecretKey, ct,
                            common_seed: int, key):
    """Stage 1 (each party): decryption share of c1 masked by a random
    plaintext M_i, plus a fresh encryption share of M_i under the common 'a'
    (reference distributed_bootstrapping_participant, mpcmanager.cu:1564)."""
    ring = bfv._ring(ctx)
    k_m, k_e1, k_e2 = rng.split(key, 3)
    a = crs_uniform(ring, common_seed, (ctx.n,))[: ctx.k]  # over Q only
    qb = ctx.base_q
    p, pinv, *_ = qb.bview()
    # random mask plaintext
    M = rng.randint(k_m, (ctx.n,), 0, ctx.t).astype(jnp.uint32)
    # h0 = c1*s_i + e - Delta*M
    tb = ctx.ntt_qp.slice_limbs(0, ctx.k)
    c1s = nttm.ntt_inv(mm.mont_mul(nttm.ntt_fwd(ct.c[1], tb),
                                   sk.s_ntt_mont_qp[: ctx.k], p, pinv), tb)
    h0 = mm.add_mod(c1s, _smudge_noise(k_e1, ctx.q_primes, ctx.n), p)
    h0 = mm.sub_mod(h0, bfv._plain_lift(ctx, M), p)
    # h1 = -a*s_i + e' + Delta*M (NTT->coeff for the a*s product)
    a_s = nttm.ntt_inv(mm.mont_mul(a, sk.s_ntt_mont_qp[: ctx.k], p, pinv), tb)
    e2 = rng.gaussian_rns(k_e2, ctx.q_primes, (ctx.n,))
    h1 = mm.add_mod(mm.sub_mod(e2, a_s, p), bfv._plain_lift(ctx, M), p)
    return h0, h1


def bfv_colboot_coordinator(ctx: bfv.BfvContext, ct, shares, common_seed: int):
    """Stage 2: decode c0 + sum h0 to plaintext, re-encrypt with sum h1
    (reference distributed_bootstrapping_coordinator, mpcmanager.cu:1669)."""
    ring = bfv._ring(ctx)
    qb = ctx.base_q
    p, pinv, *_ = qb.bview()
    acc0 = ct.c[0]
    acc1 = None
    for h0, h1 in shares:
        acc0 = mm.add_mod(acc0, h0, p)
        acc1 = h1 if acc1 is None else mm.add_mod(acc1, h1, p)
    fake = bfv.Ciphertext(jnp.stack([acc0, jnp.zeros_like(acc0)]), 2, False)
    m_prime = bfv.decrypt(ctx, _zero_sk(ctx), fake)  # = m - sum(M_i) mod t
    a = crs_uniform(ring, common_seed, (ctx.n,))[: ctx.k]
    tb = ctx.ntt_qp.slice_limbs(0, ctx.k)
    c0_new = mm.add_mod(acc1, bfv._plain_lift(ctx, m_prime), p)
    c1_new = nttm.ntt_inv(a, tb)
    return bfv.Ciphertext(jnp.stack([c0_new, c1_new]), 2, False)


# ---------------------------------------------------------------------
# Collective (distributed) bootstrapping — CKKS
# ---------------------------------------------------------------------

def ckks_colboot_participant(ctx: ckks.CkksContext, sk: SecretKey, ct,
                             common_seed: int, key):
    """CKKS variant: mask is a random integer poly much larger than the
    message (statistical hiding), shares at the ct's level; the coordinator
    re-encrypts at level 0 (col_boot_*_ckks kernels)."""
    ring = ckks._ring(ctx)
    k_m, k_e1, k_e2 = rng.split(key, 3)
    lvl = ct.level
    ka = ctx.active(lvl)
    qb = ctx.base_q_at(lvl)
    p, pinv, *_ = qb.bview()
    # mask: uniform mod the level's primes — both at level and at level 0
    mask_int = rng.randint(k_m, (ctx.n,), -(1 << 30), 1 << 30)
    mask_lvl = nttm.ntt_fwd(rng.signed_to_rns(mask_int, ctx.q_primes[:ka]),
                            ctx.ntt_q(lvl))
    mask_full = nttm.ntt_fwd(rng.signed_to_rns(mask_int, ctx.q_primes),
                             ctx.ntt_q(0))
    # h0 = c1*s_i + e - mask (at level, NTT domain)
    c1s = mm.mont_mul(ct.c[1], sk.s_ntt_mont_qp[:ka], p, pinv)
    sm = nttm.ntt_fwd(_smudge_noise(k_e1, ctx.q_primes[:ka], ctx.n, bits=13),
                      ctx.ntt_q(lvl))
    h0 = mm.sub_mod(mm.add_mod(c1s, sm, p), mask_lvl, p)
    # h1 = -a*s_i + e' + mask (at level 0, NTT domain)
    a = crs_uniform(ring, common_seed, (ctx.n,))[: ctx.k]
    pf = ctx.base_q.p[:, None]
    pinvf = ctx.base_q.pinv[:, None]
    a_s = mm.mont_mul(a, sk.s_ntt_mont_qp[: ctx.k], pf, pinvf)
    e2 = nttm.ntt_fwd(rng.gaussian_rns(k_e2, ctx.q_primes, (ctx.n,)), ctx.ntt_q(0))
    h1 = mm.add_mod(mm.sub_mod(e2, a_s, pf), mask_full, pf)
    return h0, h1


def ckks_colboot_coordinator(ctx: ckks.CkksContext, ct, shares, common_seed: int):
    ring = ckks._ring(ctx)
    lvl = ct.level
    ka = ctx.active(lvl)
    p = ctx.base_q_at(lvl).p[:, None]
    acc0 = ct.c[0]
    acc1 = None
    pf = ctx.base_q.p[:, None]
    for h0, h1 in shares:
        acc0 = mm.add_mod(acc0, h0, p)
        acc1 = h1 if acc1 is None else mm.add_mod(acc1, h1, pf)
    # decode the masked plaintext to integers (exact CRT on host)
    masked = ckks.Plaintext(acc0, lvl, ct.scale)
    coeffs = np.asarray(nttm.ntt_inv(acc0, ctx.ntt_q(lvl)))
    primes = [int(q) for q in ctx.q_primes[:ka]]
    Q = 1
    for q in primes:
        Q *= q
    acc = np.zeros(ctx.n, object)
    for i, q in enumerate(primes):
        Mi = Q // q
        acc += coeffs[i].astype(object) * ((pow(Mi, -1, q) * Mi) % Q)
    acc %= Q
    acc = np.where(acc >= Q // 2, acc - Q, acc)
    # re-lift to the full chain
    res = np.empty((ctx.k, ctx.n), np.uint32)
    for i, q in enumerate(int(x) for x in ctx.q_primes):
        res[i] = (acc % q).astype(np.uint64).astype(np.uint32)
    m_full = nttm.ntt_fwd(jnp.asarray(res), ctx.ntt_q(0))
    a = crs_uniform(ring, common_seed, (ctx.n,))[: ctx.k]
    c0_new = mm.add_mod(acc1, m_full, pf)
    return ckks.Ciphertext(jnp.stack([c0_new, a]), 2, 0, ct.scale)


# ---------------------------------------------------------------------
# t-out-of-N threshold decryption (Shamir over each RNS limb field)
# ---------------------------------------------------------------------
# The reference marks t-out-of-N as future work (example/mpc/README.md:72);
# this implements it the standard way (Shamir secret sharing of the RLWE
# key + Lagrange-weighted partial decryptions with noise flooding).  Every
# RNS limb lives in the field Z_q (q prime), and the NTT + Montgomery maps
# are Z_q-linear bijections, so the key can be shared directly in its
# stored (NTT, Montgomery) domain: f(x) = s + a_1 x + ... + a_{t-1} x^{t-1}
# with uniform a_k in R_q^QP, share_i = f(i).

@dataclasses.dataclass(frozen=True)
class ThresholdShare:
    """Party `index`'s Shamir share of a secret key (x-coordinate = index)."""
    index: int
    threshold: int
    s_ntt_mont_qp: jnp.ndarray      # (L, n) f(index), NTT+Montgomery domain


jax.tree_util.register_dataclass(
    ThresholdShare, data_fields=["s_ntt_mont_qp"],
    meta_fields=["index", "threshold"])


def _limb_consts(primes, vals):
    """(L, 1) uint32 (c, shoup(c)) broadcast arrays for per-limb constants."""
    c = [int(v) % int(q) for v, q in zip(vals, primes)]
    sh = [mm.shoup(cv, int(q)) for cv, q in zip(c, primes)]
    return (jnp.asarray(np.array(c, np.uint32))[:, None],
            jnp.asarray(np.array(sh, np.uint32))[:, None])


def shamir_share_secret(ctx, key, sk: SecretKey, n_parties: int,
                        threshold: int) -> List[ThresholdShare]:
    """Dealer-side split of `sk` into N shares, any `threshold` of which
    decrypt.  Shares cover the full QP basis (same layout as the key)."""
    assert 1 <= threshold <= n_parties
    primes = tuple(int(q) for q in ctx.q_primes) + tuple(
        int(q) for q in ctx.p_primes)
    pb = jnp.asarray(np.array(primes, np.uint32))[:, None]
    coeffs = [rng.uniform_rns(rng.fold_in(key, k), primes, (ctx.n,))
              for k in range(1, threshold)]
    shares = []
    for i in range(1, n_parties + 1):
        acc = sk.s_ntt_mont_qp
        for k, a in enumerate(coeffs, start=1):
            c, csh = _limb_consts(primes, [pow(i, k, q) for q in primes])
            acc = mm.add_mod(acc, mm.shoup_mul(a, c, csh, pb), pb)
        shares.append(ThresholdShare(i, threshold, acc))
    return shares


def _lagrange0(indices, q: int) -> dict:
    """{i: lambda_i^S mod q} with sum_i lambda_i f(i) = f(0) over Z_q."""
    lams = {}
    for i in indices:
        num, den = 1, 1
        for j in indices:
            if j != i:
                num = num * j % q
                den = den * ((j - i) % q) % q
        lams[i] = num * pow(den, -1, q) % q
    return lams


def _lam_share(ctx, share: ThresholdShare, participants, kq: int):
    """lambda_i^S-scaled share rows over the first kq Q limbs."""
    participants = tuple(sorted(participants))
    assert len(participants) >= share.threshold, (
        f"need {share.threshold} participants, got {len(participants)}")
    assert share.index in participants
    primes = [int(q) for q in ctx.q_primes[:kq]]
    lam = [_lagrange0(participants, q)[share.index] for q in primes]
    c, csh = _limb_consts(primes, lam)
    pb = jnp.asarray(np.array(primes, np.uint32))[:, None]
    return mm.shoup_mul(share.s_ntt_mont_qp[:kq], c, csh, pb)


def bfv_decrypt_partial_threshold(ctx: bfv.BfvContext,
                                  share: ThresholdShare, ct,
                                  participants, key):
    """p_i = c1 * (lambda_i^S * f(i)) + e_smudge; fuse any `threshold` of
    them with bfv_decrypt_fuse."""
    kq = ctx.k
    s_lam = _lam_share(ctx, share, participants, kq)
    p, pinv, *_ = ctx.base_q.bview()
    tb = ctx.ntt_qp.slice_limbs(0, kq)
    c1s = nttm.ntt_inv(mm.mont_mul(nttm.ntt_fwd(ct.c[1], tb), s_lam,
                                   p, pinv), tb)
    return mm.add_mod(c1s, _smudge_noise(key, ctx.q_primes, ctx.n), p)


def ckks_decrypt_partial_threshold(ctx: ckks.CkksContext,
                                   share: ThresholdShare, ct,
                                   participants, key):
    """CKKS analog (ciphertext already in NTT domain); fuse with
    ckks_decrypt_fuse."""
    ka = ctx.active(ct.level)
    s_lam = _lam_share(ctx, share, participants, ka)
    p, pinv, *_ = ctx.base_q_at(ct.level).bview()
    c1s = mm.mont_mul(ct.c[1], s_lam, p, pinv)
    sm = nttm.ntt_fwd(_smudge_noise(key, ctx.q_primes[:ka], ctx.n, bits=13),
                      ctx.ntt_q(ct.level))
    return mm.add_mod(c1s, sm, p)
