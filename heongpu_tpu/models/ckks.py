"""CKKS scheme (approximate complex/real SIMD) — TPU-native implementation.

Mirrors the capability surface of HEonGPU's CKKS family
(src/lib/host/ckks/*: HEContextImpl<CKKS>, HEEncoder (GPU_Special_FFT),
leveled HEArithmeticOperator with rescale / mod_drop / rotation / conjugate —
SURVEY §2.4), redesigned for TPU:

  * Ciphertexts live in the NTT domain over a level-dependent prime prefix
    (level L = number of dropped primes), exactly like the reference keeps
    CKKS cts NTT-side; rescale INTTs only the dropped limb.
  * Levels are static jit metadata: each level compiles its own XLA program
    over static shapes — the TPU replacement for the reference's
    leveled-kernel variants.
  * Encoding uses the canonical-embedding special FFT; slot j sits at the
    NTT-domain evaluation index of psi^(5^j) (same 5^j orbit as the
    reference's rot_group tables, encoder.cu:50-101).  Host float64 numpy
    path for exactness; the transform is one length-n complex FFT.
  * Keys come from ringkit: Method-I P-scaled gadget, valid at every level
    by prefix slicing (no per-level key copies).
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
from ..ops import compose, df64, keyswitch2, polyops, rns, sfft
from ..utils import errors, nt, rng
from ..utils.params import validate_security
from . import ringkit
from .ringkit import (SecretKey, PublicKey, KSKey, GaloisKey, GaloisKeyOne,
                      RingView)

_prod = lambda xs: reduce(lambda a, b: a * b, xs, 1)


# =========================================================================
# Context
# =========================================================================

@partial(
    jax.tree_util.register_dataclass,
    data_fields=["ntt_qp", "base_q", "base_qp", "div_p", "div_level",
                 "slot_to_ntt", "conj_perm", "enc_div", "ks2"],
    meta_fields=["n", "logn", "k", "q_primes", "p_primes", "default_scale",
                 "sec_level", "ks_type", "alpha"],
)
@dataclasses.dataclass(frozen=True)
class CkksContext:
    """Precomputed tables for a CKKS chain (reference context.cu analog)."""
    n: int
    logn: int
    k: int                      # number of Q primes (level 0 uses all)
    q_primes: tuple
    p_primes: tuple
    default_scale: float
    sec_level: str
    ks_type: str                # "I" (per-prime digits) | "II" (hybrid groups)
    alpha: int                  # number of special primes
    ntt_qp: nttm.NttTables      # over Q ∪ P
    base_q: rns.Base
    base_qp: rns.Base
    div_p: rns.DivRoundLastq    # ÷(first special) at level 0 (Method I path)
    div_level: tuple            # div_level[lvl] = DivRoundLastq dropping q_{k-1-lvl}
    enc_div: tuple              # sequential ÷p stages over Q·P (encrypt path)
    ks2: tuple                  # per-level keyswitch2.KS2Level (Method II)
    slot_to_ntt: jnp.ndarray    # (n/2,) int32: NTT index of slot j
    conj_perm: jnp.ndarray      # (n,) NTT-domain permutation for conjugation

    @property
    def qp_primes(self):
        return tuple(self.q_primes) + tuple(self.p_primes)

    def active(self, level: int) -> int:
        """Number of active Q limbs at `level`."""
        return self.k - level

    def ntt_q(self, level: int) -> nttm.NttTables:
        return self.ntt_qp.slice_limbs(0, self.active(level))

    def base_q_at(self, level: int) -> rns.Base:
        return self.base_q.slice(0, self.active(level))

    def ntt_qp_at(self, level: int) -> nttm.NttTables:
        """Level basis + special prime: limbs [0..active) ∪ [k..k+p)."""
        ka = self.active(level)
        if level == 0:
            return self.ntt_qp
        a = self.ntt_qp.slice_limbs(0, ka)
        b = self.ntt_qp.slice_limbs(self.k, self.k + len(self.p_primes))
        return _concat_tables(a, b)

    def base_qp_at(self, level: int) -> rns.Base:
        ka = self.active(level)
        if level == 0:
            return self.base_qp
        idx = list(range(ka)) + list(range(self.k, self.k + len(self.p_primes)))
        t = lambda arr: arr[jnp.asarray(np.array(idx, np.int32))]
        return rns.Base(t(self.base_qp.p), t(self.base_qp.pinv),
                        t(self.base_qp.r2), t(self.base_qp.mu),
                        t(self.base_qp.r1), t(self.base_qp.r1_sh))

    def div_p_at(self, level: int) -> rns.DivRoundLastq:
        if level == 0:
            return self.div_p
        ka = self.active(level)
        d = self.div_p
        return rns.DivRoundLastq(
            qbase=d.qbase.slice(0, ka), half=d.half,
            half_mod=d.half_mod[:ka], pinv_mod=d.pinv_mod[:ka],
            pinv_mod_sh=d.pinv_mod_sh[:ka], p_last=d.p_last)


def _concat_tables(a: nttm.NttTables, b: nttm.NttTables) -> nttm.NttTables:
    cat = lambda x, y: jnp.concatenate([x, y], axis=0)
    mxu = None
    if a.mxu is not None and b.mxu is not None:
        from ..ops.ntt_mxu import MxuTables
        mxu = MxuTables.concat(a.mxu, b.mxu)
    return nttm.NttTables(
        n=a.n, logn=a.logn, n1=a.n1, n2=a.n2, mxu=mxu,
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


def make_context(n: int,
                 q_bits: Sequence[int],
                 scale_bits: Optional[int] = None,
                 sec_level: str = "none",
                 ks_type: str = "I",
                 alpha: int = 1,
                 p_count: Optional[int] = None,
                 pair_scale_primes: Optional[bool] = None) -> CkksContext:
    """q_bits: bit sizes of the Q chain, q_bits[0] = base prime; the scale
    primes should sit near 2**scale_bits.  `alpha` 30-bit special primes are
    appended; ks_type "II" uses hybrid keyswitching with digits of `alpha`
    grouped primes (reference keyswitching_type METHOD_II).

    p_count (default alpha): number of special primes.  p_count > alpha makes
    P much larger than any digit, dividing keyswitch noise by
    2^(30*(p_count-alpha)) — essential headroom at large N where the per-op
    slot noise grows ~linearly with n under <2^30-prime scales (the analog of
    the reference's 60-bit special prime over ~50-bit digits).

    pair_scale_primes (default: auto = on when >= 4 equal-size scale primes):
    complementary-pair the scale primes and anchor ``default_scale`` at their
    geometric mean (a non-power-of-two ~2^scale_bits).  This keeps the
    working scale stable through deep chains (the e <- 2e - d rescale
    recursion stays balanced; see the comment below) and is REQUIRED for the
    bootstrap precision configs at N >= 2^13.  Pass False to keep the primes
    in generation order and default_scale = 2^scale_bits exactly (the
    pre-round-4 behavior); explicit ``scale=`` arguments to encode() are
    honored either way."""
    logn = n.bit_length() - 1
    assert 1 << logn == n
    if ks_type == "I":
        alpha = 1
    if p_count is None:
        p_count = alpha
    assert p_count >= alpha, "P must cover at least one digit"
    q_primes = []
    used = set()
    for b in q_bits:
        pr = nt.generate_ntt_primes(b, 1, n, exclude=used)[0]
        used.add(pr)
        q_primes.append(pr)
    p_primes = nt.generate_ntt_primes(30, p_count, n, exclude=used)
    validate_security(n, q_primes + p_primes, sec_level)
    if scale_bits is None:
        scale_bits = q_bits[1] if len(q_bits) > 1 else q_bits[0] - 1

    # Deep-chain scale stability: a ct-ct multiply SQUARES the scale and the
    # rescale divides by actual primes, so the log-offset e between working
    # scale and its target obeys e <- 2e - d (d = prime's offset): any
    # one-sided prime set makes e blow up doubly-exponentially and the
    # message scale outgrows the tail modulus (found via the N>=2^13
    # bootstrap, where prime spacing ~2N forces large offsets).  Fix: anchor
    # default_scale at the scale primes' geometric mean and ORDER them so
    # the greedy e <- 2e - d recursion (consumption = reverse chain order)
    # stays balanced.
    # index 0 (the decrypt base prime) is never consumed by rescale, so it
    # must not join the pairing even when its bit size matches: including it
    # would shift every consumed pair off its partner AND silently swap
    # which prime serves as the base.
    sgroup = [i for i, b in enumerate(q_bits) if b == scale_bits and i > 0]
    if pair_scale_primes is None:
        pair_scale_primes = len(sgroup) >= 4
    if pair_scale_primes and len(sgroup) >= 4:
        import math as _math
        sprimes = [q_primes[i] for i in sgroup]
        logs = sorted(_math.log2(p) for p in sprimes)
        anchor = sum(logs) / len(logs)
        bylog = sorted(sprimes, key=_math.log2)
        # complementary pairing: the j-th smallest with the j-th largest, so
        # every CONSECUTIVE PAIR's product ≈ anchor² (pair offsets ~ the
        # residual spread, not the full one-sided spread).  A composite
        # (base_count=2) rescale consumes exactly one such pair; eval_exp_sin
        # keeps its plain-constant rescales bc-wide so pair alignment holds.
        consume = []
        lo, hi = 0, len(bylog) - 1
        while lo < hi:
            consume += [bylog[lo], bylog[hi]]
            lo, hi = lo + 1, hi - 1
        if lo == hi:
            consume.append(bylog[lo])
        consume.reverse()          # chain order: last prime consumed first
        for i, pr in zip(sgroup, consume):
            q_primes[i] = pr
        default_scale = float(2.0 ** anchor)
    else:
        default_scale = float(2.0 ** scale_bits)
    if len(q_bits) > 2 and any(abs(b - scale_bits) > 1 for b in q_bits[1:]):
        import warnings
        warnings.warn(
            f"scale 2^{scale_bits} vs scale-prime sizes {sorted(set(q_bits[1:]))}: "
            "rescale multiplies the working scale by 2^(scale_bits - prime_bits) "
            "per level; a mismatch decays the scale geometrically and deep "
            "circuits (bootstrapping) lose the message below the noise floor. "
            "Choose scale primes within 1 bit of scale_bits.")
    k = len(q_primes)

    # slot -> NTT storage position via the 5^j orbit (composed with the NTT
    # storage order); conjugate slot = point -5^j
    m2 = 2 * n
    ieo = nttm.inv_eval_order(n)
    slot_to_ntt = ieo[_slot_eval_nat(n)].astype(np.int32)

    conj_perm = polyops.galois_perm_ntt(m2 - 1, n)

    div_level = []
    for lvl in range(k - 1):
        ka = k - lvl
        div_level.append(rns.DivRoundLastq.build(q_primes[:ka - 1], q_primes[ka - 1]))

    # encrypt path: divide by every special prime sequentially
    enc_div = []
    remaining = list(q_primes) + list(p_primes)
    for sp in reversed(p_primes):
        remaining = remaining[:-1]
        enc_div.append(rns.DivRoundLastq.build(remaining, sp))

    ks2 = ()
    if ks_type == "II":
        ks2 = tuple(keyswitch2.build_ks2_level(q_primes, p_primes, k - lvl, alpha)
                    for lvl in range(k))

    return CkksContext(
        n=n, logn=logn, k=k,
        q_primes=tuple(q_primes), p_primes=tuple(p_primes),
        default_scale=default_scale, sec_level=sec_level,
        ks_type=ks_type, alpha=alpha,
        ntt_qp=nttm.build_ntt_tables(q_primes + p_primes, n),
        base_q=rns.Base.build(q_primes),
        base_qp=rns.Base.build(q_primes + p_primes),
        div_p=rns.DivRoundLastq.build(q_primes, p_primes[0]),
        div_level=tuple(div_level),
        enc_div=tuple(enc_div),
        ks2=ks2,
        slot_to_ntt=jnp.asarray(slot_to_ntt),
        conj_perm=conj_perm,
    )


def _ring(ctx: CkksContext) -> RingView:
    return RingView(ctx.n, ctx.q_primes, ctx.p_primes, ctx.base_q,
                    ctx.base_qp, ctx.ntt_qp, ctx.div_p)


def _ring_at(ctx: CkksContext, level: int) -> RingView:
    """Ring view over the level basis (active Q prefix + specials) — lets
    eval keys be GENERATED at their use level, shrinking deep-chain key sets
    (a StoC rotation key at level 36 of a 44-chain needs 14 limbs × 2
    digits, not 50 × 11 — ~20× smaller; see ckks_boot bootstrap keys)."""
    if level == 0:
        return _ring(ctx)
    ka = ctx.active(level)
    return RingView(ctx.n, ctx.q_primes[:ka], ctx.p_primes,
                    ctx.base_q.slice(0, ka), ctx.base_qp_at(level),
                    ctx.ntt_qp_at(level), ctx.div_p_at(level))


def _sk_at(ctx: CkksContext, sk: ringkit.SecretKey, level: int):
    """Secret key restricted to the level basis (limb rows sliced)."""
    if level == 0:
        return sk
    ka = ctx.active(level)
    s = jnp.concatenate([sk.s_ntt_mont_qp[:ka], sk.s_ntt_mont_qp[ctx.k:]],
                        axis=0)
    return ringkit.SecretKey(sk.s_coeff, s, sk.hamming_weight)


def keygen_secret(ctx, key, hamming_weight=None):
    return ringkit.keygen_secret(_ring(ctx), key, hamming_weight)


def keygen_public(ctx, key, sk, a_seed=None):
    return ringkit.keygen_public(_ring(ctx), key, sk, a_seed=a_seed)


def _groups(ctx, level: int = 0):
    if ctx.ks_type == "II":
        ka = ctx.active(level)
        return tuple(tuple(range(j, min(j + ctx.alpha, ka)))
                     for j in range(0, ka, ctx.alpha))
    return None


def keygen_relin(ctx, key, sk, a_seed=None, level: int = 0):
    """level > 0: generate at the level basis (usable at levels >= level
    only; the key's limb extent encodes its generation level)."""
    return ringkit.keygen_relin(_ring_at(ctx, level), key, _sk_at(ctx, sk, level),
                                groups=_groups(ctx, level), a_seed=a_seed)


def keygen_galois(ctx, key, sk, steps=None, max_shift: int = 8,
                  elts=None, a_seed=None, store_a: bool = True,
                  include_conj: bool = True, level: int = 0,
                  inv_form: bool = False):
    return ringkit.keygen_galois(_ring_at(ctx, level), key,
                                 _sk_at(ctx, sk, level), steps, max_shift,
                                 groups=_groups(ctx, level), elts=elts,
                                 a_seed=a_seed, store_a=store_a,
                                 include_conj=include_conj,
                                 inv_form=inv_form)


def keygen_switch(ctx, key, sk_old, sk_new):
    return ringkit.keygen_switch(_ring(ctx), key, sk_old, sk_new,
                                 groups=_groups(ctx))


# =========================================================================
# Ciphertext / Plaintext
# =========================================================================

@partial(jax.tree_util.register_dataclass,
         data_fields=["c"], meta_fields=["size", "level", "scale"])
@dataclasses.dataclass(frozen=True)
class Ciphertext:
    """NTT-domain ciphertext: c (size, k-level, n); scale is float metadata
    (reference ciphertext.cuh tracks depth_/scale_/rescale_required_)."""
    c: jnp.ndarray
    size: int
    level: int
    scale: float


@partial(jax.tree_util.register_dataclass,
         data_fields=["m"], meta_fields=["level", "scale"])
@dataclasses.dataclass(frozen=True)
class Plaintext:
    m: jnp.ndarray  # (k-level, n), NTT domain
    level: int
    scale: float


# =========================================================================
# Encoder (canonical embedding special FFT — host float64 path)
# =========================================================================

from functools import lru_cache


@lru_cache(maxsize=None)
def _slot_eval_nat(n: int) -> np.ndarray:
    """Natural evaluation index of slot j (the 5^j orbit): point psi^(2e+1)
    with 2e+1 = 5^j mod 2n (host-side canonical-embedding indexing)."""
    m2 = 2 * n
    out = np.empty(n // 2, np.int64)
    g5 = 1
    for j in range(n // 2):
        out[j] = (g5 - 1) // 2
        g5 = g5 * 5 % m2
    return out


def _embed_coeffs_from_slots(ctx: CkksContext, z: np.ndarray) -> np.ndarray:
    """slots (n/2 complex) -> real coefficient vector (float, unscaled)."""
    n = ctx.n
    m2 = 2 * n
    spec = np.zeros(n, np.complex128)
    idx = _slot_eval_nat(n)                         # natural eval index
    spec[idx] = z
    conj_idx = (m2 - (2 * idx + 1) - 1) // 2        # point psi^{-(2e+1)}
    spec[conj_idx] = np.conj(z)
    # A_j = a(w_{2n}^{2j+1});  A = n * ifft(a_i * w_{2n}^i)  =>  invert:
    u = np.fft.fft(spec) / n
    tw = np.exp(-1j * np.pi * np.arange(n) / n)
    a = u * tw
    return a.real  # imaginary part ~ 0 by construction


def _slots_from_embed_coeffs(ctx: CkksContext, a: np.ndarray) -> np.ndarray:
    n = ctx.n
    tw = np.exp(1j * np.pi * np.arange(n) / n)
    spec = np.fft.ifft(a * tw) * n
    return spec[_slot_eval_nat(n)]


@lru_cache(maxsize=None)
def _sfft_tabs(n: int) -> sfft.SfftTables:
    # ensure_compile_time_eval: these builders may first run under an active
    # jit trace (encode inside a jitted pipeline); without it the cached
    # tables would hold tracers from that trace and poison later retraces.
    with jax.ensure_compile_time_eval():
        return sfft.build_tables(n)


@lru_cache(maxsize=None)
def _compose_tabs(primes: tuple) -> compose.SmallComposeTables:
    with jax.ensure_compile_time_eval():
        return compose.build_tables(list(primes))


@partial(jax.jit, static_argnames=("primes", "wide"))
def _rns_from_df64(a, primes, wide: bool = False):
    """Rounded df64 coefficients (pair of (..., n) f32) -> (..., L, n) uint32
    residues, exactly (device analog of encode_kernel_ckks_conversion +
    threshold lifting, kernel/encoding.cu).  wide=True uses the 3-part split
    (values up to 2^59 — composite scales, see df64.round_to_int_parts3)."""
    if wide:
        c2, c1, c0 = df64.round_to_int_parts3(a)
        i2 = c2.astype(jnp.int32)
        i1 = c1.astype(jnp.uint32)
        i0 = c0.astype(jnp.uint32)
    else:
        c_hi, c_lo = df64.round_to_int_parts(a)      # exact ints as floats
        ih = c_hi.astype(jnp.int32)
        il = c_lo.astype(jnp.int32)
    out = []
    for q in primes:
        qp = jnp.uint32(int(q))
        mu = jnp.uint32(mm.barrett_mu(int(q)))
        r1 = jnp.uint32((1 << 32) % int(q))
        r1s = jnp.uint32(mm.shoup((1 << 32) % int(q), int(q)))
        p24 = jnp.uint32((1 << 24) % int(q))

        def mod_signed(v):
            neg = v < 0
            mag = mm.barrett32(jnp.abs(v).astype(jnp.uint32), qp, mu)
            return jnp.where(neg, mm.neg_mod(mag, qp), mag)

        if wide:
            p48 = jnp.uint32((1 << 48) % int(q))
            v2 = mod_signed(i2)
            hi, lo = mm.widening_mul(v2, p48)
            thi, tlo = mm.widening_mul(mm.barrett32(i1, qp, mu), p24)
            hi, lo = mm.add64(hi, lo, thi, tlo)
            hi, lo = mm.add64(hi, lo, jnp.zeros_like(i0),
                              mm.barrett32(i0, qp, mu))
            out.append(mm.reduce64(hi, lo, qp, mu, r1, r1s))
        else:
            vh = mod_signed(ih)
            vl = mod_signed(il)
            hi, lo = mm.widening_mul(vh, p24)
            lo2 = lo + vl
            hi = hi + (lo2 < lo).astype(jnp.uint32)
            out.append(mm.reduce64(hi, lo2, qp, mu, r1, r1s))
    return jnp.stack(out, axis=-2)


@partial(jax.jit, static_argnames=("primes", "wide"))
def _encode_slots_core(zr, zi, tabs, primes, sc, wide: bool = False):
    """df64 slot pairs (..., n/2) -> residues (..., L, n); sc = df64 scale."""
    a = sfft.embed_from_slots(zr, zi, tabs)
    a = df64.mul(a, (jnp.broadcast_to(sc[0], a[0].shape),
                     jnp.broadcast_to(sc[1], a[0].shape)))
    return _rns_from_df64(a, primes, wide=wide)


@partial(jax.jit, static_argnames=("primes",))
def _decode_slots_core(res_coeff, tabs, ctabs, primes, inv_sc):
    """(..., L, n) coefficient-domain residues -> df64 slot pairs."""
    v = compose.compose_small(res_coeff, primes, ctabs)
    a = df64.mul(v, (jnp.broadcast_to(inv_sc[0], v[0].shape),
                     jnp.broadcast_to(inv_sc[1], v[0].shape)))
    return sfft.slots_from_embed(a, tabs)


def encode_batch_rns(n: int, zs: np.ndarray, primes,
                     scale: float) -> jnp.ndarray:
    """Batch device encode: (B, n/2) complex slots -> (B, L, n) residues
    (coefficient domain).  Used by the bootstrapping diagonal builder."""
    zr = df64.from_f64(np.real(zs))
    zi = df64.from_f64(np.imag(zs))
    tabs = _sfft_tabs(n)
    sc = df64.from_f64(np.float64(scale))
    return _encode_slots_core(zr, zi, tabs, tuple(int(q) for q in primes), sc,
                              wide=bool(scale >= 2.0 ** 40))


def coeffs_to_rns(a: np.ndarray, primes) -> np.ndarray:
    """Rounded float coefficients -> RNS residues; int64 fast path when the
    magnitudes allow, exact object-int path otherwise."""
    res = np.empty((len(primes), a.shape[-1]), np.uint32)
    if a.size and np.max(np.abs(a)) < 2 ** 62:
        c = np.round(a).astype(np.int64)
        for i, q in enumerate(primes):
            res[i] = (c % int(q)).astype(np.uint32)
    else:
        c = np.round(a).astype(object)
        for i, q in enumerate(primes):
            res[i] = (c % int(q)).astype(np.uint64).astype(np.uint32)
    return res


def encode(ctx: CkksContext, values, scale: Optional[float] = None,
           level: int = 0) -> Plaintext:
    """values: up to n/2 real or complex numbers.  Runs on device (df64
    special FFT + exact RNS reduction, ops/sfft.py); encode_host is the
    float64 host oracle."""
    scale = float(scale or ctx.default_scale)
    half = ctx.n // 2
    z = np.zeros(half, np.complex128)
    v = np.asarray(values)
    z[: v.size] = v
    ka = ctx.active(level)
    res = encode_batch_rns(ctx.n, z[None], ctx.q_primes[:ka], scale)[0]
    m_ntt = nttm.ntt_fwd(res, ctx.ntt_q(level))
    return Plaintext(m_ntt, level, scale)


def encode_host(ctx: CkksContext, values, scale: Optional[float] = None,
                level: int = 0) -> Plaintext:
    """Host float64 oracle path (numpy FFT + int64/bigint CRT)."""
    scale = float(scale or ctx.default_scale)
    half = ctx.n // 2
    z = np.zeros(half, np.complex128)
    v = np.asarray(values)
    z[: v.size] = v
    a = _embed_coeffs_from_slots(ctx, z) * scale
    ka = ctx.active(level)
    res = coeffs_to_rns(a, ctx.q_primes[:ka])
    m_ntt = nttm.ntt_fwd(jnp.asarray(res), ctx.ntt_q(level))
    return Plaintext(m_ntt, level, scale)


def encode_const(ctx: CkksContext, value, scale: float,
                 level: int = 0) -> Plaintext:
    """EXACT encode of a constant (all slots equal `value`): the embedding
    of a constant vector is m(X) = a + b·X^(n/2) with a = round(Re v · S),
    b = round(Im v · S) (X^(n/2) evaluates to i on every slot of the 5^j
    half-orbit — same fact monomial_mult_tables uses).  The integers are
    computed exactly (Fraction), so the residues are exact at ANY scale.

    This matters for deep chains: the float/df64 encode path corrupts
    residues once |v|·S exceeds the float mantissa, and the composite-scale
    EvalMod's working scale drifts well past 2^52 (see ckks_boot
    eval_exp_sin) — the bug class that silently destroyed the N>=2^13
    bootstrap message while N=256 (smaller prime drift) worked."""
    from fractions import Fraction
    v = complex(value)
    S = Fraction(scale)
    a = int(round(Fraction(v.real) * S))
    b = int(round(Fraction(v.imag) * S))
    ka = ctx.active(level)
    m = np.zeros((ka, ctx.n), np.uint32)
    for i in range(ka):
        q = int(ctx.q_primes[i])
        m[i, 0] = a % q
        if b:
            m[i, ctx.n // 2] = b % q
    m_ntt = nttm.ntt_fwd(jnp.asarray(m), ctx.ntt_q(level))
    return Plaintext(m_ntt, level, float(scale))


def encode_coeff(ctx: CkksContext, values, scale: Optional[float] = None,
                 level: int = 0) -> Plaintext:
    """COEFFICIENT-mode encoding (reference encoding::COEFFICIENT,
    util/schemes.h:129-133): up to n real values placed directly as
    polynomial coefficients (no canonical embedding).  Device RNS reduction."""
    scale = float(scale or ctx.default_scale)
    v = np.zeros(ctx.n, np.float64)
    vv = np.asarray(values, np.float64)
    v[: vv.size] = vv
    ka = ctx.active(level)
    primes = tuple(int(q) for q in ctx.q_primes[:ka])
    res = _rns_from_df64(df64.from_f64(v * scale), primes)
    m_ntt = nttm.ntt_fwd(res, ctx.ntt_q(level))
    return Plaintext(m_ntt, level, scale)


def decode_coeff(ctx: CkksContext, pt: Plaintext) -> np.ndarray:
    """COEFFICIENT-mode decoding: n real coefficient values (device
    gamma-pair compose; no big-int host loop)."""
    ka = ctx.active(pt.level)
    primes = tuple(int(q) for q in ctx.q_primes[:ka])
    coeffs = nttm.ntt_inv(pt.m, ctx.ntt_q(pt.level))
    v = compose.compose_small(coeffs, primes, _compose_tabs(primes))
    return df64.to_f64(v) / pt.scale


def decode(ctx: CkksContext, pt: Plaintext) -> np.ndarray:
    """Plaintext -> n/2 complex slot values.  Runs on device (exact gamma-pair
    small compose + df64 special FFT, ops/compose.py); decode_host is the
    big-int host oracle."""
    ka = ctx.active(pt.level)
    primes = tuple(int(q) for q in ctx.q_primes[:ka])
    coeffs = nttm.ntt_inv(pt.m, ctx.ntt_q(pt.level))
    zr, zi = _decode_slots_core(coeffs, _sfft_tabs(ctx.n),
                                _compose_tabs(primes), primes,
                                df64.from_f64(np.float64(1.0 / pt.scale)))
    return df64.to_f64(zr) + 1j * df64.to_f64(zi)


def decode_host(ctx: CkksContext, pt: Plaintext) -> np.ndarray:
    """Host big-int oracle path."""
    ka = ctx.active(pt.level)
    coeffs = np.asarray(nttm.ntt_inv(pt.m, ctx.ntt_q(pt.level)))
    primes = [int(q) for q in ctx.q_primes[:ka]]
    Q = _prod(primes)
    acc = np.zeros(ctx.n, object)
    for i, q in enumerate(primes):
        Mi = Q // q
        acc += coeffs[i].astype(object) * ((pow(Mi, -1, q) * Mi) % Q)
    acc %= Q
    acc = np.where(acc >= Q // 2, acc - Q, acc)
    a = (acc / pt.scale).astype(np.float64)
    return _slots_from_embed_coeffs(ctx, a)


# =========================================================================
# Encrypt / Decrypt
# =========================================================================

@rng.drbg_eager
@jax.jit
def _encrypt_zero_ntt(ctx: CkksContext, pk: PublicKey, key):
    """(c0, c1) encrypting 0 over Q, NTT domain (level 0)."""
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
    c0 = mm.add_mod(c0, e0, qb.p[:, None])
    c1 = mm.add_mod(c1, e1, qb.p[:, None])
    return nttm.ntt_fwd(jnp.stack([c0, c1]), ctx.ntt_qp.slice_limbs(0, ctx.k))


def encrypt(ctx: CkksContext, pk: PublicKey, pt: Plaintext, key) -> Ciphertext:
    if pt.level != 0:
        raise errors.LevelMismatchError(
            "encrypt expects a level-0 plaintext (mod_drop the ciphertext "
            "afterwards if a lower level is needed)")
    z = _encrypt_zero_ntt(ctx, pk, key)
    p = ctx.base_q.p[:, None]
    c0 = mm.add_mod(z[0], pt.m, p)
    return Ciphertext(jnp.stack([c0, z[1]]), 2, 0, pt.scale)


@partial(jax.jit, static_argnames=("level", "size"))
def _ct_dot_sk(ctx: CkksContext, c, sk: SecretKey, level: int, size: int):
    ka = ctx.active(level)
    qb = ctx.base_q_at(level)
    p, pinv, *_ = qb.bview()
    s = sk.s_ntt_mont_qp[:ka]
    acc = mm.add_mod(c[0], mm.mont_mul(c[1], s, p, pinv), p)
    if size == 3:
        s2 = mm.mont_mul(s, s, p, pinv)
        acc = mm.add_mod(acc, mm.mont_mul(c[2], s2, p, pinv), p)
    return acc


def decrypt(ctx: CkksContext, sk: SecretKey, ct: Ciphertext) -> Plaintext:
    m = _ct_dot_sk(ctx, ct.c, sk, ct.level, ct.size)
    return Plaintext(m, ct.level, ct.scale)


# =========================================================================
# Leveled arithmetic
# =========================================================================

def _p_at(ctx, level):
    return ctx.base_q_at(level).p[:, None]


@partial(jax.jit, static_argnames=("level",))
def _add_core(ctx, a, b, level):
    return mm.add_mod(a, b, _p_at(ctx, level))


@partial(jax.jit, static_argnames=("level",))
def _sub_core(ctx, a, b, level):
    return mm.sub_mod(a, b, _p_at(ctx, level))


def _check_compat(a: Ciphertext, b: Ciphertext):
    errors.check_level(a.level, b.level)
    errors.check_scale(a.scale, b.scale)


def add(ctx, a: Ciphertext, b: Ciphertext) -> Ciphertext:
    _check_compat(a, b)
    sz = max(a.size, b.size)
    ca, cb = a.c, b.c
    if a.size != b.size:  # pad the shorter with zeros
        if a.size < sz:
            ca = jnp.concatenate([ca, jnp.zeros_like(cb[a.size:])])
        else:
            cb = jnp.concatenate([cb, jnp.zeros_like(ca[b.size:])])
    return Ciphertext(_add_core(ctx, ca, cb, a.level), sz, a.level, a.scale)


def sub(ctx, a: Ciphertext, b: Ciphertext) -> Ciphertext:
    _check_compat(a, b)
    errors.check_size(b.size, a.size, "sub")
    return Ciphertext(_sub_core(ctx, a.c, b.c, a.level), a.size, a.level, a.scale)


def negate(ctx, a: Ciphertext) -> Ciphertext:
    return Ciphertext(mm.neg_mod(a.c, _p_at(ctx, a.level)), a.size, a.level, a.scale)


def add_plain(ctx, a: Ciphertext, pt: Plaintext) -> Ciphertext:
    errors.check_level(a.level, pt.level, "ciphertext/plaintext")
    errors.check_scale(a.scale, pt.scale)
    c0 = _add_core(ctx, a.c[0], pt.m, a.level)
    return Ciphertext(a.c.at[0].set(c0), a.size, a.level, a.scale)


def sub_plain(ctx, a: Ciphertext, pt: Plaintext) -> Ciphertext:
    errors.check_level(a.level, pt.level, "ciphertext/plaintext")
    errors.check_scale(a.scale, pt.scale)
    c0 = _sub_core(ctx, a.c[0], pt.m, a.level)
    return Ciphertext(a.c.at[0].set(c0), a.size, a.level, a.scale)


@partial(jax.jit, static_argnames=("level",))
def _mul_core(ctx, a, b, level):
    """(2,k,n) x (2,k,n) -> (3,k,n) pointwise in NTT domain."""
    qb = ctx.base_q_at(level)
    p, pinv, r2, *_ = qb.bview()
    a0m = mm.to_mont(a[0], p, pinv, r2)
    a1m = mm.to_mont(a[1], p, pinv, r2)
    c0 = mm.mont_mul(a0m, b[0], p, pinv)
    c1 = mm.add_mod(mm.mont_mul(a0m, b[1], p, pinv),
                    mm.mont_mul(a1m, b[0], p, pinv), p)
    c2 = mm.mont_mul(a1m, b[1], p, pinv)
    return jnp.stack([c0, c1, c2])


def multiply(ctx, a: Ciphertext, b: Ciphertext) -> Ciphertext:
    errors.check_level(a.level, b.level)
    errors.check_size(a.size, 2, "multiply")
    errors.check_size(b.size, 2, "multiply")
    return Ciphertext(_mul_core(ctx, a.c, b.c, a.level), 3, a.level,
                      a.scale * b.scale)


@partial(jax.jit, static_argnames=("level",))
def _mul_plain_core(ctx, c, m, level):
    qb = ctx.base_q_at(level)
    p, pinv, r2, *_ = qb.bview()
    m_mont = mm.to_mont(m, p, pinv, r2)
    return mm.mont_mul(c, m_mont[None], p, pinv)


def multiply_plain(ctx, a: Ciphertext, pt: Plaintext) -> Ciphertext:
    errors.check_level(a.level, pt.level, "ciphertext/plaintext")
    return Ciphertext(_mul_plain_core(ctx, a.c, pt.m, a.level),
                      a.size, a.level, a.scale * pt.scale)


@partial(jax.jit, static_argnames=("level", "size"))
def _rescale_core(ctx, c, level, size):
    """Drop the last active limb with rounding (NTT-domain rescale).
    Reference analog: rescale_inplace (operator.cu:1156-1244)."""
    ka = ctx.active(level)
    dv = ctx.div_level[level]
    tb_last = ctx.ntt_qp.slice_limbs(ka - 1, ka)
    tb_rest = ctx.ntt_qp.slice_limbs(0, ka - 1)
    last = nttm.ntt_inv(c[:, ka - 1: ka, :], tb_last)          # (size,1,n) coeff
    r = mm.add_mod(last, dv.half, dv.p_last)
    pj, _, _, muj, _, _ = dv.qbase.bview()
    # (r - half) per coefficient, reduced into each remaining limb, then NTT:
    # out = (c - NTT(r - half)) * q_last^{-1}; the +half/-half pair implements
    # round() and must be applied per *coefficient*, hence folded into the
    # lifted remainder before transforming back.
    r_mod = mm.barrett32(r, pj, muj)                            # (size,ka-1,n)
    r_mod = mm.sub_mod(r_mod, dv.half_mod[:, None], pj)
    lift = nttm.ntt_fwd(r_mod, tb_rest)
    num = mm.sub_mod(c[:, : ka - 1, :], lift, pj)
    return mm.shoup_mul(num, dv.pinv_mod[:, None], dv.pinv_mod_sh[:, None], pj)


def rescale(ctx, a: Ciphertext) -> Ciphertext:
    if ctx.active(a.level) <= 1:
        raise errors.LevelMismatchError(
            "no limb left to rescale (ciphertext already at the last level)")
    out = _rescale_core(ctx, a.c, a.level, a.size)
    q_last = int(ctx.q_primes[ctx.active(a.level) - 1])
    return Ciphertext(out, a.size, a.level + 1, a.scale / q_last)


def mod_drop(ctx, a: Ciphertext, levels: int = 1) -> Ciphertext:
    ka = ctx.active(a.level)
    return Ciphertext(a.c[:, : ka - levels, :], a.size, a.level + levels, a.scale)


def mod_drop_plain(ctx, pt: Plaintext, levels: int = 1) -> Plaintext:
    ka = ctx.active(pt.level)
    return Plaintext(pt.m[: ka - levels], pt.level + levels, pt.scale)


# =========================================================================
# Keyswitch-based ops (relinearize / rotate / conjugate)
# =========================================================================

@partial(jax.jit, static_argnames=("level",))
def _keyswitch_poly(ctx, poly_ntt, k0, k1, level):
    """Keyswitch one NTT-domain poly at `level`; returns (d0,d1) NTT-domain.
    Dispatches on the context's keyswitching method (reference METHOD_I/II)."""
    ka = ctx.active(level)
    if ctx.ks_type == "II":
        d_lvl = -(-ka // ctx.alpha)
        k0s = _slice_key2(ctx, k0, ka, d_lvl)
        k1s = _slice_key2(ctx, k1, ka, d_lvl)
        return keyswitch2.keyswitch2(
            poly_ntt, k0s, k1s, ctx.ks2[level], ctx.ntt_qp_at(level),
            ctx.base_qp_at(level), in_ntt=True, out_ntt=True,
            ntt_q_level=ctx.ntt_q(level))
    k_gen = k0.shape[1] - len(ctx.p_primes)
    _check_key_level(ctx, ka, k_gen)
    k0s = ringkit.slice_key_level(k0, ka, k_gen)
    k1s = ringkit.slice_key_level(k1, ka, k_gen)
    return ringkit.keyswitch_core(
        poly_ntt, k0s, k1s, ctx.base_qp_at(level), ctx.ntt_qp_at(level),
        ctx.div_p_at(level), in_ntt=True, out_ntt=True, ntt_q=ctx.ntt_q(level))


def _check_key_level(ctx, ka: int, k_gen: int):
    """A key generated at a deeper level (fewer limbs) than the use level
    would be clamp-sliced by jnp into a malformed key (special limbs
    aliased into Q columns) — fail loudly instead, for BOTH methods."""
    if ka > k_gen:
        raise errors.LevelMismatchError(
            f"key generated at a {k_gen}-limb basis used at a level with "
            f"{ka} active limbs; regenerate the key at level <= "
            f"{ctx.k - k_gen}")


def _slice_key2(ctx, k_arr, ka: int, d_lvl: int):
    """Method-II key slice: first d_lvl digits, active Q limbs + all
    specials.  The key's own Q extent is derived from its shape, so keys
    GENERATED at a deeper level (fewer limbs, see keygen_galois(level=))
    slice identically — the grouped gadget is a prefix partition, so a
    truncated-basis key IS the prefix slice of the full-basis key."""
    k_gen = k_arr.shape[1] - len(ctx.p_primes)
    _check_key_level(ctx, ka, k_gen)
    if ka == k_gen and d_lvl == k_arr.shape[0]:
        return k_arr
    return jnp.concatenate([k_arr[:d_lvl, :ka], k_arr[:d_lvl, k_gen:]], axis=1)


def _key_ring(ctx, kk):
    """Ring view of the basis a key was generated in (shape-derived)."""
    k_gen = kk.k0.shape[1] - len(ctx.p_primes)
    return _ring_at(ctx, ctx.k - k_gen)


def _k1_of(ctx, kk):
    """Uniform key half, regenerated on device when the key is stored
    stripped (seed-expanded, k1=None) — see ringkit.ensure_k1."""
    return ringkit.ensure_k1(_key_ring(ctx, kk), kk)


def relinearize(ctx, a: Ciphertext, rk: KSKey) -> Ciphertext:
    errors.check_size(a.size, 3, "relinearize")
    d0, d1 = _keyswitch_poly(ctx, a.c[2], rk.k0, _k1_of(ctx, rk), a.level)
    p = _p_at(ctx, a.level)
    return Ciphertext(jnp.stack([mm.add_mod(a.c[0], d0, p),
                                 mm.add_mod(a.c[1], d1, p)]),
                      2, a.level, a.scale)


def apply_galois(ctx, a: Ciphertext, gk1: GaloisKeyOne) -> Ciphertext:
    errors.check_size(a.size, 2, "apply_galois")
    p = _p_at(ctx, a.level)
    if gk1.inv_form:
        # σ applied ONCE to the combined pair: σ(c0 + KS'(c1)) = σ(c0)+KS(σ(c1))
        d0, d1 = _keyswitch_poly(ctx, a.c[1], gk1.k0, _k1_of(ctx, gk1),
                                 a.level)
        out = jnp.stack([mm.add_mod(a.c[0], d0, p), d1])
        return Ciphertext(polyops.apply_galois_ntt(out, gk1.perm_ntt),
                          2, a.level, a.scale)
    g0 = polyops.apply_galois_ntt(a.c[0], gk1.perm_ntt)
    g1 = polyops.apply_galois_ntt(a.c[1], gk1.perm_ntt)
    d0, d1 = _keyswitch_poly(ctx, g1, gk1.k0, _k1_of(ctx, gk1), a.level)
    return Ciphertext(jnp.stack([mm.add_mod(g0, d0, p), d1]), 2, a.level, a.scale)


def rotate(ctx, a: Ciphertext, gk: GaloisKey, step: int) -> Ciphertext:
    """Rotate slots left by `step` using the stored power-of-two key chain."""
    n = ctx.n
    step = step % (n // 2)
    if step == 0:
        return a
    out = a
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


def conjugate(ctx, a: Ciphertext, gk: GaloisKey) -> Ciphertext:
    return apply_galois(ctx, a, gk.keys["conj"])


def switch_key(ctx, a: Ciphertext, swk: KSKey) -> Ciphertext:
    errors.check_size(a.size, 2, "switch_key")
    d0, d1 = _keyswitch_poly(ctx, a.c[1], swk.k0, _k1_of(ctx, swk), a.level)
    p = _p_at(ctx, a.level)
    return Ciphertext(jnp.stack([mm.add_mod(a.c[0], d0, p), d1]), 2, a.level, a.scale)


# =========================================================================
# Hoisted rotations (reference fast_single_hoisting_rotation_ckks_method_I,
# src/lib/host/ckks/operator.cu:4674: decompose once, rotate many)
# =========================================================================

def _hoist_key_slices(ctx, gk1, lvl):
    """Level-sliced key pair for either keyswitching method."""
    ka = ctx.active(lvl)
    k1 = _k1_of(ctx, gk1)
    if ctx.ks_type == "II":
        d_lvl = -(-ka // ctx.alpha)
        return (_slice_key2(ctx, gk1.k0, ka, d_lvl),
                _slice_key2(ctx, k1, ka, d_lvl))
    k_gen = gk1.k0.shape[1] - len(ctx.p_primes)
    _check_key_level(ctx, ka, k_gen)
    return (ringkit.slice_key_level(gk1.k0, ka, k_gen),
            ringkit.slice_key_level(k1, ka, k_gen))


def hoist(ctx, a: Ciphertext):
    """Phase-1 keyswitch digits of a.c[1] over Q̃, shared by many rotations
    (Method I: per-prime broadcast digits; Method II: grouped FastBconv
    digits — the reference hoists both, operator.cu:4674/5092)."""
    assert a.size == 2
    lvl = a.level
    if ctx.ks_type == "II":
        ka = ctx.active(lvl)
        ks2 = ctx.ks2[lvl]
        poly = nttm.ntt_inv(a.c[1], ctx.ntt_q(lvl))
        digs = [ks2.convs[j](poly[..., g[0]: g[-1] + 1, :])
                for j, g in enumerate(ks2.groups)]
        return nttm.ntt_fwd(jnp.stack(digs, axis=-3), ctx.ntt_qp_at(lvl))
    return ringkit.hoist_digits(a.c[1], ctx.base_qp_at(lvl), ctx.ntt_qp_at(lvl),
                                in_ntt=True, ntt_q=ctx.ntt_q(lvl))


def ks_finish_at(ctx, acc, level: int, out_ntt: bool = True):
    """INTT over Q̃ + exact ÷P (one or alpha stages) + NTT over Q."""
    coeff = nttm.ntt_inv(acc, ctx.ntt_qp_at(level))
    if ctx.ks_type == "II":
        for stage in ctx.ks2[level].div_stages:
            coeff = stage(coeff)
    else:
        coeff = ctx.div_p_at(level)(coeff)
    return nttm.ntt_fwd(coeff, ctx.ntt_q(level)) if out_ntt else coeff


def rotate_hoisted(ctx, a: Ciphertext, d_ntt, gk1: GaloisKeyOne) -> Ciphertext:
    """Apply sigma_g to `a` reusing precomputed digits: the Galois gather acts
    directly on the NTT-domain digits (digit decomposition commutes with the
    automorphism up to per-limb negation, which the gather's sign structure
    absorbs because NTT-domain permutation == coefficient permute+negate)."""
    lvl = a.level
    pc0 = p_scale_to_qtilde(ctx, a.c[0], lvl)
    t0, t1 = rotate_hoisted_qtilde(ctx, d_ntt, gk1, pc0, lvl)
    out = ks_finish_at(ctx, jnp.stack([t0, t1]), lvl)
    return Ciphertext(out, 2, lvl, a.scale)


def rotate_hoisted_qtilde(ctx, d_ntt, gk1: GaloisKeyOne, pc0, level: int):
    """The P-scaled σ_g-rotated pair over Q̃ (NTT domain) BEFORE the ÷P
    step: (t0, t1) with t0 = σ(P·c0) + MAC0, t1 = MAC1 — callers accumulate
    many rotated terms in the extended basis and divide once (the
    reference's double-hoisting: broadcast_scale_P_kernel +
    addition_pql_kernel, operator.cu:4674).

    pc0 = p_scale_to_qtilde(ctx, c0, level), computed ONCE per hoist and
    shared across rotations.  inv_form keys MAC the UNPERMUTED digits and
    permute only the combined pair — the gather volume per rotation drops
    from (d̃+1) polys to 2."""
    base_qp = ctx.base_qp_at(level)
    k0s, k1s = _hoist_key_slices(ctx, gk1, level)
    if gk1.inv_form:
        acc0 = rns.lazy_mac_mont(d_ntt, k0s, base_qp)
        acc1 = rns.lazy_mac_mont(d_ntt, k1s, base_qp)
        t0 = mm.add_mod(acc0, pc0, base_qp.p[:, None])
        return (polyops.apply_galois_ntt(t0, gk1.perm_ntt),
                polyops.apply_galois_ntt(acc1, gk1.perm_ntt))
    dp = polyops.apply_galois_ntt(d_ntt, gk1.perm_ntt)
    acc0 = rns.lazy_mac_mont(dp, k0s, base_qp)
    acc1 = rns.lazy_mac_mont(dp, k1s, base_qp)
    t0 = mm.add_mod(acc0, polyops.apply_galois_ntt(pc0, gk1.perm_ntt),
                    base_qp.p[:, None])
    return t0, acc1


def monomial_mult_tables(ctx, k_exp: int):
    """NTT-domain pointwise tables for multiplication by X^k over all QP
    limbs: tab[l, j] = psi_l^((2j+1)k mod 2n).  X^(n/2) multiplies every slot
    by i, X^(-n/2 mod 2n) by -i — the TPU analog of the reference's
    cipher_mult_by_i / cipher_div_by_i kernels (kernel/multiplication.cuh)."""
    n = ctx.n
    psi_host = np.asarray(ctx.ntt_qp.psi).astype(np.uint64)   # (k+p, n)
    primes = np.asarray([int(q) for q in ctx.qp_primes], np.uint64)
    eo = nttm.eval_order(n).astype(np.int64)  # position p holds eval eo[p]
    e = ((2 * eo + 1) * (k_exp % (2 * n))) % (2 * n)
    wrap = e >= n
    idx = np.where(wrap, e - n, e)
    vals = psi_host[:, idx]                                    # (L, n)
    vals = np.where(wrap[None, :], primes[:, None] - vals, vals)
    sh = (vals << np.uint64(32)) // primes[:, None]
    return jnp.asarray(vals.astype(np.uint32)), jnp.asarray(sh.astype(np.uint32))


def multiply_by_monomial(ctx, a: Ciphertext, tables) -> Ciphertext:
    """Multiply by X^k using tables from monomial_mult_tables (scale-free)."""
    tab, tab_sh = tables
    ka = ctx.active(a.level)
    p = _p_at(ctx, a.level)
    out = mm.shoup_mul(a.c, tab[:ka], tab_sh[:ka], p)
    return Ciphertext(out, a.size, a.level, a.scale)


def p_scale_to_qtilde(ctx, poly_q, level: int):
    """Embed P·x into the Q̃ basis from x over Q: per-limb scalar multiply by
    (P mod q_i) on Q limbs, zeros on special limbs (broadcast_scale_P_kernel)."""
    ka = ctx.active(level)
    P = _prod(int(p) for p in ctx.p_primes)
    qs = ctx.q_primes[:ka]
    fac = np.array([P % int(q) for q in qs], np.uint32)
    fac_sh = np.array([mm.shoup(int(f), int(q)) for f, q in zip(fac, qs)], np.uint32)
    scaled = mm.shoup_mul(poly_q, jnp.asarray(fac)[:, None],
                          jnp.asarray(fac_sh)[:, None],
                          ctx.base_q_at(level).p[:, None])
    zeros = jnp.zeros(poly_q.shape[:-2] + (len(ctx.p_primes), ctx.n), jnp.uint32)
    return jnp.concatenate([scaled, zeros], axis=-2)


def multiply_power_of_x(ctx: CkksContext, a: Ciphertext, k: int) -> Ciphertext:
    """a * X^k — an NTT-domain pointwise multiply by the monomial tables
    (reference multiply_power_of_X / negacyclic_shift_poly_coeffmod)."""
    return multiply_by_monomial(ctx, a, monomial_mult_tables(ctx, k))


def print_parameters(ctx: CkksContext):
    """Reference HEContext::print_parameters analog."""
    total = sum(int(q).bit_length() for q in ctx.q_primes)
    ptotal = sum(int(q).bit_length() for q in ctx.p_primes)
    print(f"/ CKKS parameters\n"
          f"| poly_modulus_degree: {ctx.n} (slots: {ctx.n // 2})\n"
          f"| coeff_modulus: {total}+{ptotal} bits "
          f"({ctx.k} Q + {len(ctx.p_primes)} P primes)\n"
          f"| default scale: 2^{int(math.log2(ctx.default_scale))}\n"
          f"| keyswitching: METHOD_{ctx.ks_type} (alpha={ctx.alpha})\n"
          f"\\ security: {ctx.sec_level}")
