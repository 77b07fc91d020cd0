"""TFHE scheme (torus/boolean, gate bootstrapping) — TPU-native implementation.

Capability match for HEonGPU's TFHE family (src/lib/host/tfhe/*: fixed STD128
context, LWE encrypt/decrypt of bool vectors, NAND/AND/NOR/OR/XNOR/XOR/NOT/
MUX through blind-rotation gate bootstrapping + LWE keyswitch — SURVEY §2.5),
with the same STD128 parameter shape (LWE n=512, TRLWE N=1024 k=1, l=2
bg_bit=10 decomposition, base-4 length-8 keyswitch; reference
src/lib/host/tfhe/context.cu:36-57).

TPU-first redesign (vs the reference's sequential per-gate kernel chain,
operator.cu:200-270):
  * everything is *batched over gates* (leading batch axis B): the n=512 CMux
    chain is a lax.fori_loop whose body processes all gates at once — the MXU
    /VPU see (B,4,2,N) tensors instead of 512 tiny kernel launches;
  * the 61-bit NTT prime of the reference is replaced by a CRT pair of
    < 2**30 primes (uint32 lanes), reconstructed to Torus32 after INTT;
  * torus arithmetic is plain uint32 wraparound (mod 2^32).
"""

from __future__ import annotations

import dataclasses
import math
import weakref
from functools import partial

import numpy as np
import jax
import jax.numpy as jnp

from ..ops import modmath as mm
from ..ops import ntt as nttm
from ..utils import nt, rng

U32 = jnp.uint32

# ------------------------------------------------------------------
# STD128 parameters (reference host/tfhe/context.cu:36-57)
# ------------------------------------------------------------------
LWE_N = 512
TRLWE_N = 1024
TRLWE_K = 1
BK_L = 2
BG_BIT = 10
BG = 1 << BG_BIT
KS_BASE_BIT = 2
KS_BASE = 1 << KS_BASE_BIT
KS_LENGTH = 8
SIGMA_KS = math.sqrt(2.0 / math.pi) * (2.0 ** -15)
SIGMA_BK = math.sqrt(2.0 / math.pi) * 9.0e-9
MU = np.uint32(1 << 29)  # 1/8 of the torus


@partial(
    jax.tree_util.register_dataclass,
    data_fields=["ntt", "p1p2_mod32", "p1p2_half_hi", "p1p2_half_lo",
                 "p1_inv_p2", "p1_inv_p2_sh", "offset", "omega_bits"],
    meta_fields=["n", "N", "k", "l", "bg_bit", "ks_base_bit", "ks_length",
                 "primes"],
)
@dataclasses.dataclass(frozen=True)
class TfheContext:
    n: int
    N: int
    k: int
    l: int
    bg_bit: int
    ks_base_bit: int
    ks_length: int
    primes: tuple
    ntt: nttm.NttTables          # CRT pair over N=1024
    p1p2_mod32: jnp.ndarray      # () P=p1*p2 mod 2^32
    p1p2_half_hi: jnp.ndarray    # () floor(P/2) >> 32
    p1p2_half_lo: jnp.ndarray    # () floor(P/2) & mask
    p1_inv_p2: jnp.ndarray       # () p1^{-1} mod p2
    p1_inv_p2_sh: jnp.ndarray
    offset: jnp.ndarray          # () gadget decomposition offset
    omega_bits: jnp.ndarray      # (6, 4, 2, N) mont NTT-domain X^(c*4^g)


def _omega_digit_tables(ntt: nttm.NttTables, N: int) -> jnp.ndarray:
    """NTT-domain (Montgomery form) values of the monomials X^(c·4^g) for
    radix-4 digits c ∈ [0,4) of the rotation amount, g = 0..5 (11 bits of
    amt < 2N): table[g, c, l, pos] = psi_l^((2·eo[pos]+1)·c·4^g mod 2N)·R.
    Multiplying by X^amt becomes a product of 6 digit-selected tables (down
    from 11 bit tables) — the gather-free form of the blind-rotation's
    data-dependent rotation."""
    psi_host = np.asarray(ntt.psi).astype(np.uint64)      # (2, N) psi^i
    primes = np.asarray(np.asarray(ntt.p), np.uint64)
    eo = nttm.eval_order(N).astype(np.int64)
    bits = (2 * N).bit_length() - 1                        # 11 for N=1024
    G = (bits + 1) // 2
    out = np.empty((G, 4, 2, N), np.uint64)
    for g in range(G):
        for c in range(4):
            e = ((2 * eo + 1) * (c << (2 * g))) % (2 * N)
            wrap = e >= N
            idx = np.where(wrap, e - N, e)
            v = psi_host[:, idx]
            v = np.where(wrap[None, :], primes[:, None] - v, v)
            out[g, c] = v * (np.uint64(1) << 32) % primes[:, None]  # to mont
    return jnp.asarray(out.astype(np.uint32))


def make_context(lwe_n: int = LWE_N) -> TfheContext:
    """STD128 TFHE context (reference host/tfhe/context.cu:36-57).

    lwe_n < 512 is a TEST-ONLY knob: it shortens the CMux chain (and thus
    CPU-oracle test time) proportionally while keeping every code path —
    NOT a secure parameter set."""
    primes = nt.generate_ntt_primes(30, 2, TRLWE_N)
    p1, p2 = primes
    P = p1 * p2
    inv = pow(p1, -1, p2)
    offset = sum((BG // 2) << (32 - (p + 1) * BG_BIT) for p in range(BK_L)) % (1 << 32)
    ntt = nttm.build_ntt_tables(primes, TRLWE_N)
    assert lwe_n % _RENORM == 0, lwe_n
    return TfheContext(
        n=lwe_n, N=TRLWE_N, k=TRLWE_K, l=BK_L, bg_bit=BG_BIT,
        ks_base_bit=KS_BASE_BIT, ks_length=KS_LENGTH, primes=tuple(primes),
        ntt=ntt,
        p1p2_mod32=jnp.uint32(P % (1 << 32)),
        p1p2_half_hi=jnp.uint32((P // 2) >> 32),
        p1p2_half_lo=jnp.uint32((P // 2) & 0xFFFFFFFF),
        p1_inv_p2=jnp.uint32(inv),
        p1_inv_p2_sh=jnp.uint32(mm.shoup(inv, p2)),
        offset=jnp.uint32(offset),
        omega_bits=_omega_digit_tables(ntt, TRLWE_N),
    )


@partial(jax.tree_util.register_dataclass,
         data_fields=["lwe", "rlwe"], meta_fields=[])
@dataclasses.dataclass(frozen=True)
class SecretKey:
    lwe: jnp.ndarray   # (n,) uint32 binary
    rlwe: jnp.ndarray  # (N,) uint32 binary


@partial(jax.tree_util.register_dataclass,
         data_fields=["bk", "ksk_a", "ksk_b"], meta_fields=[])
@dataclasses.dataclass(frozen=True)
class BootKey:
    """bk: (n, (k+1)l, k+1, 2, N) NTT+Montgomery TGSW rows;
    ksk: LWE_n(v * rlwe_j * 2^(32-(t+1)*basebit)) for v in [0, base)."""
    bk: jnp.ndarray
    ksk_a: jnp.ndarray  # (N, ks_length, base, n) uint32
    ksk_b: jnp.ndarray  # (N, ks_length, base) uint32


@partial(jax.tree_util.register_dataclass,
         data_fields=["bk2", "ksk_a", "ksk_b"], meta_fields=[])
@dataclasses.dataclass(frozen=True)
class BootKey2:
    """2-bit key-unrolled bootstrapping key: for each LWE bit pair
    (s0, s1) = (s_2i, s_2i+1), THREE TGSWs encrypting s0, s1 and s0·s1
    (NTT+Montgomery).  The CMux chain then runs n/2 steps of
      acc += <D(acc), B0>·(X^a0−1) + <D(acc), B1>·(X^a1−1)
             + <D(acc), B01>·(X^a0−1)(X^a1−1)
    — the expansion of X^(a0·s0 + a1·s1) over binary s (key unrolling,
    halving the sequential depth the reference runs at full length,
    src/lib/kernel/bootstrapping.cu).  bk2: (n/2, 3, rows, comp, 2, N)."""
    bk2: jnp.ndarray
    ksk_a: jnp.ndarray
    ksk_b: jnp.ndarray


def keygen_boot_unrolled(ctx: TfheContext, key, sk: SecretKey) -> BootKey2:
    """BootKey2 generation: same TRLWE(0)+gadget structure as keygen_boot
    with message bits (s0, s1, s0·s1) per pair; 1.5x the key material for
    half the sequential chain."""
    n, N, l = ctx.n, ctx.N, ctx.l
    k_bk_a, k_bk_e, k_ks_a, k_ks_e = rng.split(key, 4)

    s_rns = rng.signed_to_rns(sk.rlwe.astype(jnp.int32), ctx.primes)
    p = ctx.ntt.p[:, None]
    pinv = ctx.ntt.pinv[:, None]
    r2 = ctx.ntt.r2[:, None]
    s_ntt_mont = mm.to_mont(nttm.ntt_fwd(s_rns, ctx.ntt), p, pinv, r2)

    rows = (ctx.k + 1) * l                       # 4
    n2 = n // 2
    a = rng.bits32(k_bk_a, (n2, 3, rows, N))
    e = _torus_noise(k_bk_e, (n2, 3, rows, N), SIGMA_BK)
    b = _polymul_rlwe_key_torus(ctx, a, s_ntt_mont) + e
    gad = np.zeros((rows, 2, N), np.uint32)
    for c in range(ctx.k + 1):
        for pdig in range(l):
            gad[c * l + pdig, c, 0] = 1 << (32 - (pdig + 1) * ctx.bg_bit)
    gadj = jnp.asarray(gad)[None, None]          # (1, 1, rows, comp, N)
    s0 = sk.lwe[0::2]
    s1 = sk.lwe[1::2]
    msg = jnp.stack([s0, s1, s0 * s1], axis=1)   # (n/2, 3) bits
    trlwe = jnp.stack([a, b], axis=3)            # (n/2, 3, rows, comp, N)
    trlwe = trlwe + msg[:, :, None, None, None] * gadj
    bk2 = mm.to_mont(nttm.ntt_fwd(_torus_to_rns(ctx, trlwe), ctx.ntt),
                     p, pinv, r2)

    base = 1 << ctx.ks_base_bit
    ksk_a = rng.bits32(k_ks_a, (N, ctx.ks_length, base, n))
    e_ks = _torus_noise(k_ks_e, (N, ctx.ks_length, base), SIGMA_KS)
    shift = jnp.asarray(
        np.array([1 << (32 - (t + 1) * ctx.ks_base_bit)
                  for t in range(ctx.ks_length)], np.uint32))
    v = jnp.arange(base, dtype=U32)
    msg_ks = (sk.rlwe[:, None, None] * shift[None, :, None] * v[None, None, :])
    ksk_b = jnp.sum(ksk_a * sk.lwe[None, None, None, :], axis=-1) + e_ks + msg_ks
    ksk_a = ksk_a.at[:, :, 0, :].set(0)
    ksk_b = ksk_b.at[:, :, 0].set(0)
    return BootKey2(bk2, ksk_a, ksk_b)


@partial(jax.tree_util.register_dataclass,
         data_fields=["a", "b"], meta_fields=["variance"])
@dataclasses.dataclass(frozen=True)
class Ciphertext:
    """Batched LWE samples (reference ciphertext.cuh a/b device arrays).
    `variance` tracks the torus-noise variance through linear pre-comps and
    resets at every bootstrap — the reference's variances_/alpha bookkeeping
    (src/lib/host/tfhe/operator.cu:40-44,259-263,287-293) as metadata."""
    a: jnp.ndarray  # (B, n) uint32
    b: jnp.ndarray  # (B,) uint32
    variance: float = 0.0


def keygen_secret(key, lwe_n: int = LWE_N) -> SecretKey:
    k1, k2 = rng.split(key)
    lwe = rng.randint(k1, (lwe_n,), 0, 2).astype(U32)
    rlwe = rng.randint(k2, (TRLWE_N,), 0, 2).astype(U32)
    return SecretKey(lwe, rlwe)


def _torus_noise(key, shape, sigma):
    g = rng.normal(key, shape) * (sigma * (2.0 ** 32))
    return jnp.round(g).astype(jnp.int32).astype(U32)


def _polymul_rlwe_key_torus(ctx: TfheContext, a, s_ntt_mont):
    """Negacyclic a(X)*s(X) over Torus32 via the CRT NTT pair.

    a: (..., N) uint32 torus; s_ntt_mont: (2, N) NTT+mont of the binary key."""
    ar = _torus_to_rns(ctx, a)                          # (..., 2, N)
    A = nttm.ntt_fwd(ar, ctx.ntt)
    p = ctx.ntt.p[:, None]
    pinv = ctx.ntt.pinv[:, None]
    prod = mm.mont_mul(A, s_ntt_mont, p, pinv)
    c = nttm.ntt_inv(prod, ctx.ntt)
    return _rns_to_torus(ctx, c)


def _torus_to_rns(ctx: TfheContext, v):
    """uint32 torus (centered semantics) -> residues mod (p1,p2): (..., 2, N)."""
    p = ctx.ntt.p
    neg = v >= jnp.uint32(1 << 31)
    mag = jnp.where(neg, -v, v)  # |centered value|, wraparound negation
    out = []
    for li in range(2):
        m = mm.barrett32(mag, p[li], ctx.ntt.mu[li])
        out.append(jnp.where(neg, mm.neg_mod(m, p[li]), m))
    return jnp.stack(out, axis=-2)


def _rns_to_torus(ctx: TfheContext, r):
    """(..., 2, N) residues -> centered value mod 2^32 (Torus32)."""
    r1 = r[..., 0, :]
    r2 = r[..., 1, :]
    p1 = ctx.ntt.p[0]
    p2 = ctx.ntt.p[1]
    t = mm.sub_mod(r2, mm.barrett32(r1, p2, ctx.ntt.mu[1]), p2)
    t = mm.shoup_mul(t, ctx.p1_inv_p2, ctx.p1_inv_p2_sh, p2)
    hi, lo = mm.widening_mul(t, p1)
    lo2 = lo + r1
    hi = hi + (lo2 < lo).astype(U32)
    # centered: subtract P if value >= P/2 (64-bit compare)
    ge = jnp.logical_or(hi > ctx.p1p2_half_hi,
                        jnp.logical_and(hi == ctx.p1p2_half_hi,
                                        lo2 >= ctx.p1p2_half_lo))
    return jnp.where(ge, lo2 - ctx.p1p2_mod32, lo2)


def keygen_boot(ctx: TfheContext, key, sk: SecretKey) -> BootKey:
    """Bootstrapping key (TGSW(s_lwe_i) under rlwe key, NTT domain) + LWE
    keyswitch key.  Reference analog: keygenerator.cu:61-180."""
    n, N, l = ctx.n, ctx.N, ctx.l
    k_bk_a, k_bk_e, k_ks_a, k_ks_e = rng.split(key, 4)

    s_rns = rng.signed_to_rns(sk.rlwe.astype(jnp.int32), ctx.primes)
    p = ctx.ntt.p[:, None]
    pinv = ctx.ntt.pinv[:, None]
    r2 = ctx.ntt.r2[:, None]
    s_ntt_mont = mm.to_mont(nttm.ntt_fwd(s_rns, ctx.ntt), p, pinv, r2)

    rows = (ctx.k + 1) * l                       # 4
    # TRLWE(0) for every (i, row): a uniform torus poly, b = a*s + e
    a = rng.bits32(k_bk_a, (n, rows, N))
    e = _torus_noise(k_bk_e, (n, rows, N), SIGMA_BK)
    b = _polymul_rlwe_key_torus(ctx, a, s_ntt_mont) + e   # uint32 wrap
    # gadget: row (c, p) adds the constant s_i * 2^(32-(p+1)*bgbit) to
    # component c — i.e. to coefficient 0 only (the message is a constant)
    gad = np.zeros((rows, 2, N), np.uint32)      # (row, comp, N)
    for c in range(ctx.k + 1):
        for pdig in range(l):
            gad[c * l + pdig, c, 0] = 1 << (32 - (pdig + 1) * ctx.bg_bit)
    gadj = jnp.asarray(gad)[None]                # (1, rows, comp, N)
    si = sk.lwe[:, None, None, None]             # (n,1,1,1)
    trlwe = jnp.stack([a, b], axis=2)            # (n, rows, comp=2, N)
    trlwe = trlwe + si * gadj                    # uint32 wrap add of message
    # to NTT+Montgomery over the CRT pair: (n, rows, comp, 2, N)
    bk_rns = _torus_to_rns(ctx, trlwe)
    bk_ntt = nttm.ntt_fwd(bk_rns, ctx.ntt)
    bk = mm.to_mont(bk_ntt, p, pinv, r2)

    # keyswitch key: LWE_n( v * s'_j * 2^(32-(t+1)*basebit) )
    base = 1 << ctx.ks_base_bit
    ksk_a = rng.bits32(k_ks_a, (N, ctx.ks_length, base, n))
    e_ks = _torus_noise(k_ks_e, (N, ctx.ks_length, base), SIGMA_KS)
    shift = jnp.asarray(
        np.array([1 << (32 - (t + 1) * ctx.ks_base_bit)
                  for t in range(ctx.ks_length)], np.uint32))
    v = jnp.arange(base, dtype=U32)
    msg = (sk.rlwe[:, None, None] * shift[None, :, None] * v[None, None, :])
    ksk_b = jnp.sum(ksk_a * sk.lwe[None, None, None, :], axis=-1) + e_ks + msg
    # zero out the v=0 slice so it adds nothing (incl. its noise)
    ksk_a = ksk_a.at[:, :, 0, :].set(0)
    ksk_b = ksk_b.at[:, :, 0].set(0)
    return BootKey(bk, ksk_a, ksk_b)


# ------------------------------------------------------------------
# LWE encrypt / decrypt
# ------------------------------------------------------------------

def encrypt(ctx: TfheContext, sk: SecretKey, bits, key) -> Ciphertext:
    """bits: (B,) bools -> batched LWE with mu = ±1/8."""
    bits = jnp.asarray(bits)
    B = bits.shape[0]
    ka, ke = rng.split(key)
    a = rng.bits32(ka, (B, ctx.n))
    e = _torus_noise(ke, (B,), SIGMA_KS)
    mu = jnp.where(bits, MU, jnp.uint32(-np.int64(MU) & 0xFFFFFFFF))
    b = jnp.sum(a * sk.lwe[None, :], axis=-1) + mu + e
    return Ciphertext(a, b, variance=SIGMA_KS ** 2)


def decrypt(ctx: TfheContext, sk: SecretKey, ct: Ciphertext) -> np.ndarray:
    phase = ct.b - jnp.sum(ct.a * sk.lwe[None, :], axis=-1)
    return np.asarray(phase < jnp.uint32(1 << 31))


# ------------------------------------------------------------------
# Gate bootstrapping pipeline
# ------------------------------------------------------------------

def _negacyclic_rotate_batch(x, amt, N):
    """x: (B, ..., N) torus; amt: (B,) rotation exponents in [0, 2N):
    returns X^amt * x per batch element."""
    j = jnp.arange(N, dtype=jnp.int32)[None, :]           # (1, N)
    src = (j - amt[:, None].astype(jnp.int32)) % (2 * N)  # (B, N)
    flip = src >= N
    src = jnp.where(flip, src - N, src)
    extra = x.ndim - 2
    src_b = src.reshape(src.shape[0], *([1] * extra), N)
    src_b = jnp.broadcast_to(src_b, x.shape)
    g = jnp.take_along_axis(x, src_b, axis=-1)
    flip_b = jnp.broadcast_to(flip.reshape(flip.shape[0], *([1] * extra), N), x.shape)
    return jnp.where(flip_b, -g, g)


def _decompose(ctx: TfheContext, d):
    """Approximate signed gadget decomposition of (B, comp, N) torus into
    (B, comp*l, N) digits in [-bg/2, bg/2)."""
    u = d + ctx.offset
    digs = []
    for pdig in range(ctx.l):
        sh = 32 - (pdig + 1) * ctx.bg_bit
        digs.append(((u >> sh) & jnp.uint32(BG - 1)).astype(jnp.int32) - BG // 2)
    # layout must match gadget rows: (comp, l) flattened in row-major
    out = jnp.stack(digs, axis=-2)                        # (B, comp, l, N)
    return out.reshape(d.shape[0], -1, d.shape[-1])       # (B, comp*l, N)


def _signed_to_rns(ctx: TfheContext, d):
    """int32 digits -> (.., 2, N) residues."""
    p = ctx.ntt.p.reshape(1, 1, 2, 1)
    neg = d < 0
    mag = jnp.abs(d).astype(U32)[..., None, :]
    mag = jnp.broadcast_to(mag, mag.shape[:-2] + (2, mag.shape[-1]))
    return jnp.where(neg[..., None, :], jnp.where(mag == 0, mag, p - mag), mag)


def _external_product_ntt(ctx: TfheContext, bk_i, d):
    """TGSW (NTT+mont, (rows,comp,2,N)) ⊡ TRLWE diff d (B,comp,N) torus.
    Returns the product in the RNS-NTT domain (no inverse transform)."""
    digs = _decompose(ctx, d)                             # (B, rows, N) int32
    dr = _signed_to_rns(ctx, digs)                        # (B, rows, 2, N)
    D = nttm.ntt_fwd(dr, ctx.ntt)
    p = ctx.ntt.p[:, None]
    pinv = ctx.ntt.pinv[:, None]
    prod = mm.mont_mul(D[:, :, None], bk_i, p, pinv)      # (B, rows, comp, 2, N)
    acc = prod[:, 0]
    for r in range(1, prod.shape[1]):
        acc = mm.add_mod(acc, prod[:, r], p)
    return acc                                            # (B, comp, 2, N)


def _external_product(ctx: TfheContext, bk_i, d):
    """TGSW ⊡ TRLWE diff, back in the torus domain."""
    c = nttm.ntt_inv(_external_product_ntt(ctx, bk_i, d), ctx.ntt)
    return _rns_to_torus(ctx, c)                          # (B, comp, N)


def _sel4(tab_g, dig):
    """Select tab_g[c] per batch element: tab_g (4, 2, N), dig (B,) in [0,4)."""
    d = dig[:, None, None]
    w = jnp.where(d == 1, tab_g[1][None], tab_g[0][None])
    w = jnp.where(d == 2, tab_g[2][None], w)
    return jnp.where(d == 3, tab_g[3][None], w)


def _omega_mont(ctx: TfheContext, amt):
    """NTT-domain Montgomery form of X^amt per batch element, built as a
    product of radix-4 digit-selected tables (no gathers, 6 products):
    amt (B,) int32 in [0, 2N)."""
    p = ctx.ntt.p[:, None]
    pinv = ctx.ntt.pinv[:, None]
    G = ctx.omega_bits.shape[0]
    w = _sel4(ctx.omega_bits[0], amt & 3)
    for g in range(1, G):
        wg = _sel4(ctx.omega_bits[g], (amt >> (2 * g)) & 3)
        w = mm.mont_mul(w, wg, p, pinv)
    return w


def _modswitch(x, N):
    """Torus32 -> exponent of X in [0, 2N)."""
    sh = 32 - (2 * N).bit_length() + 1                    # 32 - log2(2N)
    return ((x + (jnp.uint32(1) << (sh - 1))) >> sh).astype(jnp.int32)


def blind_rotate_variance(ctx: TfheContext, unroll_factor: int = 1) -> float:
    """Noise variance of the blind rotation + sample extract alone (CGGI
    estimate: external products + decomposition error), i.e. the N-LWE
    sample BEFORE the base-4 keyswitch.  unroll_factor=4 for the 2-bit
    key-unrolled chain: three u-scaled external products per pair-step,
    ||X^a − 1||² = 2 per convolution."""
    br = (ctx.n * (ctx.k + 1) * ctx.l * ctx.N * (BG / 2) ** 2 * SIGMA_BK ** 2
          + ctx.n * (1 + ctx.k * ctx.N) * (2.0 ** (-2 * ctx.bg_bit * ctx.l)) / 12)
    return br * unroll_factor


def keyswitch_variance(ctx: TfheContext) -> float:
    """Noise added by the N→n base-4 LWE keyswitch."""
    return ctx.N * ctx.ks_length * SIGMA_KS ** 2 \
        + ctx.N * (2.0 ** (-2 * ctx.ks_base_bit * ctx.ks_length)) / 12


def bootstrap_output_variance(ctx: TfheContext, unroll_factor: int = 1) -> float:
    """Fresh-output noise variance of one gate bootstrap (blind rotation +
    keyswitch)."""
    return blind_rotate_variance(ctx, unroll_factor) + keyswitch_variance(ctx)


def noise_margin_bits(ct: Ciphertext) -> float:
    """log2 of mu/(4*sigma): >0 means comfortable decryption margin
    (reference alpha_min/max style observability)."""
    import math
    sigma = max(math.sqrt(ct.variance), 1e-30)
    return math.log2((1.0 / 8.0) / (4.0 * sigma))


_RENORM = 8  # CMux steps between torus renormalisations of the accumulator


def _boot_prologue(ctx: TfheContext, ct: Ciphertext):
    """Initial NTT-domain accumulator (testvector rotated by X^{-b}) and the
    mod-switched per-step rotation amounts."""
    B = ct.a.shape[0]
    N = ctx.N
    p = ctx.ntt.p[:, None]
    pinv = ctx.ntt.pinv[:, None]
    testv = jnp.broadcast_to(MU, (B, N)).astype(U32)
    b_t = _modswitch(ct.b, N)
    zero = jnp.zeros((B, 1, N), U32)
    acc_t = jnp.concatenate([zero, testv[:, None, :]], axis=1)
    acc = nttm.ntt_fwd(_torus_to_rns(ctx, acc_t), ctx.ntt)
    w_b = _omega_mont(ctx, (2 * N - b_t) % (2 * N))
    acc = mm.mont_mul(acc, w_b[:, None], p, pinv)
    a_t = _modswitch(ct.a, N)
    return acc, a_t


@partial(jax.tree_util.register_dataclass,
         data_fields=["a", "b"], meta_fields=["variance"])
@dataclasses.dataclass(frozen=True)
class NLwe:
    """Batched N-dimensional LWE samples under the TRLWE key — the sample-
    extracted blind-rotation output BEFORE the N→n keyswitch.  MUX combines
    two of these linearly and keyswitches once (reference
    host/tfhe/operator.cuh:688-812 does the OR combine pre-keyswitch)."""
    a: jnp.ndarray  # (B, N) uint32
    b: jnp.ndarray  # (B,) uint32
    variance: float = 0.0


def _sample_extract(ctx: TfheContext, acc_t):
    """Constant-coefficient sample extraction of the (B, 2, N) torus
    accumulator → ((B, N) a, (B,) b) N-LWE parts."""
    N = ctx.N
    a_poly = acc_t[:, 0, :]
    b_out = acc_t[:, 1, 0]
    idx = jnp.arange(N, dtype=jnp.int32)
    rolled = jnp.roll(a_poly[:, ::-1], 1, axis=-1)
    ext_a = jnp.where(idx[None, :] == 0, rolled, -rolled)
    return ext_a, b_out


def lwe_keyswitch(ctx: TfheContext, bk, s: NLwe) -> Ciphertext:
    """Base-4 N→n LWE keyswitch (reference tfhe_key_switching_kernel)."""
    B = s.a.shape[0]
    sh0 = 32 - ctx.ks_base_bit * ctx.ks_length
    u = s.a + (jnp.uint32(1) << (sh0 - 1))
    out_a = jnp.zeros((B, ctx.n), U32)
    out_b = s.b
    for t in range(ctx.ks_length):
        sh = 32 - (t + 1) * ctx.ks_base_bit
        dig = (u >> sh) & jnp.uint32(KS_BASE - 1)
        ka = bk.ksk_a[:, t]
        kb = bk.ksk_b[:, t]
        sel_a = jnp.take_along_axis(
            ka[None], dig[:, :, None, None].astype(jnp.int32), axis=2)[:, :, 0]
        sel_b = jnp.take_along_axis(
            kb[None], dig[:, :, None].astype(jnp.int32), axis=2)[:, :, 0]
        out_a = out_a - jnp.sum(sel_a, axis=1)
        out_b = out_b - jnp.sum(sel_b, axis=1)
    return Ciphertext(out_a, out_b,
                      variance=s.variance + keyswitch_variance(ctx))


def _boot_epilogue(ctx: TfheContext, bk, acc_t, B: int,
                   keyswitch: bool = True, unroll_factor: int = 1):
    """Sample extract at coefficient 0 (+ base-4 LWE keyswitch when
    keyswitch=True); acc_t is the final (B, 2, N) torus accumulator."""
    ext_a, b_out = _sample_extract(ctx, acc_t)
    s = NLwe(ext_a, b_out, variance=blind_rotate_variance(ctx, unroll_factor))
    if not keyswitch:
        return s
    return lwe_keyswitch(ctx, bk, s)


class _WeakIdCache:
    """Cache keyed on (object identity, tile) with weakref-guarded lookups.

    id()-keyed dicts alone are unsafe: a GC'd key whose address is reused
    would return a *stale* entry (silent wrong results) and entries never
    evict (~256 MB leak per TFHE key).  Here each entry stores a weakref to
    the keying object; a hit requires `ref() is obj` (a recycled address
    can never alias — the dead ref yields None), and a weakref.finalize
    callback evicts the entry the moment the keying object is collected."""

    def __init__(self):
        self._d = {}

    def get(self, obj, tile):
        ent = self._d.get((id(obj), tile))
        if ent is not None and ent[0]() is obj:
            return ent[1]
        return None

    def put(self, obj, tile, value):
        k = (id(obj), tile)
        self._d[k] = (weakref.ref(obj), value)
        weakref.finalize(obj, self._d.pop, k, None)
        return value


_FUSED_PREP = _WeakIdCache()   # ctx, Bt -> kernel-layout table dict
_FUSED_KEYS = _WeakIdCache()   # key arr, Bt -> batch-expanded key stream


def _fused_tabs(ctx, tile: int):
    from ..ops import tfhe_kernel as tk
    tabs = _FUSED_PREP.get(ctx, tile)
    if tabs is None:
        tabs = _FUSED_PREP.put(ctx, tile, tk.prep_tables(ctx, Bt=tile))
    return tabs


def _fused_key_stream(key_arr, tile: int, unrolled: bool):
    """Batch-expanded HBM key stream (~256 MB for STD128 at Bt=8), built once
    per (key, tile) OUTSIDE jit so the expansion isn't re-materialised per
    gate call.  Prefer compile_key()/FusedKey for long-lived processes —
    this cache exists for the convenience BootKey entry points."""
    from ..ops import tfhe_kernel as tk
    st = _FUSED_KEYS.get(key_arr, tile)
    if st is None:
        st = _FUSED_KEYS.put(key_arr, tile,
                             tk.prep_bk2(key_arr, Bt=tile) if unrolled
                             else tk.prep_bk(key_arr, Bt=tile))
    return st


def _pick_tile(B: int, tile) -> int:
    """Grid programs run sequentially on the one TensorCore, so wider lane
    tiles amortize per-step costs: 16 when the batch warrants it, 8 below."""
    if tile is not None:
        return tile
    return 16 if B >= 16 else 8


@partial(jax.tree_util.register_dataclass,
         data_fields=["stream", "ksk_a", "ksk_b", "tabs"],
         meta_fields=["tile", "unrolled"])
@dataclasses.dataclass(frozen=True)
class FusedKey:
    """Bootstrapping key pre-compiled for the fused Pallas chain: the
    batch-tile-expanded HBM key stream + kernel-layout tables, plus the LWE
    keyswitch key.  A pytree, so WHOLE circuits (gates, huint adders) jit
    end-to-end with the key as an argument — no per-round eager dispatch and
    no re-expansion inside traces (prep happens once, here).

    Build with compile_key(); every gate/bootstrap entry point accepts it
    anywhere a BootKey/BootKey2 is accepted."""
    stream: jnp.ndarray
    ksk_a: jnp.ndarray
    ksk_b: jnp.ndarray
    tabs: dict
    tile: int
    unrolled: bool


def compile_key(ctx: TfheContext, key, tile: int = 16) -> FusedKey:
    """Expand a BootKey/BootKey2 into a FusedKey for the fused TPU chain.
    tile=16 amortizes best for huint workloads; use 8 for latency-critical
    tiny batches (< 16 gates per call)."""
    from ..ops import tfhe_kernel as tk
    unrolled = isinstance(key, BootKey2)
    stream = (tk.prep_bk2(key.bk2, Bt=tile) if unrolled
              else tk.prep_bk(key.bk, Bt=tile))
    return FusedKey(stream=stream, ksk_a=key.ksk_a, ksk_b=key.ksk_b,
                    tabs=tk.prep_tables(ctx, Bt=tile), tile=tile,
                    unrolled=unrolled)


def bootstrap_fused(ctx: TfheContext, bk: BootKey, ct: Ciphertext,
                    tile=None, interpret: bool = False) -> Ciphertext:
    """bootstrap_raw with the n-step CMux chain fused into one Pallas TPU
    kernel (ops/tfhe_kernel.py).  Bit-identical to bootstrap_raw; the batch
    is padded to a multiple of `tile` (default: adaptive, see _pick_tile).

    Table packing and key-stream expansion read/build concrete device
    arrays, so they run eagerly here (cached per context/key) and the rest
    is one jitted core."""
    tile = _pick_tile(ct.a.shape[0], tile)
    tabs = _fused_tabs(ctx, tile)
    bk_stream = _fused_key_stream(bk.bk, tile, unrolled=False)
    return _bootstrap_fused_core(ctx, bk, bk_stream, ct, tabs, tile=tile,
                                 interpret=interpret)


def _unpad(out, B0: int):
    cls = type(out)
    return cls(out.a[:B0], out.b[:B0], variance=out.variance)


@partial(jax.jit, static_argnames=("tile", "interpret", "keyswitch"))
def _bootstrap_fused_core(ctx: TfheContext, bk: BootKey, bk_stream,
                          ct: Ciphertext, tabs, tile: int = 8,
                          interpret: bool = False, keyswitch: bool = True):
    from ..ops import tfhe_kernel as tk

    B0 = ct.a.shape[0]
    B = ((B0 + tile - 1) // tile) * tile
    if B != B0:
        pad = B - B0
        ct = Ciphertext(jnp.concatenate([ct.a, jnp.zeros((pad, ctx.n), U32)]),
                        jnp.concatenate([ct.b, jnp.zeros((pad,), U32)]),
                        variance=ct.variance)
    acc, a_t = _boot_prologue(ctx, ct)                # (B, 2, 2, N), (B, n)
    acc_k = tk.prep_acc(acc, tile)
    a_e = tk.prep_a(a_t, tile, 2 * ctx.N)
    out_k = tk.blind_rotate(acc_k, a_e, bk_stream, tabs,
                            n=ctx.n, Bt=tile, interpret=interpret)
    acc_ntt = tk.unprep_acc(out_k, B, tile)           # (B, 2, 2, N)
    acc_t = _rns_to_torus(ctx, nttm.ntt_inv(acc_ntt, ctx.ntt))
    out = _boot_epilogue(ctx, bk, acc_t, B, keyswitch=keyswitch)
    if B != B0:
        out = _unpad(out, B0)
    return out


@partial(jax.jit, static_argnames=("tile", "interpret", "keyswitch"))
def _bootstrap_fused2_core(ctx: TfheContext, bk2: BootKey2, bk_stream,
                           ct: Ciphertext, tabs, tile: int = 8,
                           interpret: bool = False, keyswitch: bool = True):
    from ..ops import tfhe_kernel as tk

    B0 = ct.a.shape[0]
    B = ((B0 + tile - 1) // tile) * tile
    if B != B0:
        pad = B - B0
        ct = Ciphertext(jnp.concatenate([ct.a, jnp.zeros((pad, ctx.n), U32)]),
                        jnp.concatenate([ct.b, jnp.zeros((pad,), U32)]),
                        variance=ct.variance)
    acc, a_t = _boot_prologue(ctx, ct)
    acc_k = tk.prep_acc(acc, tile)
    a_e = tk.prep_a(a_t, tile, 2 * ctx.N)
    out_k = tk.blind_rotate2(acc_k, a_e, bk_stream, tabs,
                             n=ctx.n, Bt=tile, interpret=interpret)
    acc_ntt = tk.unprep_acc(out_k, B, tile)
    acc_t = _rns_to_torus(ctx, nttm.ntt_inv(acc_ntt, ctx.ntt))
    out = _boot_epilogue(ctx, bk2, acc_t, B, keyswitch=keyswitch,
                         unroll_factor=4)
    if B != B0:
        out = _unpad(out, B0)
    return out


def bootstrap_fused2(ctx: TfheContext, bk2: BootKey2, ct: Ciphertext,
                     tile=None, interpret: bool = False) -> Ciphertext:
    """Key-unrolled gate bootstrap: n/2-step CMux chain over TGSW triples in
    one fused Pallas kernel (see BootKey2 / ops/tfhe_kernel._make_kernel2)."""
    tile = _pick_tile(ct.a.shape[0], tile)
    tabs = _fused_tabs(ctx, tile)
    bk_stream = _fused_key_stream(bk2.bk2, tile, unrolled=True)
    return _bootstrap_fused2_core(ctx, bk2, bk_stream, ct, tabs, tile=tile,
                                  interpret=interpret)


@partial(jax.jit, static_argnames=("keyswitch",))
def bootstrap_raw(ctx: TfheContext, bk: BootKey, ct: Ciphertext,
                  keyswitch: bool = True):
    """Blind rotation + sample extract + keyswitch for a batch of LWEs whose
    phase sign encodes the bit; returns fresh LWEs with payload ±mu.

    Reference analog: HELogicOperator<TFHE>::bootstrapping + key_switching
    (operator.cu:200-294), restructured TPU-first:
      * one fori_loop over the n CMux steps, everything batched over gates;
      * the accumulator lives in the RNS-NTT domain, the data-dependent
        rotation X^a_i is a product of precomputed bit-monomial tables
        (gather-free; TPU gathers were 5x the cost of everything else);
      * the accumulator's *integer* representative grows by one external
        product per step (<= 2^52), so every _RENORM steps it is pulled back
        to the torus (mod 2^32) — the CRT pair (~2^58) gives exact headroom.
    """
    B = ct.a.shape[0]
    N = ctx.N
    p = ctx.ntt.p[:, None]
    pinv = ctx.ntt.pinv[:, None]
    # test vector: all-mu constant polynomial row, rotated by X^{-b}
    testv = jnp.broadcast_to(MU, (B, N)).astype(U32)
    b_t = _modswitch(ct.b, N)                             # (B,)
    zero = jnp.zeros((B, 1, N), U32)
    acc_t = jnp.concatenate([zero, testv[:, None, :]], axis=1)    # (B,2,N)
    acc = nttm.ntt_fwd(_torus_to_rns(ctx, acc_t), ctx.ntt)        # (B,2,2,N)
    w_b = _omega_mont(ctx, (2 * N - b_t) % (2 * N))
    acc = mm.mont_mul(acc, w_b[:, None], p, pinv)
    a_t = _modswitch(ct.a, N)                             # (B, n)

    def renorm(acc):
        return nttm.ntt_fwd(
            _torus_to_rns(ctx, _rns_to_torus(ctx, nttm.ntt_inv(acc, ctx.ntt))),
            ctx.ntt)

    def outer(o, acc):
        for j in range(_RENORM):
            i = o * _RENORM + j
            w = _omega_mont(ctx, a_t[:, i] % (2 * N))     # (B, 2, N) mont
            rot = mm.mont_mul(acc, w[:, None], p, pinv)
            diff = mm.sub_mod(rot, acc, p)
            d_t = _rns_to_torus(ctx, nttm.ntt_inv(diff, ctx.ntt))
            ext = _external_product_ntt(ctx, bk.bk[i], d_t)
            acc = mm.add_mod(acc, ext, p)
        return renorm(acc)

    if ctx.n % _RENORM != 0:
        raise ValueError(
            f"TFHE lwe dimension n={ctx.n} must be a multiple of the CMux "
            f"renormalisation period {_RENORM}; tail steps would be dropped")
    acc = jax.lax.fori_loop(0, ctx.n // _RENORM, outer, acc)
    acc = _rns_to_torus(ctx, nttm.ntt_inv(acc, ctx.ntt))  # (B, 2, N) torus
    return _boot_epilogue(ctx, bk, acc, B, keyswitch=keyswitch)


# ------------------------------------------------------------------
# Gates (reference operator.cuh:53-812)
# ------------------------------------------------------------------

_BOOT_IMPL = "auto"  # "auto" | "fused" | "raw"


def set_bootstrap_impl(impl: str) -> None:
    """Select the gate-bootstrap backend: "fused" (one Pallas kernel for the
    whole CMux chain), "raw" (lax.fori_loop of XLA ops), or "auto" (fused
    compiled on TPU — measured 12.9 ms vs 91 ms per batch-8 on v5e — and raw
    on CPU, where the Pallas interpreter is slow)."""
    assert impl in ("auto", "fused", "raw"), impl
    global _BOOT_IMPL
    _BOOT_IMPL = impl


def _bootstrap(ctx, bk, ct: Ciphertext, keyswitch: bool = True):
    on_cpu = jax.default_backend() == "cpu"
    if isinstance(bk, FusedKey):
        # pre-compiled key: fully traceable (works inside callers' jit)
        core = _bootstrap_fused2_core if bk.unrolled else _bootstrap_fused_core
        return core(ctx, bk, bk.stream, ct, bk.tabs, tile=bk.tile,
                    interpret=on_cpu, keyswitch=keyswitch)
    if isinstance(bk, BootKey2):
        # key-unrolled chain exists only as the fused kernel; on CPU run it
        # through the Pallas interpreter (tests), on TPU compiled
        tile = _pick_tile(ct.a.shape[0], None)
        return _bootstrap_fused2_core(
            ctx, bk, _fused_key_stream(bk.bk2, tile, unrolled=True), ct,
            _fused_tabs(ctx, tile), tile=tile, interpret=on_cpu,
            keyswitch=keyswitch)
    impl = _BOOT_IMPL
    if impl == "auto":
        impl = "raw" if on_cpu else "fused"
    if impl == "fused":
        tile = _pick_tile(ct.a.shape[0], None)
        return _bootstrap_fused_core(
            ctx, bk, _fused_key_stream(bk.bk, tile, unrolled=False), ct,
            _fused_tabs(ctx, tile), tile=tile, keyswitch=keyswitch)
    return bootstrap_raw(ctx, bk, ct, keyswitch=keyswitch)


def NAND(ctx, bk, c1: Ciphertext, c2: Ciphertext) -> Ciphertext:
    pre = Ciphertext(-(c1.a + c2.a), MU - c1.b - c2.b,
                     variance=c1.variance + c2.variance)
    return _bootstrap(ctx, bk, pre)


def AND(ctx, bk, c1, c2) -> Ciphertext:
    pre = Ciphertext(c1.a + c2.a, c1.b + c2.b - MU,
                     variance=c1.variance + c2.variance)
    return _bootstrap(ctx, bk, pre)


def OR(ctx, bk, c1, c2) -> Ciphertext:
    pre = Ciphertext(c1.a + c2.a, c1.b + c2.b + MU,
                     variance=c1.variance + c2.variance)
    return _bootstrap(ctx, bk, pre)


def NOR(ctx, bk, c1, c2) -> Ciphertext:
    pre = Ciphertext(-(c1.a + c2.a), -(c1.b + c2.b) - MU,
                     variance=c1.variance + c2.variance)
    return _bootstrap(ctx, bk, pre)


def XOR(ctx, bk, c1, c2) -> Ciphertext:
    two = jnp.uint32(2)
    pre = Ciphertext(two * (c1.a + c2.a), two * (c1.b + c2.b) + two * MU,
                     variance=4 * (c1.variance + c2.variance))
    return _bootstrap(ctx, bk, pre)


def XNOR(ctx, bk, c1, c2) -> Ciphertext:
    two = jnp.uint32(2)
    pre = Ciphertext(-(two * (c1.a + c2.a)),
                     -(two * (c1.b + c2.b)) - two * MU,
                     variance=4 * (c1.variance + c2.variance))
    return _bootstrap(ctx, bk, pre)


def NOT(ctx, c1: Ciphertext) -> Ciphertext:
    """No bootstrap needed (reference operator.cuh:640)."""
    return Ciphertext(-c1.a, -c1.b, variance=c1.variance)


def MUX(ctx, bk, sel, c_true, c_false) -> Ciphertext:
    """sel ? c_true : c_false.

    Reference cost structure (operator.cuh:688-812): TWO bootstraps whose
    N-LWE outputs are combined linearly PRE-keyswitch (the two AND branches
    are mutually exclusive, so t + f + mu/8 is exact on fresh samples) and
    ONE final keyswitch — no third bootstrap.  TPU-first improvement: the
    two blind rotations are mutually independent, so they run as ONE
    batched 2B chain (same wall time as one bootstrap for small B)."""
    nsel = NOT(ctx, sel)
    pre = Ciphertext(
        jnp.concatenate([sel.a + c_true.a, nsel.a + c_false.a]),
        jnp.concatenate([sel.b + c_true.b - MU, nsel.b + c_false.b - MU]),
        variance=max(sel.variance + c_true.variance,
                     nsel.variance + c_false.variance))
    s = _bootstrap(ctx, bk, pre, keyswitch=False)         # NLwe, batch 2B
    B = sel.a.shape[0]
    comb = NLwe(s.a[:B] + s.a[B:], s.b[:B] + s.b[B:] + MU,
                variance=2 * s.variance)
    return lwe_keyswitch(ctx, bk, comb)


def print_parameters(ctx: TfheContext):
    """Reference HEContext::print_parameters analog (STD128 fixed set)."""
    print(f"/ TFHE parameters (STD128)\n"
          f"| LWE n: {ctx.n}   TRLWE N: {ctx.N} (k={ctx.k})\n"
          f"| TGSW: l={ctx.l}, bg_bit={ctx.bg_bit}\n"
          f"| keyswitch: base 2^{ctx.ks_base_bit}, length {ctx.ks_length}\n"
          f"| CRT NTT primes: {ctx.primes}\n"
          f"\\ sigmas: ks={SIGMA_KS:.3e}, bk={SIGMA_BK:.3e}")
