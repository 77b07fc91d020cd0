"""CKKS bootstrapping: mod-raise, factored CoeffToSlot/SlotToCoeff homomorphic
DFT with double-hoisted BSGS matrix-vector products, EvalMod via
scaled-exponential Taylor + repeated squaring; regular entry point (slim /
bit / gate variants build on these blocks in ckks_boot_ext.py).

Capability match for the reference's CKKS bootstrapping stack
(src/lib/host/ckks/operator.cu:3499-7127: mod_raise_kernel, Vandermonde
E-diagonal matrix pieces, multiply_matrix double-hoisting BSGS,
coeff_to_slot / slot_to_coeff, exp_scaled EvalMod, regular_bootstrapping —
SURVEY §2.4/§3.4), redesigned for TPU:

  * The homomorphic DFT is factored exactly like the reference's
    `EncodingMatrixConfig` pieces: the special FFT on the 5^j slot orbit is a
    product of log2(n/2) sparse butterfly stages (3 generalized diagonals
    each); consecutive stages are merged numerically (diagonal-dict
    composition) into `pieces` dense-enough factors of ~2^(stages/pieces)
    diagonals.  Bit-reversal is skipped on both sides — it cancels between
    CtoS and StoC because EvalMod is slot-wise (same trick as the reference's
    E_diagonal matrices).
  * Each piece is evaluated as a BSGS matvec with double hoisting: the RNS
    digit decomposition of the input is computed once (ops shared across all
    baby rotations), baby-rotated terms are accumulated P-scaled in the
    extended basis Q̃ (reference broadcast_scale_P_kernel +
    addition_pql_kernel), and the exact ÷P runs once per giant step.
  * Diagonal plaintexts are precomputed at key-generation time into
    NTT-domain Montgomery device arrays over Q̃ at the level where the piece
    runs (reference Vandermonde builder, operator.cu:5594-6580).
  * The conjugate-symmetry packing m_i = a_i + i·a_{i+n/2} halves both
    matvec dimensions; multiplication by ±i is a free NTT-domain pointwise
    multiply by X^(±n/2) (reference cipher_mult_by_i / div_by_i).
  * EvalMod entry constant 2πΔ/(2^r q0) folds into the CtoS piece diagonals
    and the exit constant -i/2 · q0/(2πΔ) into the StoC diagonals.
"""

from __future__ import annotations

import dataclasses
import hashlib
import math
import os
from functools import reduce
from typing import Dict, List, Sequence, Tuple

import numpy as np
import jax
import jax.numpy as jnp

from ..ops import modmath as mm
from ..ops import ntt as nttm
from ..ops import compose, polyops, rns
from ..utils import errors, rng
from . import ckks, ringkit
from .ckks import CkksContext, Ciphertext


@dataclasses.dataclass(frozen=True, eq=True)
class BootConfig:
    """Mirrors the reference BootstrappingConfig{CtoS_piece, StoC_piece,
    taylor_number, less_key_mode} (util/util.cuh:176-202)."""
    taylor_degree: int = 7
    exp_squarings: int = 5      # r: exp(theta/2^r) Taylor, then square r times
    ctos_pieces: int = 2        # reference CtoS_piece (2..5)
    stoc_pieces: int = 2        # reference StoC_piece (2..5)
    base_count: int = 1         # primes forming the boot base Q0 = q0..q_{bc-1}
    # base_count 2 is the <2^30-prime answer to the reference's 60-bit q0 /
    # 40-bit scale: Q0 = q0*q1 ~ 2^58 AND a composite message scale
    # Delta ~ 2^56 (msg_scale must be ~ prod of base_count scale primes, so
    # every EvalMod ct*ct rescales base_count times).  Q0/Delta stays ~4 (same
    # sine range as base_count=1) while the noise floor relative to the
    # message drops from 2^-28 to 2^-56 — the exit constant Q0/(2*pi*Delta)
    # no longer amplifies keyswitch/Taylor noise into the message.
    arcsin_order: int = 0       # 1: v - v^3/24 arcsine correction of the sine
    # With the noise floor at 2^-56 the residual error is the sine
    # linearisation itself, m - (Q0/2piD)*sin(2pi m/Q0) ~ x^3/6 on coefficient
    # magnitudes x = 2pi*coeff/Q0 (~3e-4 measured).  One arcsin series term
    # (asin s = s + s^3/6 + ...) on v = 2i*sin(theta) is w = v - v^3/24,
    # killing the x^3 term; residual drops to 3x^5/40 (~1e-6).  Costs
    # 2*base_count+1 levels (reference covers this regime with the Chebyshev
    # eval_mod path instead, operator.cu:4036).
    piece_depth: int = 1        # levels per CtoS/StoC piece (diagonal scale)
    # piece_depth=base_count encodes the DFT diagonals at the COMPOSITE
    # scale (~2^56) and rescales each matvec by that many primes: the
    # additive keyswitch/rounding noise of every rotation lands relative to
    # 2^56 instead of 2^28 before the 2^r EvalMod amplification — measured
    # floor 2.7e-4 -> sub-1e-5 (the <2^30-lane analog of the reference's
    # 45-bit working scale).  Costs (pieces * (depth-1) * 2) extra levels.


@dataclasses.dataclass(frozen=True)
class Piece:
    """One factored-DFT matvec: precomputed BSGS plaintext diagonals over Q̃
    at a fixed level.  giants: tuple of (giant_step g, babies tuple,
    pts (nb, ka+alpha, n) uint32 Montgomery NTT-domain).

    Registered as a pytree (pts arrays are leaves) so whole bootstrap
    pipelines can be jitted with keys passed as arguments."""
    level: int
    n1: int
    giants: Tuple[Tuple[int, Tuple[int, ...], jnp.ndarray], ...]
    pt_scale: float
    depth: int = 1    # levels consumed (diagonals at product of that many primes)


def _piece_flatten(p: Piece):
    pts = tuple(g[2] for g in p.giants)
    meta = (p.level, p.n1, tuple((g[0], g[1]) for g in p.giants), p.pt_scale,
            p.depth)
    return pts, meta


def _piece_unflatten(meta, pts):
    level, n1, gmeta, pt_scale, depth = meta
    giants = tuple((g, babies, pt) for (g, babies), pt in zip(gmeta, pts))
    return Piece(level=level, n1=n1, giants=giants, pt_scale=pt_scale,
                 depth=depth)


jax.tree_util.register_pytree_node(Piece, _piece_flatten, _piece_unflatten)


@dataclasses.dataclass
class BootKeys:
    gk: ringkit.GaloisKey
    rk: ringkit.KSKey
    cfg: BootConfig
    msg_scale: float
    ctos_pieces: List[Piece]
    stoc_pieces: List[Piece]
    mult_i: tuple               # X^(n/2) tables (slot-wise * i)
    mult_neg_i: tuple           # X^(-n/2) tables (slot-wise * -i)

    @property
    def out_level(self) -> int:
        last = self.stoc_pieces[-1]
        return last.level + last.depth


def _bk_flatten(k: BootKeys):
    children = (k.gk, k.rk, tuple(k.ctos_pieces), tuple(k.stoc_pieces),
                k.mult_i, k.mult_neg_i)
    aux = (k.cfg, k.msg_scale)
    return children, aux


def _bk_unflatten(aux, children):
    cfg, msg_scale = aux
    gk, rk, ctos, stoc, mi, mni = children
    return BootKeys(gk=gk, rk=rk, cfg=cfg, msg_scale=msg_scale,
                    ctos_pieces=list(ctos), stoc_pieces=list(stoc),
                    mult_i=mi, mult_neg_i=mni)


jax.tree_util.register_pytree_node(BootKeys, _bk_flatten, _bk_unflatten)


# =========================================================================
# Special-FFT stage factorization (numpy, host side)
# =========================================================================

def sf_stage_diags(n: int, length: int, inverse: bool) -> Dict[int, np.ndarray]:
    """Diagonal dict {offset: (n/2,) complex} of one special-FFT butterfly
    stage on the 5^j slot orbit (the reference's E_diagonal factor matrices,
    kernel/bootstrapping.cu E_diagonal_generate_kernel)."""
    half = n // 2
    M = 2 * n
    lenh = length // 2
    lenq = length * 4
    d: Dict[int, np.ndarray] = {}

    def add(off, pos, val):
        off %= half
        if off not in d:
            d[off] = np.zeros(half, np.complex128)
        d[off][pos] = val

    for i in range(0, half, length):
        for j in range(lenh):
            idx = pow(5, j, lenq) * (M // lenq) % M
            w = np.exp(2j * np.pi * idx / M)
            t0, t1 = i + j, i + j + lenh
            if not inverse:
                add(0, t0, 1.0)
                add(lenh, t0, w)
                add(0, t1, -w)
                add(-lenh, t1, 1.0)
            else:
                add(0, t0, 0.5)
                add(lenh, t0, 0.5)
                add(0, t1, -0.5 / w)
                add(-lenh, t1, 0.5 / w)
    return d


def compose_diags(A: Dict[int, np.ndarray], B: Dict[int, np.ndarray],
                  ns: int) -> Dict[int, np.ndarray]:
    """Diagonal dict of (apply B first, then A)."""
    C: Dict[int, np.ndarray] = {}
    for r, a in A.items():
        for s, b in B.items():
            off = (r + s) % ns
            C.setdefault(off, np.zeros(ns, np.complex128))
            C[off] += a * np.roll(b, -r)
    return {k: v for k, v in C.items() if np.max(np.abs(v)) > 1e-14}


def _dft_cache_path(n: int, num_pieces: int, inverse: bool, fold: complex):
    cache_dir = os.environ.get("HEONGPU_BOOTCACHE", "")
    if not cache_dir:
        return None
    key = hashlib.sha1(repr((n, num_pieces, bool(inverse),
                             complex(fold))).encode()).hexdigest()[:20]
    return os.path.join(cache_dir, f"dft_{key}.npz")


def build_dft_pieces(n: int, num_pieces: int, inverse: bool,
                     fold: complex) -> List[Dict[int, np.ndarray]]:
    """Group the special-FFT stages into `num_pieces` merged factors, in
    application order, with `fold` distributed evenly across pieces.

    CtoS uses inverse=True (stages S_half^-1 .. S_2^-1); StoC inverse=False
    (S_2 .. S_half).  Bit-reversal is skipped on both sides (cancels).

    The composed diagonals only depend on (n, num_pieces, inverse, fold); at
    N=2^16 composing them costs minutes of host numpy, so set
    HEONGPU_BOOTCACHE=<dir> to memoize them on disk (analog of the reference
    building E_diagonal factors once per context, operator.cu:5594)."""
    path = _dft_cache_path(n, num_pieces, inverse, fold)
    if path is not None and os.path.exists(path):
        with np.load(path) as zf:
            npieces = int(zf["num_pieces"])
            return [{int(off): zf[f"v{i}_{off}"]
                     for off in zf[f"offs{i}"]} for i in range(npieces)]
    half = n // 2
    lens = [2]
    while lens[-1] < half:
        lens.append(lens[-1] * 2)
    if inverse:
        applied = [sf_stage_diags(n, L, True) for L in reversed(lens)]
    else:
        applied = [sf_stage_diags(n, L, False) for L in lens]
    num_pieces = min(num_pieces, len(applied))
    chunks = np.array_split(np.arange(len(applied)), num_pieces)
    per_piece = fold ** (1.0 / num_pieces)
    pieces = []
    for ch in chunks:
        mat = applied[ch[0]]
        for i in ch[1:]:
            mat = compose_diags(applied[i], mat, half)
        pieces.append({k: v * per_piece for k, v in mat.items()})
    if path is not None:
        os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
        payload = {"num_pieces": np.int64(len(pieces))}
        for i, pc in enumerate(pieces):
            payload[f"offs{i}"] = np.array(sorted(pc), np.int64)
            for off, v in pc.items():
                payload[f"v{i}_{off}"] = v
        np.savez(path + ".tmp", **payload)
        os.replace(path + ".tmp.npz", path)
    return pieces


def _bsgs_split(offsets: Sequence[int], ns: int) -> Tuple[int, Dict]:
    """Pick n1 minimizing (#babies + 2*#giants); return giant->babies map."""
    best = None
    for bits in range(0, ns.bit_length()):
        n1 = 1 << bits
        babies = {r % n1 for r in offsets}
        giants = {(r // n1) * n1 for r in offsets}
        cost = len(babies) + 2 * len(giants)
        if best is None or cost < best[0]:
            best = (cost, n1)
    n1 = best[1]
    groups: Dict[int, List[int]] = {}
    for r in sorted(offsets):
        groups.setdefault((r // n1) * n1, []).append(r % n1)
    return n1, groups


# =========================================================================
# Key / plaintext generation
# =========================================================================

def encode_diags_qtilde(ctx: CkksContext, vecs, level: int,
                        scale: float) -> jnp.ndarray:
    """Batch-encode slot vectors over the extended basis Q̃ (active Q limbs
    + P) on device: df64 special FFT + exact RNS reduction
    (ops/sfft.py/compose.py; replaces the reference's GPU-FFT + compose
    kernels, src/lib/host/ckks/encoder.cu:103-220)."""
    ka = ctx.active(level)
    limbs = tuple(ctx.q_primes[:ka]) + tuple(ctx.p_primes)
    return ckks.encode_batch_rns(ctx.n, np.stack(vecs), limbs, scale)


@jax.jit
def _ntt_mont_qtilde(res, level_tables):
    tb, base = level_tables
    p, pinv, r2, *_ = base.bview()
    return mm.to_mont(nttm.ntt_fwd(res, tb), p, pinv, r2)


def encode_diags_ntt_mont(ctx: CkksContext, vecs, level: int, scale: float):
    """Full diagonal-plaintext build (encode + NTT + Montgomery) over Q̃,
    CHUNKED with a host sync per chunk.

    The eager composition of these stages queues every intermediate of
    every op asynchronously: one 511-diagonal StoC piece at N=2^16 queued
    tens of GiB of NTT temporaries and OOM'd a 16 GiB chip.  Jitting the
    NTT+Montgomery tail gives XLA-planned buffers, and the per-chunk
    readback bounds how many chunks' workspaces can ever be live."""
    chunk = max(1, (1 << 22) // ctx.n)      # ~64 vectors at N=2^16
    tables = (ctx.ntt_qp_at(level), ctx.base_qp_at(level))
    if len(vecs) <= chunk:
        return _ntt_mont_qtilde(
            encode_diags_qtilde(ctx, vecs, level, scale), tables)
    # fill a preallocated table with a DONATED dynamic_update_slice per
    # chunk: peak HBM = table + one chunk's workspace (a list + concatenate
    # would hold every chunk AND the concatenated copy simultaneously,
    # ~2x the table — which is exactly the N=2^16 StoC OOM regime)
    first = _ntt_mont_qtilde(
        encode_diags_qtilde(ctx, vecs[:chunk], level, scale), tables)
    buf = jnp.zeros((len(vecs),) + first.shape[1:], first.dtype)
    fill = jax.jit(lambda b, c, i: jax.lax.dynamic_update_slice(
        b, c, (i,) + (0,) * (b.ndim - 1)), donate_argnums=(0,))
    buf = fill(buf, first, 0)
    for i in range(chunk, len(vecs), chunk):
        res = encode_diags_qtilde(ctx, vecs[i: i + chunk], level, scale)
        out = _ntt_mont_qtilde(res, tables)
        buf = fill(buf, out, i)
        np.asarray(jax.device_get(buf[0, 0, :1]))   # bound the async queue
    return buf


def _build_piece(ctx: CkksContext, diags: Dict[int, np.ndarray], level: int,
                 batch_encode, scale_mult: float = 1.0,
                 depth: int = 1) -> Piece:
    """scale_mult != 1 renormalizes the ciphertext scale through this piece:
    output scale = input scale * scale_mult (the plaintext encoding scale is
    a free knob; the rescale divides by exactly the last `depth` primes)."""
    ns = ctx.n // 2
    ka = ctx.active(level)
    scale = scale_mult
    for j in range(depth):
        scale *= float(ctx.q_primes[ka - 1 - j])
    n1, groups = _bsgs_split(list(diags), ns)
    # encode every diagonal of the piece in ONE device call (a single NTT
    # shape per piece — avoids one XLA compilation per giant group)
    order = []
    vecs = []
    for g, babies in groups.items():
        for b in babies:
            order.append((g, b))
            vecs.append(np.roll(diags[(g + b) % ns], g))
    pts_all = batch_encode(vecs, level, scale)
    giants = []
    idx = 0
    for g, babies in groups.items():
        nb = len(babies)
        giants.append((g, tuple(babies), pts_all[idx: idx + nb]))
        idx += nb
    return Piece(level=level, n1=n1, giants=tuple(giants), pt_scale=scale,
                 depth=depth)


def leveled_boot_keys(ctx, key, sk, pieces, aux_lvl: int,
                      compress_keys: bool, extra_steps_lvl: dict = None,
                      include_giants: bool = True, limb_align: int = 1,
                      inv_form: bool = False):
    """Galois + relin keys for a bootstrap pipeline, each rotation step's key
    GENERATED AT ITS SHALLOWEST USE LEVEL (ckks.keygen_galois(level=)):
    StoC steps live at deep levels (few active limbs), so their keys are
    ~20x smaller than full-depth ones — this is what fits the N=2^16
    precision config's key set in one chip's HBM.  conj + relin are
    generated at aux_lvl (their first use).  compress_keys additionally
    stores only the k0 halves (a regenerated from seeds per use)."""
    step_lvl = dict(extra_steps_lvl or {})
    for pc in pieces:
        for g, babies, _ in pc.giants:
            for b in babies:
                if b:
                    step_lvl[b] = min(step_lvl.get(b, 1 << 30), pc.level)
            if g and include_giants:
                step_lvl[g] = min(step_lvl.get(g, 1 << 30), pc.level)
    def align(l):
        """Deepest level <= l whose key limb extent (active + specials)
        divides limb_align, so the key shards evenly on a limb mesh of
        that size (costs <= limb_align-1 extra limbs per key)."""
        while l > 0 and (ctx.active(l) + len(ctx.p_primes)) % limb_align:
            l -= 1
        return l

    if limb_align > 1:
        step_lvl = {s: align(l) for s, l in step_lvl.items()}
        aux_lvl = align(aux_lvl)
    by_level = {}
    for s, l in step_lvl.items():
        by_level.setdefault(l, []).append(s)

    seed0 = _compress_seed(key) if compress_keys else None
    gk_all = {}
    # Seed-range layout (seed0 < 2^31; PRNG seeds are 63-bit): level group i
    # owns [seed0 + i*2^34, +2^34) (keygen_galois consumes a_seed + j per
    # elt, j < n < 2^34), conj owns seed0 + 2^43, relin seed0 + 2^44 — the
    # ranges provably cannot overlap, so no two keys with different targets
    # ever share a uniform half (the old <<12 strides collided at i=128).
    assert len(by_level) < 512, "level-group seed range exhausted"
    for i, l in enumerate(sorted(by_level)):
        gk_l = ckks.keygen_galois(
            ctx, rng.fold_in(key, 100 + i), sk, steps=sorted(by_level[l]),
            level=l, include_conj=False,
            a_seed=None if seed0 is None else seed0 + (i << 34),
            store_a=not compress_keys, inv_form=inv_form)
        gk_all.update(gk_l.keys)
    gk_c = ckks.keygen_galois(
        ctx, rng.fold_in(key, 99), sk, steps=[], level=aux_lvl,
        include_conj=True,
        a_seed=None if seed0 is None else seed0 + (1 << 43),
        store_a=not compress_keys, inv_form=inv_form)
    gk_all["conj"] = gk_c.keys["conj"]
    gk = ringkit.GaloisKey(gk_all)
    rk = ckks.keygen_relin(ctx, rng.fold_in(key, 1), sk, level=aux_lvl,
                           a_seed=None if seed0 is None else seed0 + (1 << 44))
    if compress_keys:
        rk = ringkit.strip_seeded(rk)
    return gk, rk


def _compress_seed(key) -> int:
    """Deterministic public seed for seed-expanded key sets, derived from the
    keygen PRNG key (a DRBG draws it from its own stream)."""
    if rng.is_drbg(key):
        return int(key.bits64(1)[0] >> 33)
    # pure host derivation from the key's raw words (an 8-byte fetch; the
    # old device randint forced a full device sync + compile inside keygen,
    # which turned async OOMs into mid-keygen crashes)
    kd = np.asarray(jax.random.key_data(key)).ravel()
    return int((int(kd[-1]) * 0x9e3779b1 ^ int(kd[0])) & (2 ** 31 - 1))


def generate_bootstrap_keys(ctx: CkksContext, key, sk: ringkit.SecretKey,
                            cfg: BootConfig = None,
                            msg_scale: float = None,
                            compress_keys: bool = False,
                            limb_align: int = 1,
                            inv_form: bool = False) -> BootKeys:
    """Rotation/conj/relin keys + factored-DFT plaintext tables with the
    EvalMod constants folded in (reference Vandermonde builder + galois
    key-index generation, operator.cu:5594-6580).

    compress_keys=True stores the Galois/relin keys seed-expanded (uniform
    halves dropped, regenerated on device per use): halves the resident HBM
    of the key set, which is what bounds the deep-chain N=2^16 precision
    config on a 16 GB chip (reference common-seed key storage,
    host/bfv/publickey.cuh:324, applied at eval time rather than only for
    serialization)."""
    cfg = cfg or BootConfig()
    if msg_scale is None:
        # composite base needs a composite scale (see BootConfig.base_count)
        msg_scale = float(ctx.default_scale) ** cfg.base_count
    msg_scale = float(msg_scale)
    n = ctx.n
    q0 = 1
    for qj in ctx.q_primes[:cfg.base_count]:
        q0 *= int(qj)
    c_in = 2 * math.pi * msg_scale / ((1 << cfg.exp_squarings) * q0)
    c_out = (-0.5j) * q0 / (2 * math.pi * msg_scale)

    ctos_mats = build_dft_pieces(n, cfg.ctos_pieces, True, c_in / 2)
    stoc_mats = build_dft_pieces(n, cfg.stoc_pieces, False, c_out)
    p1 = len(ctos_mats)
    # EvalMod depth: bc levels for the leading multiply_plain (bc-wide so
    # composite-pair prime alignment holds, see eval_exp_sin._next_primes),
    # base_count per Horner ct*ct step and per squaring, 3*bc for arcsine
    bc = cfg.base_count
    pd = cfg.piece_depth
    stoc_level0 = (p1 * pd + bc + (cfg.taylor_degree - 1) * bc
                   + cfg.exp_squarings * bc
                   + (3 * bc if cfg.arcsin_order else 0))

    def batch_encode(vecs, level, scale):
        return encode_diags_ntt_mont(ctx, vecs, level, scale)

    # the full pipeline consumes stoc_level0 + stoc_pieces*pd levels and must
    # leave `base_count` limbs for the final decrypt-capable ciphertext
    need = stoc_level0 + len(stoc_mats) * pd + bc
    if ctx.k < need:
        raise errors.ParameterError(
            f"bootstrap config needs a {need}-prime Q chain "
            f"(CtoS {p1}x{pd} + EvalMod {stoc_level0 - p1 * pd} + "
            f"StoC {len(stoc_mats)}x{pd} + {bc} base limb(s)); "
            f"context has {ctx.k}")

    ctos_pieces = [_build_piece(ctx, m, i * pd, batch_encode, depth=pd)
                   for i, m in enumerate(ctos_mats)]
    stoc_pieces = [_build_piece(ctx, m, stoc_level0 + i * pd, batch_encode,
                                depth=pd)
                   for i, m in enumerate(stoc_mats)]

    # conj is first used at ctos_finish (level p1*pd); relin at EvalMod
    gk, rk = leveled_boot_keys(ctx, key, sk, ctos_pieces + stoc_pieces,
                               aux_lvl=p1 * pd, compress_keys=compress_keys,
                               limb_align=limb_align, inv_form=inv_form)
    return BootKeys(gk=gk, rk=rk, cfg=cfg, msg_scale=msg_scale,
                    ctos_pieces=ctos_pieces, stoc_pieces=stoc_pieces,
                    mult_i=ckks.monomial_mult_tables(ctx, n // 2),
                    mult_neg_i=ckks.monomial_mult_tables(ctx, 2 * n - n // 2))


# =========================================================================
# Building blocks
# =========================================================================

def mod_raise(ctx: CkksContext, ct: Ciphertext,
              base_count: int = 1) -> Ciphertext:
    """Lift a base_count-limb ciphertext to the full chain (adds Q0*I(X));
    reference mod_raise_kernel.  base_count >= 2 composes the centered
    [x]_{Q0} residue exactly on device (ops/compose.mod_primes_centered)
    instead of the reference's big-int compose."""
    assert ctx.active(ct.level) == base_count, (
        f"mod_raise expects {base_count} remaining limb(s), "
        f"got {ctx.active(ct.level)}")
    tbb = ctx.ntt_qp.slice_limbs(0, base_count)
    coeff = nttm.ntt_inv(ct.c, tbb)
    if base_count == 1:
        q0 = jnp.uint32(int(ctx.q_primes[0]))
        v = coeff[:, 0, :]
        neg = v > (q0 >> 1)
        mag = jnp.where(neg, q0 - v, v)
        full = []
        for qj in ctx.q_primes:
            pj = jnp.uint32(int(qj))
            muj = jnp.uint32(mm.barrett_mu(int(qj)))
            mj = mm.barrett32(mag, pj, muj)
            full.append(jnp.where(neg, mm.neg_mod(mj, pj), mj))
        raised = jnp.stack(full, axis=1)
    else:
        base_primes = tuple(int(q) for q in ctx.q_primes[:base_count])
        tabs = ckks._compose_tabs(base_primes)
        raised = compose.mod_primes_centered(
            coeff, base_primes, tuple(int(q) for q in ctx.q_primes), tabs)
    return Ciphertext(nttm.ntt_fwd(raised, ctx.ntt_q(0)), 2, 0, ct.scale)


def rotate_exact(ctx, ct, gk: ringkit.GaloisKey, step: int):
    if step % (ctx.n // 2) == 0:
        return ct
    g = polyops.steps_to_galois_elt(step, ctx.n)
    if g in gk.keys:
        return ckks.apply_galois(ctx, ct, gk.keys[g])
    # less-key mode: compose from the power-of-two chain (reference
    # less_key_mode: -30% Galois-key memory for extra keyswitches)
    return ckks.rotate(ctx, ct, gk, step)


def matvec_piece(ctx: CkksContext, ct: Ciphertext, piece: Piece,
                 gk: ringkit.GaloisKey) -> Ciphertext:
    """Double-hoisted BSGS matvec: one digit decomposition for all babies,
    P-scaled accumulation in Q̃ per giant, one ÷P per giant, one rescale
    (reference multiply_matrix / fast_single_hoisting_rotation,
    operator.cu:2803/4674)."""
    if ct.level < piece.level:
        ct = ckks.mod_drop(ctx, ct, piece.level - ct.level)
    lvl = ct.level
    assert lvl == piece.level, f"piece expects level {piece.level}, got {lvl}"
    ka = ctx.active(lvl)
    base_qp = ctx.base_qp_at(lvl)
    d_ntt = ckks.hoist(ctx, ct)

    all_babies = sorted({b for _, babies, _ in piece.giants for b in babies})
    reps = {}
    pc0 = ckks.p_scale_to_qtilde(ctx, ct.c[0], lvl)   # shared by all babies
    for b in all_babies:
        if b == 0:
            reps[0] = (pc0, ckks.p_scale_to_qtilde(ctx, ct.c[1], lvl))
        else:
            gk1 = gk.keys[polyops.steps_to_galois_elt(b, ctx.n)]
            reps[b] = ckks.rotate_hoisted_qtilde(ctx, d_ntt, gk1, pc0, lvl)

    p, pinv, _, mu, r1, r1sh = base_qp.bview()
    out = None
    for g, babies, pts in piece.giants:
        s0 = jnp.stack([reps[b][0] for b in babies])
        s1 = jnp.stack([reps[b][1] for b in babies])
        t0 = mm.mont_mul(s0, pts, p[None], pinv[None])
        t1 = mm.mont_mul(s1, pts, p[None], pinv[None])
        hi0, lo0 = rns.sum_u32_axis64(t0, axis=0)
        hi1, lo1 = rns.sum_u32_axis64(t1, axis=0)
        acc0 = mm.reduce64(hi0, lo0, p, mu, r1, r1sh)
        acc1 = mm.reduce64(hi1, lo1, p, mu, r1, r1sh)
        pair = ckks.ks_finish_at(ctx, jnp.stack([acc0, acc1]), lvl)
        ct_g = Ciphertext(pair, 2, lvl, ct.scale * piece.pt_scale)
        if g:
            ct_g = rotate_exact(ctx, ct_g, gk, g)
        out = ct_g if out is None else ckks.add(ctx, out, ct_g)
    for _ in range(piece.depth):
        out = ckks.rescale(ctx, out)
    return out


def _const_pt(ctx, ct, value, scale):
    # exact at any scale (the drifted EvalMod working scale exceeds the
    # float encode path's mantissa — see ckks.encode_const)
    return ckks.encode_const(ctx, value, scale, level=ct.level)


def _mul_ct(ctx, a, b, rk, times: int = 1) -> Ciphertext:
    out = ckks.relinearize(ctx, ckks.multiply(ctx, a, b), rk)
    for _ in range(times):
        out = ckks.rescale(ctx, out)
    return out


def eval_exp_sin(ctx, x: Ciphertext, keys: BootKeys) -> Ciphertext:
    """x holds theta/2^r slots (entry constant folded into CtoS): compute
    u = exp(i*x) by Horner Taylor, square r times, return u - conj(u)
    (the -i/2*q0/(2*pi*Delta) exit constant lives in the StoC diagonals).
    Reference exp_scaled / exp_taylor_approximation (operator.cu:4036)."""
    d = keys.cfg.taylor_degree
    r = keys.cfg.exp_squarings
    bc = keys.cfg.base_count
    coefs = [(1j ** j) / math.factorial(j) for j in range(d + 1)]

    def _next_primes(ct):
        """Product of the next bc primes to be consumed: plain-constant
        rescales stay bc-wide so composite-pair prime alignment holds (the
        scale primes are ordered in complementary pairs; a lone 1-prime
        rescale would shift every later pair off its partner and reopen
        the 2^r-amplified scale drift)."""
        ka = ctx.active(ct.level)
        s = 1.0
        for j in range(bc):
            s *= float(ctx.q_primes[ka - 1 - j])
        return s

    acc = ckks.multiply_plain(ctx, x, _const_pt(ctx, x, coefs[d],
                                                _next_primes(x)))
    for _ in range(bc):
        acc = ckks.rescale(ctx, acc)
    acc = ckks.add_plain(ctx, acc, _const_pt(ctx, acc, coefs[d - 1], acc.scale))
    for j in range(d - 2, -1, -1):
        xj = ckks.mod_drop(ctx, x, acc.level - x.level)
        acc = _mul_ct(ctx, acc, xj, keys.rk, times=bc)
        acc = ckks.add_plain(ctx, acc, _const_pt(ctx, acc, coefs[j], acc.scale))
    for _ in range(r):
        acc = _mul_ct(ctx, acc, acc, keys.rk, times=bc)
    uc = ckks.conjugate(ctx, acc, keys.gk)
    v = ckks.sub(ctx, acc, uc)           # 2i*sin(theta)
    if keys.cfg.arcsin_order:
        # w = v*(1 - v^2/24): the s^3/6 arcsine term (see BootConfig)
        v2 = _mul_ct(ctx, v, v, keys.rk, times=bc)
        inner = ckks.multiply_plain(
            ctx, v2, _const_pt(ctx, v2, -1.0 / 24.0, _next_primes(v2)))
        for _ in range(bc):
            inner = ckks.rescale(ctx, inner)
        inner = ckks.add_plain(ctx, inner,
                               _const_pt(ctx, inner, 1.0, inner.scale))
        vd = ckks.mod_drop(ctx, v, inner.level - v.level)
        v = _mul_ct(ctx, vd, inner, keys.rk, times=bc)
    return v


def ctos_finish(ctx, w: Ciphertext, keys: BootKeys):
    """Tail of coeff_to_slot after the factored-DFT pieces: t0 = w + conj(w),
    t1 = u + conj(u) with u = -i*w (factored out so drivers can jit the
    pipeline piece-by-piece — one giant XLA program per phase is fragile to
    compile at N=2^16)."""
    wc = ckks.conjugate(ctx, w, keys.gk)
    t0 = ckks.add(ctx, w, wc)
    u = ckks.multiply_by_monomial(ctx, w, keys.mult_neg_i)
    uc = ckks.conjugate(ctx, u, keys.gk)
    t1 = ckks.add(ctx, u, uc)
    return t0, t1


def coeff_to_slot(ctx, ct: Ciphertext, keys: BootKeys):
    """(reference coeff_to_slot, operator.cu:3499) — returns t0 (low coeffs in
    slots) and t1 (high coeffs), both pre-scaled by the EvalMod entry
    constant.  Shares one factored-DFT pass: w = pieces(ct), then
    t0 = w + conj(w), t1 = u + conj(u) with u = -i*w."""
    w = ct
    for piece in keys.ctos_pieces:
        w = matvec_piece(ctx, w, piece, keys.gk)
    return ctos_finish(ctx, w, keys)


def stoc_entry(ctx, s0: Ciphertext, s1: Ciphertext, keys: BootKeys):
    """Head of slot_to_coeff before the factored-DFT pieces: m = s0 + i*s1."""
    return ckks.add(ctx, s0, ckks.multiply_by_monomial(ctx, s1, keys.mult_i))


def slot_to_coeff(ctx, s0: Ciphertext, s1: Ciphertext, keys: BootKeys):
    """m = s0 + i*s1, then the forward factored DFT (reference slot_to_coeff,
    operator.cu:3740)."""
    m = stoc_entry(ctx, s0, s1, keys)
    for piece in keys.stoc_pieces:
        m = matvec_piece(ctx, m, piece, keys.gk)
    return m


# =========================================================================
# Entry points
# =========================================================================

def regular_bootstrap(ctx: CkksContext, ct: Ciphertext, keys: BootKeys) -> Ciphertext:
    """Input: coefficient-encoded message at the last level (1 limb).
    Output: same message at a fresh low depth
    (reference regular_bootstrapping, operator.cu:7003)."""
    raised = mod_raise(ctx, ct, keys.cfg.base_count)
    t0, t1 = coeff_to_slot(ctx, raised, keys)
    s0 = eval_exp_sin(ctx, t0, keys)
    s1 = eval_exp_sin(ctx, t1, keys)
    # the pipeline's constants are folded so the output *value* equals the
    # input message exactly; the drifted scale metadata stays authoritative.
    return slot_to_coeff(ctx, s0, s1, keys)
