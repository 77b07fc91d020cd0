"""CKKS bootstrapping variants: Chebyshev-cosine EvalMod (v2), slim, bit and
gate bootstrapping.

Capability match for the reference's bootstrapping family
(src/lib/host/ckks/operator.cu:7147+ regular_bootstrapping_v2 with eval_mod,
slim_bootstrapping, bit_bootstrapping, gate_bootstrapping and the
{AND,OR,XOR,NAND,NOR,XNOR}_bootstrapping gates of ePrint 2024/767 —
SURVEY §2.4; scheme enums util/schemes.h:120-127), redesigned for TPU:

  * EvalMod v2 = Chebyshev interpolation of cos on the mod-raise interval,
    evaluated in the power basis with the BSGS engine (poly_eval.py,
    depth ceil(log2 d)+1), followed by r double-angle steps:
    cos(2^r·θ0) where θ0 = (2π·raw/q0 + φ - π/2)/2^r.  With φ=0 this yields
    sin(2π·raw/q0) — the modular reduction.  The reference's eval_mod
    Chebyshev path (operator.cu:4036-4673) is the same mathematics.
  * Bit/gate bootstrapping re-use the cosine engine with a gate-specific
    phase φ and an affine output map (1±2·cos)/3 etc., realized for free via
    scale metadata, negation and one add_plain (ePrint 2024/767: messages at
    scale q0/2 for bits, q0/3 for 2-input gates).
  * Slim ordering (StoC → mod-raise → CtoS → EvalMod) places the StoC pieces
    at the end of the modulus chain; piece levels are fixed at keygen.
  * Exit constants are absorbed into the *output scale metadata* instead of
    an extra multiplication (a TPU-functional simplification the reference
    achieves with fused kernels).
"""

from __future__ import annotations

import dataclasses
import math
from typing import List, Optional

import numpy as np
import jax

from ..utils import rng
from . import ckks, ckks_boot, poly_eval, ringkit
from .ckks import CkksContext, Ciphertext
from .ckks_boot import BootConfig, Piece, build_dft_pieces, _build_piece


@dataclasses.dataclass(frozen=True, eq=True)
class BootConfigV2:
    """Reference BootstrappingConfigV2{EncodingMatrixConfig, EvalModConfig}
    (util/util.cuh:77-174)."""
    cos_degree: int = 24        # Chebyshev degree for cos approximation
    double_angles: int = 5      # r: evaluate cos(θ/2^r), then double r times
    # R = 2π(K+1)/2^r must stay ≲ 3: the power-basis evaluation of cos(R·y)
    # is only well-conditioned for small R (monomial coefficients grow like
    # R^k/k!, amplifying ciphertext noise through cancellation).
    K: int = 12                 # mod-raise overflow bound ||I||_inf
    ctos_pieces: int = 2
    stoc_pieces: int = 2
    base_count: int = 1         # primes in the boot base Q0 (see BootConfig)

    @property
    def evalmod_depth(self) -> int:
        m = max(1, self.cos_degree.bit_length())   # 2^m > degree
        return m + 1 + self.double_angles

    @property
    def R(self) -> float:
        """Chebyshev half-interval: |θ0| ≤ 2π(K+1)/2^r."""
        return 2 * math.pi * (self.K + 1) / (1 << self.double_angles)


@dataclasses.dataclass
class BootKeysV2:
    gk: ringkit.GaloisKey
    rk: ringkit.KSKey
    cfg: BootConfigV2
    msg_scale: float
    variant: str                # 'regular' | 'slim' | 'bit' | 'gate'
    ctos_pieces: List[Piece]
    stoc_pieces: List[Piece]
    mult_i: tuple
    mult_neg_i: tuple
    cos_coeffs: np.ndarray      # power-basis coeffs of cos(R·y) on [-1,1]
    # sparse-secret switching (reference mod_up_from_q0 + switch keys,
    # ePrint 2020/1203): the main key stays dense; a low-hamming-weight
    # temporary key wraps the mod-raise so ||I||_inf stays small
    swk_to_sparse: Optional[ringkit.KSKey] = None
    swk_to_dense: Optional[ringkit.KSKey] = None

    @property
    def ctos_out_level(self) -> int:
        return len(self.ctos_pieces)


def _bk2_flatten(k: BootKeysV2):
    children = (k.gk, k.rk, tuple(k.ctos_pieces), tuple(k.stoc_pieces),
                k.mult_i, k.mult_neg_i, k.swk_to_sparse, k.swk_to_dense)
    aux = (k.cfg, k.msg_scale, k.variant, tuple(map(float, k.cos_coeffs)))
    return children, aux


def _bk2_unflatten(aux, children):
    cfg, msg_scale, variant, cos = aux
    gk, rk, ctos, stoc, mi, mni, sws, swd = children
    return BootKeysV2(gk=gk, rk=rk, cfg=cfg, msg_scale=msg_scale,
                      variant=variant, ctos_pieces=list(ctos),
                      stoc_pieces=list(stoc), mult_i=mi, mult_neg_i=mni,
                      cos_coeffs=np.asarray(cos), swk_to_sparse=sws,
                      swk_to_dense=swd)


jax.tree_util.register_pytree_node(BootKeysV2, _bk2_flatten, _bk2_unflatten)


def generate_bootstrap_keys_v2(ctx: CkksContext, key, sk: ringkit.SecretKey,
                               cfg: BootConfigV2 = None,
                               variant: str = "regular",
                               msg_scale: Optional[float] = None,
                               sparse_hw: Optional[int] = None,
                               less_key_mode: bool = False,
                               compress_keys: bool = False,
                               limb_align: int = 1,
                               inv_form: bool = False) -> BootKeysV2:
    """Key + matrix generation for the v2 family.  Piece placement:
      regular: CtoS at levels 0..p1-1, StoC after EvalMod.
      slim/bit/gate: StoC at the chain tail (ending at the last limb), CtoS
      at levels 0..p1-1 after the mod-raise; no trailing StoC."""
    cfg = cfg or BootConfigV2()
    n = ctx.n
    q0 = 1
    for qj in ctx.q_primes[:cfg.base_count]:
        q0 *= int(qj)
    if msg_scale is None:
        # bit/gate payloads are encoded at the ePrint 2024/767 scales; the
        # CtoS fold must be built against the actual input scale
        msg_scale = {"bit": q0 / 2.0, "gate": q0 / 3.0}.get(
            variant, ctx.default_scale)
    msg_scale = float(msg_scale)
    r = cfg.double_angles
    # t0 slots = f_fold*2*(raw coeff)/Δ must equal (2π·raw/q0)/(2^r·R)
    f_ctos = (2 * math.pi * msg_scale / ((1 << r) * q0 * cfg.R)) / 2

    ctos_mats = build_dft_pieces(n, cfg.ctos_pieces, True, f_ctos)
    p1 = len(ctos_mats)
    # the last CtoS piece renormalizes the working scale to default_scale so
    # EvalMod's power ladder is well-scaled even when msg_scale << q0
    ctos_pieces = [
        _build_piece(ctx, m, lvl, _encoder(ctx),
                     scale_mult=(ctx.default_scale / msg_scale
                                 if lvl == p1 - 1 else 1.0))
        for lvl, m in enumerate(ctos_mats)]

    stoc_pieces = []
    if variant == "regular":
        c_out = q0 / (2 * math.pi * msg_scale)
        stoc_mats = build_dft_pieces(n, cfg.stoc_pieces, False, c_out)
        lvl0 = p1 + cfg.evalmod_depth
        stoc_pieces = [_build_piece(ctx, m, lvl0 + i, _encoder(ctx))
                       for i, m in enumerate(stoc_mats)]
    else:
        stoc_mats = build_dft_pieces(n, cfg.stoc_pieces, False, 1.0)
        lvl0 = ctx.k - cfg.base_count - len(stoc_mats)
        assert lvl0 >= 0, "chain too short for slim StoC placement"
        stoc_pieces = [_build_piece(ctx, m, lvl0 + i, _encoder(ctx))
                       for i, m in enumerate(stoc_mats)]

    extra = {}
    if less_key_mode:
        # giants compose from the power-of-two chain (reference
        # less_key_mode, docs/bootstrapping.rst:23: -30% key memory,
        # +15-20% time), keyed at the shallowest piece level
        min_lvl = min(pc.level for pc in ctos_pieces + stoc_pieces)
        half = ctx.n // 2
        j = 1
        while j < half:
            extra[j] = min_lvl
            j *= 2
    gk, rk = ckks_boot.leveled_boot_keys(
        ctx, key, sk, ctos_pieces + stoc_pieces, aux_lvl=p1,
        compress_keys=compress_keys, extra_steps_lvl=extra,
        include_giants=not less_key_mode, limb_align=limb_align,
        inv_form=inv_form)
    swk_to_sparse = swk_to_dense = None
    if sparse_hw is not None:
        k_sp = rng.fold_in(key, 2)
        sk_sp = ckks.keygen_secret(ctx, k_sp, hamming_weight=sparse_hw)
        swk_to_sparse = ckks.keygen_switch(ctx, rng.fold_in(key, 3),
                                           sk, sk_sp)
        swk_to_dense = ckks.keygen_switch(ctx, rng.fold_in(key, 4),
                                          sk_sp, sk)
        assert cfg.K >= sparse_hw // 2 + 3, \
            "cfg.K must cover the sparse-key mod-raise overflow"
    cos_coeffs = poly_eval.cosine_approx_coeffs(cfg.R, cfg.cos_degree)
    return BootKeysV2(gk=gk, rk=rk, cfg=cfg, msg_scale=msg_scale,
                      variant=variant,
                      ctos_pieces=ctos_pieces, stoc_pieces=stoc_pieces,
                      mult_i=ckks.monomial_mult_tables(ctx, n // 2),
                      mult_neg_i=ckks.monomial_mult_tables(ctx, 2 * n - n // 2),
                      cos_coeffs=cos_coeffs,
                      swk_to_sparse=swk_to_sparse, swk_to_dense=swk_to_dense)


def _encoder(ctx):
    def batch_encode(vecs, level, scale):
        return ckks_boot.encode_diags_ntt_mont(ctx, vecs, level, scale)

    return batch_encode


# =========================================================================
# Cosine EvalMod engine
# =========================================================================

def eval_cos_engine(ctx: CkksContext, t: Ciphertext, keys: BootKeysV2,
                    phase: float) -> Ciphertext:
    """Given t = A/(2^r·R) with A = 2π·raw/q0 (the CtoS fold), return
    cos(A + phase): shift by phase/(2^r·R), Chebyshev-evaluate cos(R·y),
    then double-angle r times (reference eval_mod, operator.cu:4036)."""
    cfg = keys.cfg
    r = cfg.double_angles
    shift = phase / ((1 << r) * cfg.R)
    if abs(shift) > 1e-30:
        pt = ckks.encode_const(ctx, shift, t.scale, level=t.level)
        y = ckks.add_plain(ctx, t, pt)
    else:
        y = t
    c = poly_eval.eval_poly_bsgs(ctx, y, keys.cos_coeffs, keys.rk)
    for _ in range(r):
        sq = ckks.rescale(ctx, ckks.relinearize(
            ctx, ckks.multiply(ctx, c, c), keys.rk))
        two_sq = ckks.add(ctx, sq, sq)
        one = ckks.encode_const(ctx, 1.0, two_sq.scale, level=two_sq.level)
        c = ckks.sub_plain(ctx, two_sq, one)
    return c


def eval_mod_sin(ctx, t: Ciphertext, keys: BootKeysV2) -> Ciphertext:
    """Modular reduction: returns sin(2π·raw/q0) = cos(2π·raw/q0 − π/2)."""
    return eval_cos_engine(ctx, t, keys, phase=-math.pi / 2)


# =========================================================================
# Entry points
# =========================================================================

def regular_bootstrap_v2(ctx: CkksContext, ct: Ciphertext,
                         keys: BootKeysV2) -> Ciphertext:
    """Chebyshev-EvalMod regular bootstrapping (reference
    regular_bootstrapping_v2, operator.cu:7147).  With sparse switch keys
    the mod-raise happens under a low-hamming-weight temporary key
    (mod_up_from_q0 + switch keys, ePrint 2020/1203) so the dense production
    key never constrains K."""
    assert keys.variant == "regular"
    raised = _raise_maybe_sparse(ctx, ct, keys)
    t0, t1 = _coeff_to_slot(ctx, raised, keys)
    s0 = eval_mod_sin(ctx, t0, keys)
    s1 = eval_mod_sin(ctx, t1, keys)
    out = _slot_to_coeff(ctx, s0, s1, keys)
    return out


def _raise_maybe_sparse(ctx, m, keys: BootKeysV2):
    """mod-raise, optionally under the temporary sparse key."""
    if keys.swk_to_sparse is not None:
        m = ckks.switch_key(ctx, m, keys.swk_to_sparse)
    raised = ckks_boot.mod_raise(ctx, m, keys.cfg.base_count)
    if keys.swk_to_dense is not None:
        raised = ckks.switch_key(ctx, raised, keys.swk_to_dense)
    return raised


def slim_bootstrap(ctx: CkksContext, ct: Ciphertext,
                   keys: BootKeysV2) -> Ciphertext:
    """Slot-payload refresh: StoC at the chain tail, mod-raise, CtoS, EvalMod,
    recombine — output stays in slots (reference slim_bootstrapping).

    Precision note: slim's StoC produces coefficients equal to the slot
    values, so the sin(x)≈x modular-reduction error scales as
    (2π·msg_scale·|z|/q0)²/6 — encrypt the payload at msg_scale ≪ q0 (e.g.
    2^21 under a 29-bit q0) and pass the same msg_scale at keygen."""
    assert keys.variant == "slim"
    m = ct
    for piece in keys.stoc_pieces:
        m = ckks_boot.matvec_piece(ctx, m, piece, keys.gk)
    assert ctx.active(m.level) == keys.cfg.base_count, \
        "slim StoC must end on the boot base limbs"
    raised = _raise_maybe_sparse(ctx, m, keys)
    t0, t1 = _coeff_to_slot(ctx, raised, keys)
    s0 = eval_mod_sin(ctx, t0, keys)
    s1 = eval_mod_sin(ctx, t1, keys)
    out = ckks.add(ctx, s0, ckks.multiply_by_monomial(ctx, s1, keys.mult_i))
    # value = sin(2π·Δm/Q0) ≈ 2πΔ/Q0 · m: absorb the exit constant in scale
    q0 = 1
    for qj in ctx.q_primes[:keys.cfg.base_count]:
        q0 *= int(qj)
    out_scale = out.scale * 2 * math.pi * keys.msg_scale / q0
    return Ciphertext(out.c, out.size, out.level, out_scale)


def bit_bootstrap(ctx: CkksContext, ct: Ciphertext,
                  keys: BootKeysV2) -> Ciphertext:
    """Refresh a ciphertext whose slots hold bits encoded at scale q0/2
    (reference bit_bootstrapping, ePrint 2024/767): b = (1 − cos(2π·raw/q0))/2
    since raw = (q0/2)·b + q0·I."""
    assert keys.variant == "bit"
    m = ct
    for piece in keys.stoc_pieces:
        m = ckks_boot.matvec_piece(ctx, m, piece, keys.gk)
    raised = _raise_maybe_sparse(ctx, m, keys)
    t0, t1 = _coeff_to_slot(ctx, raised, keys)
    outs = []
    for t in (t0, t1):
        c = eval_cos_engine(ctx, t, keys, phase=0.0)          # cos(2π·raw/q0)
        outs.append(_affine(ctx, c, mul=-0.5, add=0.5))       # (1-cos)/2
    out = ckks.add(ctx, outs[0],
                   ckks.multiply_by_monomial(ctx, outs[1], keys.mult_i))
    return out


GATE_TABLE = {
    # gate: (phase φ so cos(A+φ)=1 exactly on the accepting sum, mul, add)
    # A = 2π(I + s/3), s = b1+b2; cos values are 1 (accept) or -1/2.
    "AND":  (-4 * math.pi / 3, 2 / 3, 1 / 3),
    "OR":   (0.0, -2 / 3, 1 / 3 + 1 / 3),   # 1 - (2cos+1)/3 = (2-2cos... )
    "XOR":  (-2 * math.pi / 3, 2 / 3, 1 / 3),
    "NAND": (-4 * math.pi / 3, -2 / 3, 1 - 1 / 3),
    "NOR":  (0.0, 2 / 3, 1 / 3),
    "XNOR": (-2 * math.pi / 3, -2 / 3, 1 - 1 / 3),
}


def gate_bootstrap(ctx: CkksContext, ct1: Ciphertext, ct2: Ciphertext,
                   gate: str, keys: BootKeysV2) -> Ciphertext:
    """Boolean gate with built-in refresh (reference gate_bootstrapping +
    {AND,...}_bootstrapping): inputs hold bits at scale q0/3 in slots;
    s = b1 + b2 ∈ {0,1,2}; the gate output is an affine map of
    cos(2π(I + s/3) + φ_gate)."""
    assert keys.variant == "gate"
    phase, mul, add = GATE_TABLE[gate.upper()]
    m = ckks.add(ctx, ct1, ct2)
    for piece in keys.stoc_pieces:
        m = ckks_boot.matvec_piece(ctx, m, piece, keys.gk)
    raised = _raise_maybe_sparse(ctx, m, keys)
    t0, t1 = _coeff_to_slot(ctx, raised, keys)
    outs = []
    for t in (t0, t1):
        c = eval_cos_engine(ctx, t, keys, phase=phase)
        outs.append(_affine(ctx, c, mul=mul, add=add))
    return ckks.add(ctx, outs[0],
                    ckks.multiply_by_monomial(ctx, outs[1], keys.mult_i))


def _affine(ctx, c: Ciphertext, mul: float, add: float) -> Ciphertext:
    """mul*c + add for free: scale metadata absorbs |mul|, negation handles
    the sign, one add_plain lands the constant."""
    out = c
    if mul < 0:
        out = ckks.negate(ctx, out)
    out = Ciphertext(out.c, out.size, out.level, out.scale / abs(mul))
    if abs(add) > 1e-30:
        pt = ckks.encode_const(ctx, add, out.scale, level=out.level)
        out = ckks.add_plain(ctx, out, pt)
    return out


def _coeff_to_slot(ctx, ct, keys: BootKeysV2):
    w = ct
    for piece in keys.ctos_pieces:
        w = ckks_boot.matvec_piece(ctx, w, piece, keys.gk)
    wc = ckks.conjugate(ctx, w, keys.gk)
    t0 = ckks.add(ctx, w, wc)
    u = ckks.multiply_by_monomial(ctx, w, keys.mult_neg_i)
    uc = ckks.conjugate(ctx, u, keys.gk)
    t1 = ckks.add(ctx, u, uc)
    return t0, t1


def _slot_to_coeff(ctx, s0, s1, keys: BootKeysV2):
    m = ckks.add(ctx, s0, ckks.multiply_by_monomial(ctx, s1, keys.mult_i))
    for piece in keys.stoc_pieces:
        m = ckks_boot.matvec_piece(ctx, m, piece, keys.gk)
    return m
