"""Shared RNS-ring key machinery used by both BFV and CKKS.

Key material layout (TPU-first design, diverges from the reference's
per-scheme duplicated kernels in kernel/keygeneration.cu / switchkey.cu):

  * secret key: ternary coeffs + NTT-domain Montgomery form over Q·P
  * public key / keyswitch keys: NTT domain over Q·P, Montgomery form, so the
    hot keyswitch MAC is a single-REDC mont_mul + exact 64-bit tree reduction
  * Method-I gadget: g_i = P * (Q/q_i) * ((Q/q_i)^{-1} mod q_i)  ≡  P·δ_i in
    RNS — the key's i-th digit carries P·target on limb i only, which stays
    valid for any *prefix* sub-basis, giving leveled CKKS keyswitching from
    the same key object (reference: relinkey_gen_kernel + leveled variants).
"""

from __future__ import annotations

import dataclasses
from functools import partial, reduce
from typing import Optional

import numpy as np
import jax
import jax.numpy as jnp

from ..ops import modmath as mm
from ..ops import ntt as nttm
from ..ops import polyops, rns
from ..utils import rng

_prod = lambda xs: reduce(lambda a, b: a * b, xs, 1)


@partial(jax.tree_util.register_dataclass,
         data_fields=["s_coeff", "s_ntt_mont_qp"], meta_fields=["hamming_weight"])
@dataclasses.dataclass(frozen=True)
class SecretKey:
    s_coeff: jnp.ndarray        # (n,) int32 in {-1,0,1}
    s_ntt_mont_qp: jnp.ndarray  # (k+p, n) NTT domain, Montgomery form
    hamming_weight: int


@partial(jax.tree_util.register_dataclass,
         data_fields=["pk0", "pk1"], meta_fields=["a_seed"])
@dataclasses.dataclass(frozen=True)
class PublicKey:
    """pk1 (the uniform `a` half) is regenerable from `a_seed` when the key
    was generated seed-expanded (reference MultipartyPublickey common-seed
    storage, host/bfv/publickey.cuh:324): strip_seeded drops it for
    serialization, expand_seeded rebuilds it."""
    pk0: jnp.ndarray  # (k+p, n) NTT, Montgomery form
    pk1: jnp.ndarray
    a_seed: Optional[int] = None


@partial(jax.tree_util.register_dataclass,
         data_fields=["k0", "k1"], meta_fields=["a_seed"])
@dataclasses.dataclass(frozen=True)
class KSKey:
    """Method-I keyswitch key: (d, k+p, n) NTT + Montgomery.  k1 (uniform)
    is seed-expandable like PublicKey.pk1."""
    k0: jnp.ndarray
    k1: jnp.ndarray
    a_seed: Optional[int] = None


@partial(jax.tree_util.register_dataclass,
         data_fields=["k0", "k1", "perm_coeff_src", "perm_coeff_neg", "perm_ntt"],
         meta_fields=["galois_elt", "a_seed", "inv_form"])
@dataclasses.dataclass(frozen=True)
class GaloisKeyOne:
    """inv_form=True stores the key INVERSE-PERMUTED (k' = σ_g^{-1}(k),
    generated directly: k'1 = uniform from seed, k'0 = enc under σ_g^{-1}(s)
    of P·gadget·s): consumers MAC with UNPERMUTED digits and apply σ_g to
    the 2-poly accumulator instead of all d̃ digit polys — the hoisted-
    rotation gather volume drops (d̃+1)→2 polys per rotation (the classic
    hoisting trick; the reference permutes per-digit, switchkey.cuh:163)."""
    k0: jnp.ndarray
    k1: jnp.ndarray
    perm_coeff_src: jnp.ndarray
    perm_coeff_neg: jnp.ndarray
    perm_ntt: jnp.ndarray
    galois_elt: int
    a_seed: Optional[int] = None
    inv_form: bool = False


class GaloisKey:
    """Bundle of per-element Galois keys (default steps ±2^j like the
    reference evaluationkey.cu:316-341, plus conjugation).  A pytree, so
    rotation-heavy pipelines can be jitted with the key bundle as an
    argument."""

    def __init__(self, keys: dict):
        self.keys = keys


def _gk_flatten(gk: GaloisKey):
    items = sorted(gk.keys.items(), key=lambda kv: str(kv[0]))
    return tuple(v for _, v in items), tuple(k for k, _ in items)


def _gk_unflatten(names, vals):
    return GaloisKey(dict(zip(names, vals)))


jax.tree_util.register_pytree_node(GaloisKey, _gk_flatten, _gk_unflatten)


@partial(jax.tree_util.register_dataclass,
         data_fields=["base_q", "base_qp", "ntt_qp", "div_p"],
         meta_fields=["n", "q_primes", "p_primes"])
@dataclasses.dataclass(frozen=True)
class RingView:
    """The ring tables keygen/keyswitch need (a pytree so keygen jits);
    both scheme contexts build one from their fields."""
    n: int
    q_primes: tuple
    p_primes: tuple
    base_q: rns.Base
    base_qp: rns.Base
    ntt_qp: "object"
    div_p: rns.DivRoundLastq

    def __post_init__(self):
        object.__setattr__(self, "q_primes", tuple(int(q) for q in self.q_primes))
        object.__setattr__(self, "p_primes", tuple(int(q) for q in self.p_primes))

    @property
    def qp_primes(self):
        return self.q_primes + self.p_primes

    @property
    def k(self):
        return len(self.q_primes)


@rng.drbg_eager
@partial(jax.jit, static_argnames=("hamming_weight",))
def keygen_secret(ring: RingView, key, hamming_weight: Optional[int] = None) -> SecretKey:
    hw = ring.n // 2 if hamming_weight is None else hamming_weight
    s = rng.ternary_hw(key, ring.n, hw)
    s_rns = rng.signed_to_rns(s, ring.qp_primes)
    s_ntt = nttm.ntt_fwd(s_rns, ring.ntt_qp)
    p, pinv, r2, *_ = ring.base_qp.bview()
    return SecretKey(s, mm.to_mont(s_ntt, p, pinv, r2), hw)


@rng.drbg_eager
@partial(jax.jit, static_argnames=("noise_scale",))
def _keygen_public_core(ring: RingView, ka, ke, sk: SecretKey,
                        noise_scale: int = 1) -> PublicKey:
    a = rng.uniform_rns(ka, ring.qp_primes, (ring.n,))  # NTT domain
    e = nttm.ntt_fwd(rng.gaussian_rns(ke, ring.qp_primes, (ring.n,),
                                      noise_scale=noise_scale), ring.ntt_qp)
    p, pinv, r2, *_ = ring.base_qp.bview()
    a_s = mm.mont_mul(a, sk.s_ntt_mont_qp, p, pinv)
    pk0 = mm.neg_mod(mm.add_mod(a_s, e, p), p)
    return PublicKey(mm.to_mont(pk0, p, pinv, r2), mm.to_mont(a, p, pinv, r2))


def keygen_public(ring: RingView, key, sk: SecretKey,
                  a_seed: Optional[int] = None,
                  noise_scale: int = 1) -> PublicKey:
    """a_seed: generate the uniform half from this public seed so the key is
    seed-expandable (serialized size roughly halves).  noise_scale=t gives
    BGV-style lsb-noise keys."""
    if a_seed is None:
        ka, ke = rng.split(key)
        return _keygen_public_core(ring, ka, ke, sk, noise_scale=noise_scale)
    pk = _keygen_public_core(ring, rng.new_key(a_seed), key, sk,
                             noise_scale=noise_scale)
    return dataclasses.replace(pk, a_seed=int(a_seed))


def ks_keygen(ring: RingView, key, sk: SecretKey, target_ntt_mont,
              groups=None, a_seed: Optional[int] = None,
              noise_scale: int = 1) -> KSKey:
    """Keyswitch key encrypting `target` (NTT+mont over QP) under s.

    groups=None: Method I (one digit per Q prime).  groups=((0,1),(2,3),...):
    Method II grouped gadget — digit j carries P·target on every limb of
    group j (reference relinkey_gen_II_kernel).  a_seed: seed-expand the
    uniform half (see PublicKey)."""
    if a_seed is None:
        ka, ke = rng.split(key)
        return _ks_keygen_core(ring, ka, ke, sk, target_ntt_mont, groups,
                               noise_scale=noise_scale)
    kk = _ks_keygen_core(ring, rng.new_key(a_seed), key, sk, target_ntt_mont,
                         groups, noise_scale=noise_scale)
    return dataclasses.replace(kk, a_seed=int(a_seed))


@rng.drbg_eager
@partial(jax.jit, static_argnames=("groups", "noise_scale"))
def _ks_keygen_core(ring: RingView, ka, ke, sk: SecretKey, target_ntt_mont,
                    groups=None, noise_scale: int = 1) -> KSKey:
    k, n = ring.k, ring.n
    if groups is None:
        groups = tuple((i,) for i in range(k))
    d = len(groups)
    P = _prod(ring.p_primes)
    p, pinv, r2, *_ = ring.base_qp.bview()
    a = jnp.moveaxis(rng.uniform_rns(ka, ring.qp_primes, (d, n)), 0, 1)
    e = nttm.ntt_fwd(jnp.moveaxis(
        rng.gaussian_rns(ke, ring.qp_primes, (d, n), noise_scale=noise_scale),
        0, 1), ring.ntt_qp)
    a_s = mm.mont_mul(a, sk.s_ntt_mont_qp[None], p, pinv)
    k0 = mm.neg_mod(mm.add_mod(a_s, e, p), p)
    sel = np.zeros((d, len(ring.qp_primes)), np.uint32)
    for j, g in enumerate(groups):
        for i in g:
            sel[j, i] = P % ring.q_primes[i]
    pt = mm.mont_mul(target_ntt_mont[None], jnp.asarray(sel)[:, :, None],
                     p[None], pinv[None])
    k0 = mm.add_mod(k0, pt, p)
    return KSKey(mm.to_mont(k0, p, pinv, r2), mm.to_mont(a, p, pinv, r2))


def keygen_relin(ring: RingView, key, sk: SecretKey, groups=None,
                 a_seed: Optional[int] = None, noise_scale: int = 1) -> KSKey:
    p, pinv, *_ = ring.base_qp.bview()
    s2_mont = mm.mont_mul(sk.s_ntt_mont_qp, sk.s_ntt_mont_qp, p, pinv)
    return ks_keygen(ring, key, sk, s2_mont, groups=groups, a_seed=a_seed,
                     noise_scale=noise_scale)


def keygen_switch(ring: RingView, key, sk_old: SecretKey, sk_new: SecretKey,
                  groups=None, a_seed: Optional[int] = None,
                  noise_scale: int = 1) -> KSKey:
    return ks_keygen(ring, key, sk_new, sk_old.s_ntt_mont_qp, groups=groups,
                     a_seed=a_seed, noise_scale=noise_scale)


def _galois_target(ring: RingView, sk: SecretKey, src, neg):
    s_g = polyops.apply_galois_coeff(
        rng.signed_to_rns(sk.s_coeff, ring.qp_primes), src, neg,
        ring.base_qp.p[:, None])
    p, pinv, r2, *_ = ring.base_qp.bview()
    return mm.to_mont(nttm.ntt_fwd(s_g, ring.ntt_qp), p, pinv, r2)


def keygen_galois_one(ring: RingView, key, sk: SecretKey, g: int,
                      groups=None, a_seed: Optional[int] = None,
                      noise_scale: int = 1,
                      inv_form: bool = False) -> GaloisKeyOne:
    n = ring.n
    src, neg = polyops.galois_perm_coeff(g, n)
    perm_ntt = polyops.galois_perm_ntt(g, n)
    if inv_form:
        # k' = σ_g^{-1}(k) generated DIRECTLY: the uniform half is the raw
        # (seed-expandable) sample and k'0 = -a·σ^{-1}(s) + e + P·g_j·s —
        # algebra: σ(Σ_j d_j k'_j) = Σ_j σ(d_j) k_j with k = σ(k'), so the
        # consumer MACs unpermuted digits and permutes only the result.
        g_inv = pow(g, -1, 2 * n)
        src_i, neg_i = polyops.galois_perm_coeff(g_inv, n)
        under = dataclasses.replace(
            sk, s_ntt_mont_qp=_galois_target(ring, sk, src_i, neg_i))
        kk = ks_keygen(ring, key, under, sk.s_ntt_mont_qp,
                       groups=groups, a_seed=a_seed, noise_scale=noise_scale)
    else:
        kk = ks_keygen(ring, key, sk, _galois_target(ring, sk, src, neg),
                       groups=groups, a_seed=a_seed, noise_scale=noise_scale)
    return GaloisKeyOne(kk.k0, kk.k1, src, neg, perm_ntt, g,
                        a_seed=kk.a_seed, inv_form=inv_form)


def keygen_galois(ring: RingView, key, sk: SecretKey, steps=None,
                  max_shift: int = 8, include_conj: bool = True,
                  groups=None, elts=None,
                  a_seed: Optional[int] = None,
                  noise_scale: int = 1, store_a: bool = True,
                  inv_form: bool = False) -> GaloisKey:
    """Default: powers-of-two step chain ±2^0..±2^(max_shift-1) like the
    reference (evaluationkey.cu:316-341); `steps` gives a custom rotation
    list, `elts` gives raw Galois elements directly (reference custom-elt
    constructor, evaluationkey.cuh:366-390).

    store_a=False (requires a_seed): strip the regenerable uniform half of
    each key as it is generated, so neither the final bundle nor the keygen
    peak ever holds k1 — halves resident HBM for large rotation key sets
    (the N=2^16 deep-chain bootstrap set exceeds one chip's HBM otherwise);
    consumers regenerate k1 from a_seed per use (ensure_k1)."""
    if not store_a and a_seed is None:
        raise ValueError("store_a=False requires a_seed (seed-expanded keys)")
    n = ring.n
    if steps is None and elts is None:
        steps = []
        for j in range(max_shift):
            steps += [1 << j, -(1 << j)]
    gl = [polyops.steps_to_galois_elt(s, n) for s in (steps or [])]
    gl += [int(g) for g in (elts or [])]
    keys = {}
    subkeys = rng.split(key, len(gl) + 1)
    for i, (sk_i, g) in enumerate(zip(subkeys[:-1], gl)):
        if g not in keys:
            kk = keygen_galois_one(
                ring, sk_i, sk, g, groups=groups,
                a_seed=None if a_seed is None else a_seed + i,
                noise_scale=noise_scale, inv_form=inv_form)
            keys[g] = kk if store_a else strip_seeded(kk)
    if include_conj:
        kk = keygen_galois_one(
            ring, subkeys[-1], sk, 2 * n - 1, groups=groups,
            a_seed=None if a_seed is None else a_seed + len(gl),
            noise_scale=noise_scale, inv_form=inv_form)
        keys["conj"] = kk if store_a else strip_seeded(kk)
    return GaloisKey(keys)


def slice_key_level(k_arr, k_lvl: int, k_full: int):
    """Restrict a (d, k_full+p, n) key to the level basis (digits < k_lvl,
    limbs = first k_lvl Q limbs + the special limb(s))."""
    return jnp.concatenate([k_arr[:k_lvl, :k_lvl], k_arr[:k_lvl, k_full:]], axis=1)


def hoist_digits(poly_q, base_qp: rns.Base, ntt_qp: nttm.NttTables,
                 in_ntt: bool, ntt_q: Optional[nttm.NttTables] = None):
    """Phase 1 of Method-I keyswitch: RNS-digit decompose + NTT over Q̃.

    Shared across many rotations of the same ciphertext — the TPU analog of
    the reference's hoisting (ckks_duplicate_kernel + single decomposition in
    fast_single_hoisting_rotation, src/lib/host/ckks/operator.cu:4674)."""
    if in_ntt:
        poly_q = nttm.ntt_inv(poly_q, ntt_q)
    digits = rns.decompose_to_base(poly_q, base_qp)        # (k, k+p, n)
    return nttm.ntt_fwd(digits, ntt_qp)


def hoisted_mac(d_ntt, k0, k1, base_qp: rns.Base):
    """Phase 2: the hot inner product Σ_d digit×ksk over Q̃ (NTT domain).
    Returns the P-scaled pair (acc0, acc1) *before* the ÷P step — TPU analog
    of keyswitch_multiply_accumulate_kernel (reference kernel/switchkey.cu:61).

    Lazy accumulation: the raw 64-bit products d·(k·R) are summed exactly as
    (hi, lo) pairs with no per-term reduction (ops/rns.py lazy_mac_mont)."""
    return (rns.lazy_mac_mont(d_ntt, k0, base_qp),
            rns.lazy_mac_mont(d_ntt, k1, base_qp))


def ks_finish(acc, ntt_qp: nttm.NttTables, div_p: rns.DivRoundLastq,
              out_ntt: bool, ntt_q: Optional[nttm.NttTables] = None):
    """Phase 3: INTT over Q̃, exact ÷P with rounding, optional NTT over Q
    (reference divide_round_lastq_* family).  acc: (..., k+p, n) NTT-domain."""
    coeff = nttm.ntt_inv(acc, ntt_qp)
    out = div_p(coeff)
    if out_ntt:
        out = nttm.ntt_fwd(out, ntt_q)
    return out


def keyswitch_core(poly_q, k0, k1, base_qp: rns.Base, ntt_qp: nttm.NttTables,
                   div_p: rns.DivRoundLastq, in_ntt: bool, out_ntt: bool,
                   ntt_q: Optional[nttm.NttTables] = None):
    """Method-I keyswitch of one poly over the (possibly leveled) basis.

    poly_q: (k, n) over Q-part of base_qp.  Returns (d0, d1) over Q."""
    d_ntt = hoist_digits(poly_q, base_qp, ntt_qp, in_ntt, ntt_q)
    acc0, acc1 = hoisted_mac(d_ntt, k0, k1, base_qp)
    out = ks_finish(jnp.stack([acc0, acc1]), ntt_qp, div_p, out_ntt, ntt_q)
    return out[0], out[1]


# =========================================================================
# Seed-expanded key compression (reference common-seed storage for the
# uniform `a` halves, host/bfv/publickey.cuh:324; README.md:76 claims up to
# 60% serialized-size reduction with seeds + zlib)
# =========================================================================

def _regen_a(ring: RingView, a_seed: int, d: Optional[int]):
    """Recompute the uniform Montgomery NTT-domain `a` half from its seed."""
    ka = rng.new_key(a_seed)
    if d is None:
        a = rng.uniform_rns(ka, ring.qp_primes, (ring.n,))
    else:
        a = jnp.moveaxis(rng.uniform_rns(ka, ring.qp_primes, (d, ring.n)), 0, 1)
    p, pinv, r2, *_ = ring.base_qp.bview()
    return mm.to_mont(a, p, pinv, r2)


def strip_seeded(obj):
    """Drop the regenerable uniform halves of seed-expanded keys before
    serialization.  Works on PublicKey / KSKey / GaloisKeyOne / GaloisKey
    (and passes anything else through unchanged)."""
    if isinstance(obj, PublicKey) and obj.a_seed is not None:
        return dataclasses.replace(obj, pk1=None)
    if isinstance(obj, KSKey) and obj.a_seed is not None:
        return dataclasses.replace(obj, k1=None)
    if isinstance(obj, GaloisKeyOne) and obj.a_seed is not None:
        return dataclasses.replace(obj, k1=None)
    if isinstance(obj, GaloisKey):
        return GaloisKey({k: strip_seeded(v) for k, v in obj.keys.items()})
    return obj


def ensure_k1(ring: RingView, kk):
    """k1 of a KSKey/GaloisKeyOne, regenerated on device from a_seed when the
    key is stored stripped (k1=None).  Traceable — under jit the regeneration
    compiles into the consuming keyswitch, so a stripped key set halves
    resident HBM at the cost of one uniform+to_mont pass per key use."""
    if kk.k1 is not None:
        return kk.k1
    if kk.a_seed is None:
        raise ValueError("key has no stored k1 and no a_seed to regenerate it")
    return _regen_a(ring, kk.a_seed, int(kk.k0.shape[0]))


def expand_seeded(obj, ring: RingView):
    """Inverse of strip_seeded: regenerate the dropped halves on load."""
    if isinstance(obj, PublicKey) and obj.pk1 is None:
        return dataclasses.replace(obj, pk1=_regen_a(ring, obj.a_seed, None))
    if isinstance(obj, KSKey) and obj.k1 is None:
        return dataclasses.replace(
            obj, k1=_regen_a(ring, obj.a_seed, int(obj.k0.shape[0])))
    if isinstance(obj, GaloisKeyOne) and obj.k1 is None:
        return dataclasses.replace(
            obj, k1=_regen_a(ring, obj.a_seed, int(obj.k0.shape[0])))
    if isinstance(obj, GaloisKey):
        return GaloisKey({k: expand_seeded(v, ring) for k, v in obj.keys.items()})
    return obj
