"""Device CRT composition of *small* centered values, and log-magnitude
estimation of large ones — the pieces that let CKKS decode and the BFV noise
budget run entirely on device.

The reference composes RNS residues into multi-word big integers on the GPU
(kernel/decryption.cu compose_kernel + find_max_norm_kernel with
biginteger:: device arithmetic, kernel/encoding.cu decode_kernel_*_compose).
The TPU redesign avoids big-int limbs entirely:

  * compose_small: for |[x]_Q| < 2^59 (every decode: messages are tiny
    compared to Q), convert the Q-basis to a 2-prime gamma basis with an
    exact alpha-correction (the scaled-remainder idea behind the BFV {t,γ}
    decryption, Bajard et al.), CRT the pair into an exact 64-bit value, and
    hand it to df64 floats.
  * frac_log2: for arbitrarily large [x]_Q, the fractional part of
    Σ y_i/q_i equals [x]_Q/Q up to ~2^-45, giving log2|x| directly — enough
    for a noise *budget* in bits.

Both are vectorized elementwise device ops (uint32 lanes + df64).
"""

from __future__ import annotations

import dataclasses
from functools import reduce

import numpy as np
import jax
import jax.numpy as jnp

from . import df64
from . import modmath as mm

_prod = lambda xs: reduce(lambda a, b: a * b, xs, 1)

# fixed gamma pair: two ~30-bit primes coprime to every <2^30 NTT prime we
# generate (they are not NTT-friendly themselves; only CRT is needed)
_G1 = (1 << 30) - 35        # 1073741789, prime
_G2 = (1 << 30) - 77        # 1073741747, prime


@dataclasses.dataclass(frozen=True)
class SmallComposeTables:
    """Per-(primes) static tables (a pytree)."""
    qhat_inv: jnp.ndarray       # (k,)   [(Q/q_i)^{-1}]_{q_i}
    qhat_inv_sh: jnp.ndarray    # (k,)   shoup companion
    inv_q: tuple                # df64 pair (k,) of 1/q_i
    qhat_g: jnp.ndarray         # (2, k) [(Q/q_i)]_{g_j}
    q_g: jnp.ndarray            # (2,)   [Q]_{g_j}
    logq: float


jax.tree_util.register_dataclass(
    SmallComposeTables,
    data_fields=["qhat_inv", "qhat_inv_sh", "inv_q", "qhat_g", "q_g"],
    meta_fields=["logq"])

_G1G2 = _G1 * _G2
_G1_INV_G2 = pow(_G1, -1, _G2)


def build_tables(primes) -> SmallComposeTables:
    primes = [int(q) for q in primes]
    Q = _prod(primes)
    qhat_inv = np.array([pow(Q // q, -1, q) for q in primes], np.uint32)
    qhat_inv_sh = np.array(
        [mm.shoup(int(w), q) for w, q in zip(qhat_inv, primes)], np.uint32)
    qhat_g = np.array([[(Q // q) % g for q in primes] for g in (_G1, _G2)],
                      np.uint32)
    q_g = np.array([Q % g for g in (_G1, _G2)], np.uint32)
    return SmallComposeTables(
        qhat_inv=jnp.asarray(qhat_inv),
        qhat_inv_sh=jnp.asarray(qhat_inv_sh),
        inv_q=df64.from_f64(np.array([1.0 / q for q in primes])),
        qhat_g=jnp.asarray(qhat_g),
        q_g=jnp.asarray(q_g),
        logq=float(sum(np.log2(q) for q in primes)),
    )


def _y_and_frac(x, primes, t: SmallComposeTables):
    """y_i = [x_i (Q/q_i)^{-1}]_{q_i} and f = Σ y_i/q_i (df64).

    x: (..., k, n) uint32 residues."""
    p = jnp.asarray(np.asarray(primes, np.uint32))[:, None]
    y = mm.shoup_mul(x, t.qhat_inv[:, None], t.qhat_inv_sh[:, None], p)
    # df64 accumulate of y_i / q_i along the limb axis
    # y fits 30 bits — split so each float term is exact: y = a*2^15 + b
    a = (y >> 15).astype(jnp.float32)
    b = (y & jnp.uint32(0x7FFF)).astype(jnp.float32)
    inv_hi = t.inv_q[0][:, None]
    inv_lo = t.inv_q[1][:, None]
    term = df64.add(df64.mul((a * np.float32(2.0 ** 15), jnp.zeros_like(a)),
                             (inv_hi, inv_lo)),
                    df64.mul((b, jnp.zeros_like(b)), (inv_hi, inv_lo)))
    f = (jnp.zeros_like(term[0][..., 0, :]), jnp.zeros_like(term[0][..., 0, :]))
    for i in range(x.shape[-2]):
        f = df64.add(f, (term[0][..., i, :], term[1][..., i, :]))
    return y, f


def _g_consts(g: int):
    r1 = (1 << 32) % g
    return (jnp.uint32(g), jnp.uint32(mm.barrett_mu(g)), jnp.uint32(r1),
            jnp.uint32(mm.shoup(r1, g)))


def _mac_mod_g(y, alpha, g_idx: int, t: SmallComposeTables):
    """(Σ_i y_i·[(Q/q_i)]_g - alpha·[Q]_g) mod g via lazy 64-bit sums.

    Σ y_i·c_i over k ≤ 64 limbs of 30-bit values × 30-bit constants stays
    below 2^64 (k·2^60), so the (hi, lo) accumulation is exact."""
    g = int(_G1 if g_idx == 0 else _G2)
    gp, mu, r1, r1sh = _g_consts(g)
    hi = jnp.zeros_like(y[..., 0, :])
    lo = jnp.zeros_like(y[..., 0, :])
    for i in range(y.shape[-2]):
        thi, tlo = mm.widening_mul(y[..., i, :], t.qhat_g[g_idx, i])
        hi, lo = mm.add64(hi, lo, thi, tlo)
    r = mm.reduce64(hi, lo, gp, mu, r1, r1sh)
    aq_hi, aq_lo = mm.widening_mul(alpha, t.q_g[g_idx])
    aq = mm.reduce64(aq_hi, aq_lo, gp, mu, r1, r1sh)
    return mm.sub_mod(r, aq, gp)


def compose_small(x, primes, t: SmallComposeTables):
    """Exact centered value of [x]_Q (|value| < g1*g2/2 ≈ 2^59 required) as a
    df64 pair.  x: (..., k, n) uint32."""
    y, f = _y_and_frac(x, primes, t)
    alpha = jnp.round(f[0] + f[1]).astype(jnp.uint32)
    r1 = _mac_mod_g(y, alpha, 0, t)
    r2 = _mac_mod_g(y, alpha, 1, t)
    # CRT: v = r1 + g1 * [(r2 - r1) * g1^{-1}]_{g2}   in [0, g1*g2)
    g2 = jnp.uint32(_G2)
    mu2 = jnp.uint32(mm.barrett_mu(_G2))
    d = mm.sub_mod(r2, mm.barrett32(r1, g2, mu2), g2)
    k_ = mm.shoup_mul(d, jnp.uint32(_G1_INV_G2),
                      jnp.uint32(mm.shoup(_G1_INV_G2, _G2)), g2)
    hi, lo = mm.widening_mul(k_, jnp.uint32(_G1))
    lo2 = lo + r1
    hi = hi + (lo2 < lo).astype(jnp.uint32)
    lo = lo2
    # center: subtract g1*g2 if v >= g1*g2/2
    half_hi = jnp.uint32((_G1G2 // 2) >> 32)
    half_lo = jnp.uint32((_G1G2 // 2) & 0xFFFFFFFF)
    ge = jnp.logical_or(hi > half_hi,
                        jnp.logical_and(hi == half_hi, lo >= half_lo))
    p_hi = jnp.uint32(_G1G2 >> 32)
    p_lo = jnp.uint32(_G1G2 & 0xFFFFFFFF)
    # magnitude = v if not ge else g1g2 - v
    bl = p_lo - lo
    bh = p_hi - hi - (p_lo < lo).astype(jnp.uint32)
    mag_hi = jnp.where(ge, bh, hi)
    mag_lo = jnp.where(ge, bl, lo)
    val = _u64_to_df64(mag_hi, mag_lo)
    sign = jnp.where(ge, np.float32(-1.0), np.float32(1.0))
    return (val[0] * sign, val[1] * sign)


def _u64_to_df64(hi, lo):
    """Exact-ish (df64-precision) float of hi·2^32 + lo (hi < 2^28)."""
    h1 = (hi >> 12).astype(jnp.float32) * np.float32(2.0 ** 44)
    h2 = (hi & jnp.uint32(0xFFF)).astype(jnp.float32) * np.float32(2.0 ** 32)
    l1 = (lo >> 20).astype(jnp.float32) * np.float32(2.0 ** 20)
    l2 = (lo & jnp.uint32(0xFFFFF)).astype(jnp.float32)
    z = jnp.zeros_like(h1)
    acc = df64.add((h1, z), (h2, z))
    acc = df64.add(acc, (l1, z))
    return df64.add(acc, (l2, z))


def mod_primes_centered(x, primes, targets, tabs: SmallComposeTables):
    """[x]_Q (centered) mod each target prime, sharing one y/alpha pass —
    the multi-target form of mod_prime_centered used by the composite-q0
    CKKS mod-raise (models/ckks_boot.mod_raise; reference mod_raise_kernel,
    src/lib/kernel/bootstrapping.cu, which big-int composes then reduces).

    x: (..., k, n) uint32.  Returns (..., len(targets), n) uint32."""
    y, f = _y_and_frac(x, primes, tabs)
    fv = f[0] + f[1]
    alpha = jnp.round(fv).astype(jnp.uint32)
    Q = _prod([int(q) for q in primes])
    outs = []
    for t_mod in targets:
        g = int(t_mod)
        gp, mu, r1, r1sh = _g_consts(g)
        qhat_t = np.array([(Q // int(q)) % g for q in primes], np.uint32)
        q_t = jnp.uint32(Q % g)
        hi = jnp.zeros_like(y[..., 0, :])
        lo = jnp.zeros_like(y[..., 0, :])
        for i in range(y.shape[-2]):
            thi, tlo = mm.widening_mul(y[..., i, :], jnp.uint32(int(qhat_t[i])))
            hi, lo = mm.add64(hi, lo, thi, tlo)
        r = mm.reduce64(hi, lo, gp, mu, r1, r1sh)
        aq_hi, aq_lo = mm.widening_mul(alpha, q_t)
        aq = mm.reduce64(aq_hi, aq_lo, gp, mu, r1, r1sh)
        outs.append(mm.sub_mod(r, aq, gp))
    return jnp.stack(outs, axis=-2)


def frac_log2_norm(x, primes, t: SmallComposeTables):
    """max_j log2(|[x]_Q|_j) over the last axis, via the fractional-sum trick
    (valid down to |v| ≈ Q·2^-44; smaller values report -inf-ish).
    Returns a scalar float32 device value."""
    _, f = _y_and_frac(x, primes, t)
    v = f[0] + f[1]
    frac = v - jnp.round(v)                 # in [-1/2, 1/2] ~ [x]_Q / Q
    m = jnp.max(jnp.abs(frac))
    return jnp.log2(jnp.maximum(m, np.float32(2.0 ** -60))) + np.float32(t.logq)


def mod_prime_centered(x, primes, t_mod: int, tabs: SmallComposeTables):
    """[x]_Q (centered) mod t_mod for arbitrarily large [x]_Q — the BGV
    decryption compose (reference decryption.cu decryption_kernel family;
    here: Bajard-style alpha recovery via the df64 fractional sum, then a
    single mod-t MAC).  Requires |[x]_Q| < Q/2 - Q*2^-40 (i.e. the ciphertext
    has not overflowed), which is exactly the decryption-correctness bound.

    x: (..., k, n) uint32.  Returns (..., n) uint32 residues mod t_mod."""
    y, f = _y_and_frac(x, primes, tabs)
    fv = f[0] + f[1]
    alpha = jnp.round(fv).astype(jnp.uint32)   # exact: |centered|/Q << 1/2
    g = int(t_mod)
    gp, mu, r1, r1sh = _g_consts(g)
    Q = _prod([int(q) for q in primes])
    qhat_t = jnp.asarray(np.array([(Q // int(q)) % g for q in primes],
                                  np.uint32))
    q_t = jnp.uint32(Q % g)
    hi = jnp.zeros_like(y[..., 0, :])
    lo = jnp.zeros_like(y[..., 0, :])
    for i in range(y.shape[-2]):
        thi, tlo = mm.widening_mul(y[..., i, :], qhat_t[i])
        hi, lo = mm.add64(hi, lo, thi, tlo)
    r = mm.reduce64(hi, lo, gp, mu, r1, r1sh)
    aq_hi, aq_lo = mm.widening_mul(alpha, q_t)
    aq = mm.reduce64(aq_hi, aq_lo, gp, mu, r1, r1sh)
    return mm.sub_mod(r, aq, gp)
