"""Encrypted unsigned integers (huint8..huint256) over TFHE gate
bootstrapping.

Capability match for the reference's advertised huint types
(README.md:52-66 — huint8..256 addition is HEonGPU's headline TFHE
benchmark; the types are built from the §2.5 gate set).  TPU-first redesign:

  * Kogge-Stone parallel-prefix carry computation instead of a ripple chain:
    depth 2 + ceil(log2(W)) bootstrap *rounds* for W-bit addition (each
    prefix level is ONE 3-input carry-gate round, see _pre_carry), where
    every round is ONE batched blind rotation over up to 2W gates.  This
    works because every 2-input TFHE gate is (linear pre-comp -> shared
    bootstrap): heterogeneous gate mixes concatenate into a single
    bootstrap_raw call, which the batched TPU CMux kernel digests at
    near-constant latency (SURVEY §2.6: fill the MXU/VPU across gates
    instead of racing one CMux chain).
  * SIMD over vectors of integers for free: the batch axis holds
    (count x width) bits.

Carry semantics: add/sub return (result, carry/borrow ciphertext).
"""

from __future__ import annotations

import dataclasses
import functools
import math
from typing import Optional, Tuple

import numpy as np
import jax
import jax.numpy as jnp

from . import tfhe

U32 = jnp.uint32
MU = tfhe.MU


@functools.partial(jax.tree_util.register_dataclass,
                   data_fields=["bits"], meta_fields=["width", "count"])
@dataclasses.dataclass(frozen=True)
class HUint:
    """count integers of `width` bits each; bits ct batch is (count*width,),
    LSB-first within each integer.  A pytree: with a tfhe.FusedKey, whole
    integer circuits jit end-to-end (e.g. jax.jit(add)(ctx, fk, x, y))."""
    bits: tfhe.Ciphertext
    width: int
    count: int


def _cat(*cts: tfhe.Ciphertext) -> tfhe.Ciphertext:
    return tfhe.Ciphertext(jnp.concatenate([c.a for c in cts]),
                           jnp.concatenate([c.b for c in cts]),
                           variance=max(c.variance for c in cts))


def _slc(ct: tfhe.Ciphertext, lo: int, hi: int) -> tfhe.Ciphertext:
    return tfhe.Ciphertext(ct.a[lo:hi], ct.b[lo:hi], variance=ct.variance)


def _trivial(nbits: int, value: bool, n: int = tfhe.LWE_N) -> tfhe.Ciphertext:
    """Noise-free LWE encoding of a constant bit (a=0, b=±mu)."""
    b = MU if value else (jnp.uint32(0) - MU)
    return tfhe.Ciphertext(jnp.zeros((nbits, n), U32),
                           jnp.full((nbits,), b, U32))


# ---- batched linear pre-computations (reference tfhe_*_pre_comp kernels) ----
# Variance bookkeeping mirrors tfhe.py's gate wrappers: linear combines sum
# variances; the XOR pre-comp's x2 coefficients quadruple them.

def _pre_and(c1, c2):
    return tfhe.Ciphertext(c1.a + c2.a, c1.b + c2.b - MU,
                           variance=c1.variance + c2.variance)


def _pre_or(c1, c2):
    return tfhe.Ciphertext(c1.a + c2.a, c1.b + c2.b + MU,
                           variance=c1.variance + c2.variance)


def _pre_xor(c1, c2):
    two = jnp.uint32(2)
    return tfhe.Ciphertext(two * (c1.a + c2.a), two * (c1.b + c2.b) + two * MU,
                           variance=4 * (c1.variance + c2.variance))


def _pre_carry(g, p, gs):
    """3-input carry-combine gate: g OR (p AND gs) in ONE bootstrap, valid
    under the Kogge-Stone invariant g AND p = 0 (true for (g,p) = (a AND b,
    a XOR b) and preserved by the combine).  Phase = 2g + p + gs + mu:
    reachable cases give ±1/8 margins with no torus wraparound ((1,1,*) is
    unreachable, so the max phase is 3/8).  Variance: 4Vg + Vp + Vgs."""
    two = jnp.uint32(2)
    return tfhe.Ciphertext(two * g.a + p.a + gs.a,
                           two * g.b + p.b + gs.b + MU,
                           variance=4 * g.variance + p.variance + gs.variance)


def _carry_margin_bits(variance: float) -> float:
    """log2(mu / 4 sigma) of the carry gate's pre-bootstrap phase noise."""
    sigma = max(math.sqrt(variance), 1e-30)
    return math.log2((1.0 / 8.0) / (4.0 * sigma))


def encrypt_huint(ctx, sk, values, width: int, key) -> HUint:
    """values: int or sequence of ints; width in {8,16,32,64,128,256,...}."""
    vals = np.atleast_1d(np.asarray(values, object))
    bits = np.zeros((len(vals), width), np.int64)
    for i, v in enumerate(vals):
        for j in range(width):
            bits[i, j] = (int(v) >> j) & 1
    ct = tfhe.encrypt(ctx, sk, bits.reshape(-1), key)
    return HUint(ct, width, len(vals))


def decrypt_huint(ctx, sk, x: HUint) -> np.ndarray:
    bits = tfhe.decrypt(ctx, sk, x.bits).reshape(x.count, x.width)
    out = np.zeros(x.count, object)
    for j in range(x.width):
        out += bits[:, j].astype(object) << j
    return out


def _shift_gp(g: tfhe.Ciphertext, p: tfhe.Ciphertext, count: int, width: int,
              offset: int):
    """(g, p) shifted up by `offset` bit positions within each integer,
    padding with the prefix-identity (g=0, p=arbitrary->0)."""
    ga = g.a.reshape(count, width, -1)
    gb = g.b.reshape(count, width)
    pa = p.a.reshape(count, width, -1)
    pb = p.b.reshape(count, width)
    pad = _trivial(count * offset, False, n=g.a.shape[-1])
    pad_a = pad.a.reshape(count, offset, -1)
    pad_b = pad.b.reshape(count, offset)
    gs = tfhe.Ciphertext(
        jnp.concatenate([pad_a, ga[:, :width - offset]], axis=1).reshape(g.a.shape),
        jnp.concatenate([pad_b, gb[:, :width - offset]], axis=1).reshape(g.b.shape),
        variance=g.variance)
    ps = tfhe.Ciphertext(
        jnp.concatenate([pad_a, pa[:, :width - offset]], axis=1).reshape(p.a.shape),
        jnp.concatenate([pad_b, pb[:, :width - offset]], axis=1).reshape(p.b.shape),
        variance=p.variance)
    return gs, ps


def _add_core(ctx, bk, xbits: tfhe.Ciphertext, ybits: tfhe.Ciphertext,
              count: int, width: int,
              carry_in: Optional[tfhe.Ciphertext] = None):
    """Kogge-Stone addition on bit ciphertexts.  Returns (sum bits, carry out).

    Rounds: 1 (g,p) + ceil(log2(width)) (prefix, one carry-gate round per
    level) + 1 (sum) batched bootstraps; +1 with a carry-in."""
    B = count * width
    # round 1: g = a AND b, p = a XOR b — one fused bootstrap
    pre = _cat(_pre_and(xbits, ybits), _pre_xor(xbits, ybits))
    gp = tfhe._bootstrap(ctx, bk, pre)
    g, p = _slc(gp, 0, B), _slc(gp, B, 2 * B)
    p_orig = p  # the sum bits need a XOR b after the prefix consumes p

    # incorporate carry-in as a virtual position -1 by OR-ing it into g_0:
    # (g0', p0') = (g0 OR (p0 AND cin), p0) — the 3-input carry gate does it
    # in ONE round when the noise budget allows, else two 2-input rounds
    if carry_in is not None:
        cin = carry_in  # (count,) batch
        p0 = tfhe.Ciphertext(p.a.reshape(count, width, -1)[:, 0],
                             p.b.reshape(count, width)[:, 0],
                             variance=p.variance)
        g0 = tfhe.Ciphertext(g.a.reshape(count, width, -1)[:, 0],
                             g.b.reshape(count, width)[:, 0],
                             variance=g.variance)
        pre0 = _pre_carry(g0, p0, cin)
        if _carry_margin_bits(pre0.variance) >= 1.0:
            g0n = tfhe._bootstrap(ctx, bk, pre0)
        else:
            t = tfhe._bootstrap(ctx, bk, _pre_and(p0, cin))
            g0n = tfhe._bootstrap(ctx, bk, _pre_or(g0, t))
        ga = g.a.reshape(count, width, -1).at[:, 0].set(g0n.a)
        gb = g.b.reshape(count, width).at[:, 0].set(g0n.b)
        g = tfhe.Ciphertext(ga.reshape(g.a.shape), gb.reshape(g.b.shape),
                            variance=max(g.variance, g0n.variance))

    # Kogge-Stone prefix: after the loop, g[i] = carry OUT of position i.
    # Each level is ONE batched bootstrap: the combine g' = g OR (p AND gs)
    # is the 3-input carry gate, evaluated alongside p' = p AND ps in the
    # same blind-rotation call (gates differ only in their linear pre-comp).
    # Falls back to the two-round form if the tracked variance leaves the
    # carry gate's 2x-weighted phase short of margin (e.g. unrolled keys).
    offset = 1
    while offset < width:
        gs, ps = _shift_gp(g, p, count, width, offset)
        pre_c = _pre_carry(g, p, gs)
        if _carry_margin_bits(pre_c.variance) >= 1.0:
            t = tfhe._bootstrap(ctx, bk, _cat(pre_c, _pre_and(p, ps)))
            g, p = _slc(t, 0, B), _slc(t, B, 2 * B)
        else:
            # t1 = p AND g_shifted ; t2 = p AND p_shifted  (one bootstrap)
            pre = _cat(_pre_and(p, gs), _pre_and(p, ps))
            t = tfhe._bootstrap(ctx, bk, pre)
            t1, t2 = _slc(t, 0, B), _slc(t, B, 2 * B)
            g = tfhe._bootstrap(ctx, bk, _pre_or(g, t1))
            p = t2
        offset *= 2

    # carries into each position: c_i = g[i-1] (c_0 = carry_in handled above)
    ga = g.a.reshape(count, width, -1)
    gb = g.b.reshape(count, width)
    pad = _trivial(count, False, n=g.a.shape[-1])
    carry_a = jnp.concatenate([pad.a.reshape(count, 1, -1),
                               ga[:, :width - 1]], axis=1)
    carry_b = jnp.concatenate([pad.b.reshape(count, 1),
                               gb[:, :width - 1]], axis=1)
    carries = tfhe.Ciphertext(carry_a.reshape(-1, carry_a.shape[-1]),
                              carry_b.reshape(-1), variance=g.variance)
    if carry_in is not None:
        # c_0 = carry_in exactly
        ca = carries.a.reshape(count, width, -1).at[:, 0].set(carry_in.a)
        cb = carries.b.reshape(count, width).at[:, 0].set(carry_in.b)
        carries = tfhe.Ciphertext(ca.reshape(-1, ca.shape[-1]), cb.reshape(-1),
                                  variance=max(carries.variance,
                                               carry_in.variance))

    s = tfhe._bootstrap(ctx, bk, _pre_xor(p_orig, carries))
    carry_out = tfhe.Ciphertext(ga[:, width - 1], gb[:, width - 1],
                                variance=g.variance)
    return s, carry_out


def add(ctx, bk, x: HUint, y: HUint) -> Tuple[HUint, tfhe.Ciphertext]:
    """x + y mod 2^width, plus the carry-out bit (reference huint add)."""
    assert x.width == y.width and x.count == y.count
    s, cout = _add_core(ctx, bk, x.bits, y.bits, x.count, x.width)
    return HUint(s, x.width, x.count), cout


def sub(ctx, bk, x: HUint, y: HUint) -> Tuple[HUint, tfhe.Ciphertext]:
    """x - y mod 2^width; second return is the NO-borrow bit (1 if x >= y)."""
    assert x.width == y.width and x.count == y.count
    ynot = tfhe.NOT(ctx, y.bits)
    one = _trivial(x.count, True, n=x.bits.a.shape[-1])
    s, cout = _add_core(ctx, bk, x.bits, ynot, x.count, x.width, carry_in=one)
    return HUint(s, x.width, x.count), cout


def bootstrap_rounds(width: int) -> int:
    """Number of batched blind-rotation rounds one addition costs on the
    fast path (fresh standard-key inputs: each Kogge-Stone prefix level is
    one 3-input-carry-gate round)."""
    return 1 + max(1, math.ceil(math.log2(width))) + 1


def ge(ctx, bk, x: HUint, y: HUint) -> tfhe.Ciphertext:
    """Encrypted (x >= y) per integer: the no-borrow bit of x - y."""
    _, noborrow = sub(ctx, bk, x, y)
    return noborrow


def eq(ctx, bk, x: HUint, y: HUint) -> tfhe.Ciphertext:
    """Encrypted (x == y): NOR-reduce the XOR difference bits, one batched
    bootstrap per tree level (depth ceil(log2 W))."""
    assert x.width == y.width and x.count == y.count
    W, C = x.width, x.count
    d = tfhe._bootstrap(ctx, bk, _pre_xor(x.bits, y.bits))  # diff bits
    # OR-reduce pairs until one bit per integer remains, then negate
    width = W
    cur = d
    while width > 1:
        half = width // 2
        a_ = cur.a.reshape(C, width, -1)
        b_ = cur.b.reshape(C, width)
        lo = tfhe.Ciphertext(a_[:, :half].reshape(-1, a_.shape[-1]),
                             b_[:, :half].reshape(-1), variance=cur.variance)
        hi = tfhe.Ciphertext(a_[:, half:2 * half].reshape(-1, a_.shape[-1]),
                             b_[:, half:2 * half].reshape(-1),
                             variance=cur.variance)
        merged = tfhe._bootstrap(ctx, bk, _pre_or(lo, hi))
        if width % 2:
            tail = tfhe.Ciphertext(a_[:, -1:].reshape(-1, a_.shape[-1]),
                                   b_[:, -1:].reshape(-1),
                                   variance=cur.variance)
            ma = merged.a.reshape(C, half, -1)
            mb = merged.b.reshape(C, half)
            merged = tfhe.Ciphertext(
                jnp.concatenate([ma, tail.a.reshape(C, 1, -1)], axis=1
                                ).reshape(-1, a_.shape[-1]),
                jnp.concatenate([mb, tail.b.reshape(C, 1)], axis=1).reshape(-1),
                variance=max(merged.variance, tail.variance))
            width = half + 1
        else:
            width = half
        cur = merged
    return tfhe.NOT(ctx, cur)


# =========================================================================
# Shifts, MUX, comparison-select, multiply (beyond the reference's advertised
# add/sub surface — the natural completions of the huint family)
# =========================================================================

def shift_left(x: HUint, k: int) -> HUint:
    """x << k (mod 2^width): free — bit ciphertexts move positions."""
    if k == 0:
        return x
    if k >= x.width:
        return HUint(_trivial(x.count * x.width, False,
                              n=x.bits.a.shape[-1]), x.width, x.count)
    a = x.bits.a.reshape(x.count, x.width, -1)
    b = x.bits.b.reshape(x.count, x.width)
    pad = _trivial(x.count * k, False, n=a.shape[-1])
    na = jnp.concatenate([pad.a.reshape(x.count, k, -1), a[:, : x.width - k]],
                         axis=1)
    nb = jnp.concatenate([pad.b.reshape(x.count, k), b[:, : x.width - k]],
                         axis=1)
    ct = tfhe.Ciphertext(na.reshape(-1, na.shape[-1]), nb.reshape(-1),
                         variance=x.bits.variance)
    return HUint(ct, x.width, x.count)


def shift_right(x: HUint, k: int) -> HUint:
    """x >> k (logical): free."""
    if k == 0:
        return x
    if k >= x.width:
        return HUint(_trivial(x.count * x.width, False,
                              n=x.bits.a.shape[-1]), x.width, x.count)
    a = x.bits.a.reshape(x.count, x.width, -1)
    b = x.bits.b.reshape(x.count, x.width)
    pad = _trivial(x.count * k, False, n=a.shape[-1])
    na = jnp.concatenate([a[:, k:], pad.a.reshape(x.count, k, -1)], axis=1)
    nb = jnp.concatenate([b[:, k:], pad.b.reshape(x.count, k)], axis=1)
    ct = tfhe.Ciphertext(na.reshape(-1, na.shape[-1]), nb.reshape(-1),
                         variance=x.bits.variance)
    return HUint(ct, x.width, x.count)


def mux(ctx, bk, sel: tfhe.Ciphertext, x: HUint, y: HUint) -> HUint:
    """Per-integer select: sel_i ? x_i : y_i (sel: (count,) bit batch).
    One batched MUX over all count*width bits (2 blind rotations)."""
    assert x.width == y.width and x.count == y.count
    sel_b = tfhe.Ciphertext(
        jnp.repeat(sel.a, x.width, axis=0), jnp.repeat(sel.b, x.width),
        variance=sel.variance)
    out = tfhe.MUX(ctx, bk, sel_b, x.bits, y.bits)
    return HUint(out, x.width, x.count)


def _extend(x: HUint, width: int) -> HUint:
    """Zero-extend to `width` bits (free)."""
    if width == x.width:
        return x
    a = x.bits.a.reshape(x.count, x.width, -1)
    b = x.bits.b.reshape(x.count, x.width)
    pad = _trivial(x.count * (width - x.width), False, n=a.shape[-1])
    na = jnp.concatenate([a, pad.a.reshape(x.count, -1, a.shape[-1])], axis=1)
    nb = jnp.concatenate([b, pad.b.reshape(x.count, -1)], axis=1)
    return HUint(tfhe.Ciphertext(na.reshape(-1, na.shape[-1]), nb.reshape(-1),
                                 variance=x.bits.variance), width, x.count)


def mul(ctx, bk, x: HUint, y: HUint) -> HUint:
    """x * y mod 2^width (schoolbook partial products + batched adder tree).

    Bootstrap rounds: 1 (all W^2 partial-product ANDs in one batched blind
    rotation) + ceil(log2 W) adder-tree levels, each level ONE batched
    Kogge-Stone add over all pairs at that level."""
    assert x.width == y.width and x.count == y.count
    W, C = x.width, x.count
    xa = x.bits.a.reshape(C, W, -1)
    xb = x.bits.b.reshape(C, W)
    ya = y.bits.a.reshape(C, W, -1)
    yb = y.bits.b.reshape(C, W)

    # partial product j: (x AND broadcast(y_j)) << j, truncated to W bits
    # build all C*W*W pre-comps, one bootstrap
    xa_r = jnp.broadcast_to(xa[:, None], (C, W, W, xa.shape[-1]))
    xb_r = jnp.broadcast_to(xb[:, None], (C, W, W))
    ya_r = jnp.broadcast_to(ya[:, :, None], (C, W, W, ya.shape[-1]))
    yb_r = jnp.broadcast_to(yb[:, :, None], (C, W, W))
    xs = tfhe.Ciphertext(xa_r.reshape(-1, xa_r.shape[-1]), xb_r.reshape(-1),
                         variance=x.bits.variance)
    ys = tfhe.Ciphertext(ya_r.reshape(-1, ya_r.shape[-1]), yb_r.reshape(-1),
                         variance=y.bits.variance)
    pp = tfhe._bootstrap(ctx, bk, _pre_and(xs, ys))     # (C*W*W,)
    ppa = pp.a.reshape(C, W, W, -1)
    ppb = pp.b.reshape(C, W, W)

    # shift partial product j left by j within W bits (zero-fill)
    rows = []
    for j in range(W):
        if j == 0:
            ra, rb = ppa[:, 0], ppb[:, 0]
        else:
            pad = _trivial(C * j, False, n=ppa.shape[-1])
            ra = jnp.concatenate([pad.a.reshape(C, j, ppa.shape[-1]),
                                  ppa[:, j, : W - j]], axis=1)
            rb = jnp.concatenate([pad.b.reshape(C, j), ppb[:, j, : W - j]],
                                 axis=1)
        rows.append(HUint(tfhe.Ciphertext(ra.reshape(-1, ra.shape[-1]),
                                          rb.reshape(-1),
                                          variance=pp.variance), W, C))

    # adder tree: each level adds pairs in ONE batched Kogge-Stone call by
    # stacking the pairs along the count axis
    while len(rows) > 1:
        pairs = [(rows[i], rows[i + 1]) for i in range(0, len(rows) - 1, 2)]
        tail = rows[-1] if len(rows) % 2 else None
        lhs = _cat(*[p[0].bits for p in pairs])
        rhs = _cat(*[p[1].bits for p in pairs])
        nC = C * len(pairs)
        s, _ = _add_core(ctx, bk, lhs, rhs, nC, W)
        rows = [HUint(_slc(s, i * C * W, (i + 1) * C * W), W, C)
                for i in range(len(pairs))]
        if tail is not None:
            rows.append(tail)
    return rows[0]


# =========================================================================
# Signed integers (hint8..hint256): two's complement over the same bit
# layout — add/sub/mul-mod-2^W and equality are representation-identical,
# so HInt reuses them; only encode/decode, ordering, shifts and negation
# differ.
# =========================================================================

def encrypt_hint(ctx, sk, values, width: int, key) -> HUint:
    """Signed values in [-2^(W-1), 2^(W-1)); two's complement bits."""
    vals = np.atleast_1d(np.asarray(values, object))
    mask = (1 << width) - 1
    return encrypt_huint(ctx, sk, [int(v) & mask for v in vals], width, key)


def decrypt_hint(ctx, sk, x: HUint) -> np.ndarray:
    v = decrypt_huint(ctx, sk, x)
    half = 1 << (x.width - 1)
    full = 1 << x.width
    return np.array([int(u) - full if int(u) >= half else int(u)
                     for u in v], object)


def _msb(x: HUint) -> tfhe.Ciphertext:
    a = x.bits.a.reshape(x.count, x.width, -1)
    b = x.bits.b.reshape(x.count, x.width)
    return tfhe.Ciphertext(a[:, -1], b[:, -1], variance=x.bits.variance)


def neg(ctx, bk, x: HUint) -> HUint:
    """-x (two's complement): NOT then +1 via the carry-in path."""
    xnot = tfhe.NOT(ctx, x.bits)
    zero = _trivial(x.count * x.width, False, n=x.bits.a.shape[-1])
    one = _trivial(x.count, True, n=x.bits.a.shape[-1])
    s, _ = _add_core(ctx, bk, xnot, zero, x.count, x.width, carry_in=one)
    return HUint(s, x.width, x.count)


def abs_(ctx, bk, x: HUint) -> HUint:
    """|x| per integer (MUX on the sign bit)."""
    return mux(ctx, bk, _msb(x), neg(ctx, bk, x), x)


def ge_signed(ctx, bk, x: HUint, y: HUint) -> tfhe.Ciphertext:
    """Encrypted signed (x >= y): same-sign -> unsigned compare; different
    signs -> x >= y iff y is the negative one."""
    assert x.width == y.width and x.count == y.count
    geu = ge(ctx, bk, x, y)                      # no-borrow of x - y
    sx, sy = _msb(x), _msb(y)
    same = tfhe.XNOR(ctx, bk, sx, sy)
    return tfhe.MUX(ctx, bk, same, geu, sy)


def shift_right_arith(ctx, x: HUint, k: int) -> HUint:
    """x >> k replicating the sign bit (free — bit positions move)."""
    if k == 0:
        return x
    k = min(k, x.width - 1)
    a = x.bits.a.reshape(x.count, x.width, -1)
    b = x.bits.b.reshape(x.count, x.width)
    sa = jnp.broadcast_to(a[:, -1:], (x.count, k, a.shape[-1]))
    sb = jnp.broadcast_to(b[:, -1:], (x.count, k))
    na = jnp.concatenate([a[:, k:], sa], axis=1)
    nb = jnp.concatenate([b[:, k:], sb], axis=1)
    ct = tfhe.Ciphertext(na.reshape(-1, na.shape[-1]), nb.reshape(-1),
                         variance=x.bits.variance)
    return HUint(ct, x.width, x.count)
