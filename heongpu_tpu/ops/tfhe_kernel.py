"""Fused Pallas TPU kernel for the TFHE blind rotation (the n=512 CMux chain).

The jnp path in models/tfhe.py runs the chain as a lax.fori_loop whose body
lowers to ~40 small XLA kernels per iteration — at 512 iterations the launch
overhead and HBM round-trips dominate (measured 91 ms per gate batch).  This
kernel runs the ENTIRE chain in one pallas_call: the accumulator lives in
VMEM for all 512 steps, the bootstrapping key streams from HBM with a
double-buffered DMA, and each step's omega product / INTT / gadget decompose
/ forward NTT / external product are straight-line VPU code.

Reference analog: tfhe_bootstrapping_kernel_regular_step1/2
(src/lib/kernel/bootstrapping.cu:166-192 + small_ntt.cu shared-memory NTT) —
there the GPU launches 2 kernels per iteration; here the TPU launches ONE
kernel per bootstrap.

Layout ("kernel layout"): each length-1024 polynomial is a (32, 32) matrix
(i1 = sublanes, i2 = lanes); independent polys are packed side-by-side along
lanes.  A tensor of P polys over L limbs for a batch tile Bt is
(32, L*Bt*P*32) — every butterfly stage is a full-width VPU op along
sublanes, and the only shuffle is one 32x32 transpose per NTT (the four-step
structure of ops/ntt.py, bit-compatible with its tables and storage order).

The batch is tiled over a sequential grid (Bt gates per program) to bound
VMEM: temporaries are (32, 2048)-ish uint32 arrays at Bt=8.
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from . import modmath as mm

N1 = 32
N2 = 32
N = N1 * N2          # 1024
L = 2                # CRT limb pair
P = 2                # TRLWE polys (a, b)
LDIG = 2             # gadget digits per poly
R = P * LDIG         # digit rows
BG_BIT = 10
BG = 1 << BG_BIT
RENORM = 8


# ---------------------------------------------------------------------------
# host-side layout converters (jnp, cheap, outside the kernel)
# ---------------------------------------------------------------------------

def to_kernel_layout(x):
    """(..., N) -> (32, prod(...)*32): poly -> (i1 sublane, i2 lane) blocks.
    Works for both coefficient and NTT-domain arrays (both are stored as
    (first-axis-major, 32x32) by ops/ntt.py)."""
    lead = x.shape[:-1]
    g = int(np.prod(lead)) if lead else 1
    y = x.reshape((g, N1, N2))
    return jnp.transpose(y, (1, 0, 2)).reshape(N1, g * N2)


def from_kernel_layout(x, lead):
    g = int(np.prod(lead)) if lead else 1
    y = x.reshape(N1, g, N2)
    return jnp.transpose(y, (1, 0, 2)).reshape(lead + (N,))


def prep_tables(ctx):
    """Pack the context's NTT/omega tables into kernel-layout device arrays.
    Returns a dict of arrays passed to blind_rotate()."""
    tb = ctx.ntt
    pack_big = lambda a: to_kernel_layout(a)          # (L, N) -> (32, L*32)

    def pack_stages(tws):
        """list of (L, 2^(s-1)) -> (S, L, 16) padded."""
        S = len(tws)
        out = np.zeros((S, L, N1 // 2), np.uint32)
        for s, t in enumerate(tws):
            out[s, :, : t.shape[1]] = np.asarray(t)
        return jnp.asarray(out)

    scal = np.zeros((16,), np.uint32)
    scal[0:2] = np.asarray(tb.p)
    scal[2:4] = np.asarray(tb.pinv)
    scal[4:6] = np.asarray(tb.mu)
    scal[6:8] = np.asarray(tb.r1)
    scal[8] = np.uint32(ctx.offset)
    scal[9] = np.uint32(ctx.p1_inv_p2)
    scal[10] = np.uint32(ctx.p1_inv_p2_sh)
    scal[11] = np.uint32(ctx.p1p2_mod32)
    scal[12] = np.uint32(ctx.p1p2_half_hi)
    scal[13] = np.uint32(ctx.p1p2_half_lo)

    return dict(
        scal=jnp.asarray(scal),
        twm=pack_big(tb.tw_mat), twm_sh=pack_big(tb.tw_mat_sh),
        itwm=pack_big(tb.itw_mat), itwm_sh=pack_big(tb.itw_mat_sh),
        tw1=pack_stages(tb.tw1), tw1_sh=pack_stages(tb.tw1_sh),
        tw2=pack_stages(tb.tw2), tw2_sh=pack_stages(tb.tw2_sh),
        itw1=pack_stages(tb.itw1), itw1_sh=pack_stages(tb.itw1_sh),
        itw2=pack_stages(tb.itw2), itw2_sh=pack_stages(tb.itw2_sh),
        omega=to_kernel_layout(ctx.omega_bits),        # (32, G*4*L*32)
    )


def prep_bk(bk_arr):
    """BootKey.bk (n, R, P, L, N) -> (n, P, 32, L*R*32) kernel-layout stream."""
    n = bk_arr.shape[0]
    y = bk_arr.reshape(n, R, P, L, N1, N2)
    y = jnp.transpose(y, (0, 2, 4, 3, 1, 5))          # (n, P, 32, L, R, 32)
    return y.reshape(n, P, N1, L * R * N2)


def prep_bk2(bk2_arr):
    """BootKey2.bk2 (n/2, 3, R, P, L, N) -> (n/2, 3, P, 32, L*R*32) stream."""
    n2 = bk2_arr.shape[0]
    y = bk2_arr.reshape(n2, 3, R, P, L, N1, N2)
    y = jnp.transpose(y, (0, 1, 3, 5, 4, 2, 6))       # (n2, 3, P, 32, L, R, 32)
    return y.reshape(n2, 3, P, N1, L * R * N2)


# ---------------------------------------------------------------------------
# kernel helpers (pure jnp on uint32; run inside pallas)
# ---------------------------------------------------------------------------

def _limb_consts(scal_ref, idx):
    return scal_ref[idx], scal_ref[idx + 1]


def _stages_fwd(y, tws_ref, tws_sh_ref, p_l, Bt, rest):
    """GS/DIF stages along sublanes of (32, L*rest); twiddles vary per limb.
    tws_ref: (S, L, 16) padded.  Harvey-lazy: values in [0, 2p) across
    stages; callers reduce at the NTT boundary (see ops/ntt.py)."""
    S = 5
    p2 = p_l + p_l
    for s in reversed(range(1, S + 1)):
        m = 1 << s
        half = m // 2
        z = y.reshape(N1 // m, m, L, rest)
        u = z[:, :half]
        v = z[:, half:]
        tw = tws_ref[s - 1, :, :half]                 # (L, half)
        tw_sh = tws_sh_ref[s - 1, :, :half]
        twb = jnp.transpose(tw)[None, :, :, None]     # (1, half, L, 1)
        twsb = jnp.transpose(tw_sh)[None, :, :, None]
        add = mm.cond_sub(u + v, p2)
        t = mm.shoup_mul_lazy((u + p2) - v, twb, twsb, p_l)
        y = jnp.concatenate([add, t], axis=1).reshape(N1, L * rest)
    return y


def _stages_inv(y, tws_ref, tws_sh_ref, p_l, Bt, rest):
    """CT/DIT stages along sublanes, Harvey-lazy like _stages_fwd."""
    S = 5
    p2 = p_l + p_l
    for s in range(1, S + 1):
        m = 1 << s
        half = m // 2
        z = y.reshape(N1 // m, m, L, rest)
        u = z[:, :half]
        v = z[:, half:]
        tw = tws_ref[s - 1, :, :half]
        tw_sh = tws_sh_ref[s - 1, :, :half]
        twb = jnp.transpose(tw)[None, :, :, None]
        twsb = jnp.transpose(tw_sh)[None, :, :, None]
        t = mm.shoup_mul_lazy(v, twb, twsb, p_l)
        y = jnp.concatenate(
            [mm.cond_sub(u + t, p2), mm.cond_sub((u + p2) - t, p2)],
            axis=1).reshape(N1, L * rest)
    return y


def _stages_merged_ct(y, tws_ref, tws_sh_ref, p_l, rest):
    """Merged-negacyclic CT stages along sublanes of (32, L*rest): natural
    in, bit-reversed out, psi pre-scale absorbed (ops/ntt.py semantics).
    Stage s has m = 2^(s-1) twiddles (padded to 16 in tws_ref)."""
    S = 5
    p2 = p_l + p_l
    for s in range(1, S + 1):
        m = 1 << (s - 1)
        t = N1 // (2 * m)
        z = y.reshape(m, 2, t, L, rest)
        u = z[:, 0]
        v = z[:, 1]
        tw = tws_ref[s - 1, :, :m]                    # (L, m)
        tw_sh = tws_sh_ref[s - 1, :, :m]
        twb = jnp.transpose(tw)[:, None, :, None]     # (m, 1, L, 1)
        twsb = jnp.transpose(tw_sh)[:, None, :, None]
        tt = mm.shoup_mul_lazy(v, twb, twsb, p_l)
        add = mm.cond_sub(u + tt, p2)
        sub = mm.cond_sub((u + p2) - tt, p2)
        y = jnp.stack([add, sub], axis=1).reshape(N1, L * rest)
    return y


def _stages_merged_gs(y, tws_ref, tws_sh_ref, p_l, rest):
    """Merged-negacyclic GS stages along sublanes: bit-reversed in, natural
    out (inverse; psi^{-r} absorbed, n^{-1} folded into itw_mat)."""
    S = 5
    p2 = p_l + p_l
    for s in reversed(range(1, S + 1)):
        m = 1 << (s - 1)
        t = N1 // (2 * m)
        z = y.reshape(m, 2, t, L, rest)
        u = z[:, 0]
        v = z[:, 1]
        tw = tws_ref[s - 1, :, :m]
        tw_sh = tws_sh_ref[s - 1, :, :m]
        twb = jnp.transpose(tw)[:, None, :, None]
        twsb = jnp.transpose(tw_sh)[:, None, :, None]
        add = mm.cond_sub(u + v, p2)
        tt = mm.shoup_mul_lazy((u + p2) - v, twb, twsb, p_l)
        y = jnp.stack([add, tt], axis=1).reshape(N1, L * rest)
    return y


def _transpose_blocks(y, rest):
    """Per-poly 32x32 transpose: (32, L*rest) with rest = g*32."""
    g = rest // N2
    z = y.reshape(N1, L * g, N2)
    return jnp.transpose(z, (2, 1, 0)).reshape(N1, L * g * N2)


def _big_expand(t_ref, rest):
    """(32, L*32) table -> broadcast over the per-limb group: (32, L*rest)."""
    g = rest // N2
    z = t_ref[:].reshape(N1, L, 1, N2)
    return jnp.broadcast_to(z, (N1, L, g, N2)).reshape(N1, L * rest)


def _ntt_fwd_k(y, refs, p_l, rest):
    # stage/elementwise ops below view lanes as (L, rest); the merged
    # stages absorb the psi pre-scale (ops/ntt.py semantics)
    p4 = p_l.reshape(1, 1, L, 1)
    y = _stages_merged_ct(y, refs["tw1"], refs["tw1_sh"], p4, rest)
    y = mm.shoup_mul_lazy(y.reshape(N1, L, rest),
                          _big_expand(refs["twm"], rest).reshape(N1, L, rest),
                          _big_expand(refs["twm_sh"], rest).reshape(N1, L, rest),
                          p_l.reshape(1, L, 1)).reshape(N1, L * rest)
    y = _transpose_blocks(y, rest)
    y = _stages_fwd(y, refs["tw2"], refs["tw2_sh"], p4, None, rest)
    # deferred reduction: keep the kernel's NTT boundary exact (< p) for the
    # mont_mul / sub_mod consumers in the CMux chain
    return mm.cond_sub(y.reshape(N1, L, rest),
                       p_l.reshape(1, L, 1)).reshape(N1, L * rest)


def _ntt_inv_k(y, refs, p_l, rest):
    p4 = p_l.reshape(1, 1, L, 1)
    y = _stages_inv(y, refs["itw2"], refs["itw2_sh"], p4, None, rest)
    y = _transpose_blocks(y, rest)
    y = mm.shoup_mul_lazy(y.reshape(N1, L, rest),
                          _big_expand(refs["itwm"], rest).reshape(N1, L, rest),
                          _big_expand(refs["itwm_sh"], rest).reshape(N1, L, rest),
                          p_l.reshape(1, L, 1)).reshape(N1, L * rest)
    y = _stages_merged_gs(y, refs["itw1"], refs["itw1_sh"], p4, rest)
    # n^{-1}·psi^{-i} folded into itw_mat/itw1; one deferred reduction
    return mm.cond_sub(y.reshape(N1, L, rest),
                       p_l.reshape(1, L, 1)).reshape(N1, L * rest)


def _to_torus(y, scal, rest):
    """(32, L*rest) residues -> (32, rest) torus32 (CRT pair reconstruction;
    mirror of models/tfhe._rns_to_torus)."""
    z = y.reshape(N1, L, rest)
    r1 = z[:, 0]
    r2 = z[:, 1]
    p1 = scal[0]
    p2 = scal[1]
    mu2 = scal[5]
    t = mm.sub_mod(r2, mm.barrett32(r1, p2, mu2), p2)
    t = mm.shoup_mul(t, scal[9], scal[10], p2)
    hi, lo = mm.widening_mul(t, p1)
    lo2 = lo + r1
    hi = hi + (lo2 < lo).astype(jnp.uint32)
    ge = jnp.logical_or(hi > scal[12],
                        jnp.logical_and(hi == scal[12], lo2 >= scal[13]))
    v = lo2  # value mod 2^32
    return jnp.where(ge, v - scal[11], v)


def _to_rns(x, scal, rest):
    """(32, rest) torus32 -> (32, L*rest) residues (centered semantics)."""
    neg = x >= jnp.uint32(1 << 31)
    mag = jnp.where(neg, jnp.uint32(0) - x, x)
    outs = []
    for li in range(L):
        p = scal[li]
        mu = scal[4 + li]
        m = mm.barrett32(mag, p, mu)
        outs.append(jnp.where(neg, mm.neg_mod(m, p), m))
    return jnp.stack(outs, axis=1).reshape(N1, L * rest)


def _decompose_k(d, scal, Bt):
    """(32, Bt*P*32) torus -> digit rows (32, Bt*R*32) int32 in [-BG/2,BG/2)
    with row order (poly, digit) matching BootKey.bk."""
    u = d + scal[8]
    z = u.reshape(N1, Bt * P, N2)
    digs = []
    for pd in range(LDIG):
        sh = 32 - (pd + 1) * BG_BIT
        digs.append(((z >> sh) & jnp.uint32(BG - 1)).astype(jnp.int32)
                    - BG // 2)
    out = jnp.stack(digs, axis=2)                      # (32, Bt*P, l, 32)
    return out.reshape(N1, Bt * R * N2)


def _signed_to_rns_k(d, scal, rest):
    """(32, rest) int32 digits -> (32, L*rest) residues."""
    neg = d < 0
    mag = jnp.abs(d).astype(jnp.uint32)
    outs = []
    for li in range(L):
        p = scal[li]
        m = jnp.where(mag >= p, mag - p, mag)          # |d| <= BG/2 << p
        outs.append(jnp.where(neg, mm.neg_mod(m, p), m))
    return jnp.stack(outs, axis=1).reshape(N1, L * rest)


# ---------------------------------------------------------------------------
# the kernel
# ---------------------------------------------------------------------------

def _chain(n, Bt, acc0, a_ref, scal_ref,
           twm, twm_sh, itwm, itwm_sh, tw1, tw1_sh, tw2, tw2_sh,
           itw1, itw1_sh, itw2, itw2_sh, omega, bk_hbm,
           bk_buf, sem):
    refs = dict(twm=twm, twm_sh=twm_sh, itwm=itwm, itwm_sh=itwm_sh,
                tw1=tw1[:], tw1_sh=tw1_sh[:], tw2=tw2[:], tw2_sh=tw2_sh[:],
                itw1=itw1[:], itw1_sh=itw1_sh[:], itw2=itw2[:],
                itw2_sh=itw2_sh[:])
    scal = scal_ref
    rest_acc = Bt * P * N2
    rest_dig = Bt * R * N2
    p_l = jnp.stack([scal[0], scal[1]])
    pinv_l = jnp.stack([scal[2], scal[3]])
    pacc = p_l.reshape(1, L, 1, 1, 1)
    pinvacc = pinv_l.reshape(1, L, 1, 1, 1)

    G = 6  # omega radix-4 digit tables (11 bits of amt)

    def get_dma(slot, i):
        return pltpu.make_async_copy(bk_hbm.at[i], bk_buf.at[slot], sem.at[slot])

    get_dma(0, 0).start()

    omega_t = omega[:].reshape(N1, G, 4, L, N2)        # mont tables

    def sel4(g, dig):
        """Digit-select table entry g: dig (1,1,Bt,1) -> (N1, L, Bt, N2)."""
        t = [omega_t[:, g, c].reshape(N1, L, 1, N2) for c in range(4)]
        w = jnp.where(dig == 1, t[1], t[0])
        w = jnp.where(dig == 2, t[2], w)
        return jnp.where(dig == 3, t[3], w)

    def body(i, acc):
        # prefetch next bk slice
        @pl.when(i + 1 < n)
        def _():
            get_dma((i + 1) % 2, i + 1).start()
        get_dma(i % 2, i).wait()

        a_row = a_ref[:, pl.ds(i, 1)]                  # (Bt, 1) int32 in [0,2N)

        # omega = mont(X^a) per (limb, batch): product of 6 digit tables
        p_w = p_l.reshape(1, L, 1, 1)
        pinv_w = pinv_l.reshape(1, L, 1, 1)
        w = sel4(0, (a_row & 3).reshape(1, 1, Bt, 1))
        for g in range(1, G):
            dig = ((a_row >> (2 * g)) & 3).reshape(1, 1, Bt, 1)
            w = mm.mont_mul(w, sel4(g, dig), p_w, pinv_w)

        # CMux: diff = X^a * acc - acc   (NTT domain)
        acc_v = acc.reshape(N1, L, Bt, P, N2)
        rot = mm.mont_mul(acc_v, w[:, :, :, None, :], pacc, pinvacc)
        diff = mm.sub_mod(rot, acc_v, pacc).reshape(N1, L * rest_acc)

        # back to torus coefficients
        dt = _to_torus(_ntt_inv_k(diff, refs, p_l, rest_acc), scal, rest_acc)

        # gadget decompose -> digit rows -> NTT
        digs = _decompose_k(dt, scal, Bt)
        dr = _signed_to_rns_k(digs, scal, rest_dig)
        D = _ntt_fwd_k(dr, refs, p_l, rest_dig)        # (32, L*Bt*R*32)

        # external product: acc += sum_r D_r * bk[i][r]
        Dv = D.reshape(N1, L, Bt, R, N2)
        bk_i = bk_buf[i % 2]                           # (P, 32, L*R*32)
        ext = []
        for c in range(P):
            bkc = bk_i[c].reshape(N1, L, 1, R, N2)
            prod = mm.mont_mul(Dv, bkc, p_l.reshape(1, L, 1, 1, 1),
                               pinv_l.reshape(1, L, 1, 1, 1))
            ext.append(_sum_mod(prod, p_l.reshape(1, L, 1, 1)))
        extv = jnp.stack(ext, axis=3)                  # (32, L, Bt, P, 32)
        acc_v = mm.add_mod(acc.reshape(N1, L, Bt, P, N2), extv, pacc)
        acc = acc_v.reshape(N1, L * rest_acc)

        # periodic renormalisation of the integer representative
        def renorm(a):
            t = _to_torus(_ntt_inv_k(a, refs, p_l, rest_acc), scal, rest_acc)
            return _ntt_fwd_k(_to_rns(t, scal, rest_acc), refs, p_l, rest_acc)

        acc = jax.lax.cond((i + 1) % RENORM == 0, renorm, lambda a: a, acc)
        return acc

    return jax.lax.fori_loop(0, n, body, acc0)


def _sum_mod(prod, p):
    """Sum digit rows mod p: prod (32, L, Bt, R, 32) -> (32, L, Bt, 32)."""
    acc = prod[:, :, :, 0]
    for r in range(1, R):
        acc = mm.add_mod(acc, prod[:, :, :, r], p)
    return acc


RENORM2 = 4  # pair-steps between renormalisations (= 8 single-step units)


def _chain2(n2, Bt, acc0, a_ref, scal_ref,
            twm, twm_sh, itwm, itwm_sh, tw1, tw1_sh, tw2, tw2_sh,
            itw1, itw1_sh, itw2, itw2_sh, omega, bk_hbm, bk_buf, sem):
    """2-bit key-unrolled CMux chain: n/2 sequential steps, each consuming a
    TGSW triple (B0, B1, B01) and applying
      acc += <D(acc), B0>·u0 + <D(acc), B1>·u1 + <D(acc), B01>·u0·u1,
    u_j = X^a_j − 1 (see models/tfhe.BootKey2).  One decompose + NTT round
    per TWO secret bits — the sequential-latency lever the reference lacks."""
    refs = dict(twm=twm, twm_sh=twm_sh, itwm=itwm, itwm_sh=itwm_sh,
                tw1=tw1[:], tw1_sh=tw1_sh[:], tw2=tw2[:], tw2_sh=tw2_sh[:],
                itw1=itw1[:], itw1_sh=itw1_sh[:], itw2=itw2[:],
                itw2_sh=itw2_sh[:])
    scal = scal_ref
    rest_acc = Bt * P * N2
    rest_dig = Bt * R * N2
    p_l = jnp.stack([scal[0], scal[1]])
    pinv_l = jnp.stack([scal[2], scal[3]])
    r1_l = jnp.stack([scal[6], scal[7]])
    pacc = p_l.reshape(1, L, 1, 1, 1)

    G = 6
    p_w = p_l.reshape(1, L, 1, 1)
    pinv_w = pinv_l.reshape(1, L, 1, 1)
    r1_w = r1_l.reshape(1, L, 1, 1)

    def get_dma(slot, i):
        return pltpu.make_async_copy(bk_hbm.at[i], bk_buf.at[slot], sem.at[slot])

    get_dma(0, 0).start()

    omega_t = omega[:].reshape(N1, G, 4, L, N2)

    def sel4(g, dig):
        t = [omega_t[:, g, c].reshape(N1, L, 1, N2) for c in range(4)]
        w = jnp.where(dig == 1, t[1], t[0])
        w = jnp.where(dig == 2, t[2], w)
        return jnp.where(dig == 3, t[3], w)

    def omega_of(a_row):
        w = sel4(0, (a_row & 3).reshape(1, 1, Bt, 1))
        for g in range(1, G):
            dig = ((a_row >> (2 * g)) & 3).reshape(1, 1, Bt, 1)
            w = mm.mont_mul(w, sel4(g, dig), p_w, pinv_w)
        return w

    def body(i, acc):
        @pl.when(i + 1 < n2)
        def _():
            get_dma((i + 1) % 2, i + 1).start()
        get_dma(i % 2, i).wait()

        a0 = a_ref[:, pl.ds(2 * i, 1)]                 # (Bt, 1)
        a1 = a_ref[:, pl.ds(2 * i + 1, 1)]
        u0 = mm.sub_mod(omega_of(a0), r1_w, p_w)       # mont(X^a0 − 1)
        u1 = mm.sub_mod(omega_of(a1), r1_w, p_w)
        u01 = mm.mont_mul(u0, u1, p_w, pinv_w)

        # decompose acc -> digit rows -> NTT (one round per TWO bits)
        dt = _to_torus(_ntt_inv_k(acc, refs, p_l, rest_acc), scal, rest_acc)
        digs = _decompose_k(dt, scal, Bt)
        dr = _signed_to_rns_k(digs, scal, rest_dig)
        D = _ntt_fwd_k(dr, refs, p_l, rest_dig)
        Dv = D.reshape(N1, L, Bt, R, N2)

        bk_i = bk_buf[i % 2]                           # (3, P, 32, L*R*32)
        p5 = p_l.reshape(1, L, 1, 1, 1)
        pinv5 = pinv_l.reshape(1, L, 1, 1, 1)
        p4 = p_l.reshape(1, L, 1, 1)
        ext = []
        for c in range(P):
            term = None
            for j, u in ((0, u0), (1, u1), (2, u01)):
                bkc = bk_i[j, c].reshape(N1, L, 1, R, N2)
                e = _sum_mod(mm.mont_mul(Dv, bkc, p5, pinv5), p4)
                su = mm.mont_mul(e, u, p_w, pinv_w)
                term = su if term is None else mm.add_mod(term, su, p4)
            ext.append(term)
        extv = jnp.stack(ext, axis=3)                  # (32, L, Bt, P, 32)
        acc_v = mm.add_mod(acc.reshape(N1, L, Bt, P, N2), extv, pacc)
        acc = acc_v.reshape(N1, L * rest_acc)

        def renorm(a):
            t = _to_torus(_ntt_inv_k(a, refs, p_l, rest_acc), scal, rest_acc)
            return _ntt_fwd_k(_to_rns(t, scal, rest_acc), refs, p_l, rest_acc)

        acc = jax.lax.cond((i + 1) % RENORM2 == 0, renorm, lambda a: a, acc)
        return acc

    return jax.lax.fori_loop(0, n2, body, acc0)


@functools.partial(jax.jit, static_argnames=("n", "Bt", "interpret"))
def blind_rotate2(acc_k, a_t, bk2_stream, tables, n: int, Bt: int = 8,
                  interpret: bool = False):
    """Key-unrolled blind rotation: n/2 chain steps over TGSW triples.
    Same layouts as blind_rotate (a_t is (B, n)); bk2_stream from prep_bk2."""
    lanes = acc_k.shape[1]
    B = lanes // (L * P * N2)
    assert B % Bt == 0, (B, Bt)
    progs = B // Bt
    t = tables

    grid_names = ["twm", "twm_sh",
                  "itwm", "itwm_sh", "tw1", "tw1_sh", "tw2", "tw2_sh",
                  "itw1", "itw1_sh", "itw2", "itw2_sh", "omega"]

    accv = acc_k.reshape(N1, L, B, P * N2)
    accb = jnp.transpose(accv, (0, 2, 1, 3)).reshape(N1, B * L * P * N2)

    def acc_map(b):
        return (0, b)

    # a laid out (B, n): batch tile on sublanes (see blind_rotate)
    in_specs = [
        pl.BlockSpec((Bt, n), lambda b: (b, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((N1, Bt * L * P * N2), acc_map, memory_space=pltpu.VMEM),
        pl.BlockSpec(memory_space=pltpu.SMEM),
    ]
    args = [a_t, accb, t["scal"]]
    for name in grid_names:
        in_specs.append(pl.BlockSpec(memory_space=pltpu.VMEM))
        args.append(t[name])
    in_specs.append(pl.BlockSpec(memory_space=pl.ANY))
    args.append(bk2_stream)

    def wrapped(a_ref, accb_ref, scal_ref, *rest):
        bk_hbm = rest[-4]
        out_ref = rest[-3]
        bk_buf = rest[-2]
        sem = rest[-1]
        table_refs = rest[:-4]
        accb_ = accb_ref[:]
        accv_ = accb_.reshape(N1, Bt, L, P * N2)
        acc0 = jnp.transpose(accv_, (0, 2, 1, 3)).reshape(N1, L * Bt * P * N2)
        final = _chain2(n // 2, Bt, acc0, a_ref, scal_ref, *table_refs,
                        bk_hbm, bk_buf, sem)
        fv = final.reshape(N1, L, Bt, P * N2)
        out_ref[:] = jnp.transpose(fv, (0, 2, 1, 3)).reshape(
            N1, Bt * L * P * N2)

    out = pl.pallas_call(
        wrapped,
        grid=(progs,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((N1, Bt * L * P * N2), acc_map,
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((N1, B * L * P * N2), jnp.uint32),
        scratch_shapes=[
            pltpu.VMEM((2, 3, P, N1, L * R * N2), jnp.uint32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        interpret=interpret,
    )(*args)

    outv = out.reshape(N1, B, L, P * N2)
    return jnp.transpose(outv, (0, 2, 1, 3)).reshape(N1, lanes)


@functools.partial(jax.jit,
                   static_argnames=("n", "Bt", "interpret"))
def blind_rotate(acc_k, a_t, bk_stream, tables, n: int, Bt: int = 8,
                 interpret: bool = False):
    """Run the full n-step CMux chain.

    acc_k: (32, L*B*P*32) initial accumulator, kernel layout, NTT domain.
    a_t: (B, n) int32 mod-switched rotation amounts.
    bk_stream: (n, P, 32, L*R*32) from prep_bk.
    tables: dict from prep_tables.
    Returns the final accumulator in the same layout/domain."""
    lanes = acc_k.shape[1]
    B = lanes // (L * P * N2)
    assert B % Bt == 0, (B, Bt)
    progs = B // Bt

    t = tables

    grid_names = ["twm", "twm_sh",
                  "itwm", "itwm_sh", "tw1", "tw1_sh", "tw2", "tw2_sh",
                  "itw1", "itw1_sh", "itw2", "itw2_sh", "omega"]

    # acc columns per program: the lane order is (limb, batch, poly, i2), so a
    # batch tile is NOT contiguous in lanes.  Reorder to (batch, limb, poly)
    # so each program's slice is contiguous, then restore after.
    accv = acc_k.reshape(N1, L, B, P * N2)
    accb = jnp.transpose(accv, (0, 2, 1, 3)).reshape(N1, B * L * P * N2)

    def acc_map(b):
        return (0, b)

    # a laid out (B, n): a (Bt, n) block keeps the batch tile on sublanes
    # (Mosaic rejects lane blocks narrower than 128, i.e. (n, Bt))
    in_specs = [
        pl.BlockSpec((Bt, n), lambda b: (b, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((N1, Bt * L * P * N2), acc_map, memory_space=pltpu.VMEM),
        pl.BlockSpec(memory_space=pltpu.SMEM),
    ]
    args = [a_t, accb, t["scal"]]
    for name in grid_names:
        in_specs.append(pl.BlockSpec(memory_space=pltpu.VMEM))
        args.append(t[name])
    in_specs.append(pl.BlockSpec(memory_space=pl.ANY))
    args.append(bk_stream)

    out = pl.pallas_call(
        _make_kernel(n, Bt),
        grid=(progs,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((N1, Bt * L * P * N2), acc_map,
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((N1, B * L * P * N2), jnp.uint32),
        scratch_shapes=[
            pltpu.VMEM((2, P, N1, L * R * N2), jnp.uint32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        interpret=interpret,
    )(*args)

    outv = out.reshape(N1, B, L, P * N2)
    return jnp.transpose(outv, (0, 2, 1, 3)).reshape(N1, lanes)


def _make_kernel(n, Bt):
    """Pallas kernel: per-program acc block arrives batch-major; convert to
    the chain's (limb, batch, poly) lane order, run the CMux chain, restore."""
    def wrapped(a_ref, accb_ref, scal_ref, *rest):
        bk_hbm = rest[-4]
        out_ref = rest[-3]
        bk_buf = rest[-2]
        sem = rest[-1]
        table_refs = rest[:-4]

        accb = accb_ref[:]
        accv = accb.reshape(N1, Bt, L, P * N2)
        acc0 = jnp.transpose(accv, (0, 2, 1, 3)).reshape(N1, L * Bt * P * N2)

        final = _chain(n, Bt, acc0, a_ref, scal_ref, *table_refs,
                       bk_hbm, bk_buf, sem)

        fv = final.reshape(N1, L, Bt, P * N2)
        out_ref[:] = jnp.transpose(fv, (0, 2, 1, 3)).reshape(
            N1, Bt * L * P * N2)
    return wrapped
