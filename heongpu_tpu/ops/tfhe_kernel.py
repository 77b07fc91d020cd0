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

Mosaic-legal layout (v2).  The first version of this kernel viewed lanes as
rank-5 tensors ((32, L*Bt*P*32) -> (32, L, Bt, P, 32) shape casts), which
Mosaic rejects on real TPU.  This version never splits the lane dimension:

  * Every tensor is 2D (sublanes, W) with W = L*Bt*P*32 lanes per grid
    program, lane order (limb, batch, poly, j).  Only SUBLANE splits (the
    proven ops/ntt_pallas.py idiom) appear in reshapes.
  * Per-(limb/poly/position) variation is pre-expanded on the host into
    full-width lane-pattern tables (twiddles, omega monomials, moduli).
  * Cross-lane data movement (the four-step NTT's 32x32 transpose, digit/
    poly mixing in the external product, CRT limb pairing) is done with
    masked lane ROTATIONS (pltpu.roll): partner(x, t)[j] = x[j ^ t] for
    power-of-two t, i.e. two global rolls + one select — no transposes, no
    gathers, no lane reshapes.
  * The four-step NTT therefore runs stage-1 butterflies along sublanes and
    stage-2 butterflies along lanes-within-a-poly (roll butterflies), with
    the SAME tables and bit-identical results as ops/ntt.py; only the
    in-kernel storage of the intermediate is transposed, which no
    coefficient-domain (elementwise) consumer observes.
  * The bootstrapping key is pre-broadcast over the batch tile into HBM
    kernel layout (prep_bk): ~256 MB for STD128 at Bt=8; per-step slices
    (512 KB) double-buffer cleanly under the chain's VPU work.

The batch is tiled over a sequential grid (Bt gates per program).
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
RENORM = 8           # CMux steps between integer-representative renorms
RENORM2 = 4          # pair-steps (= 8 single-bit units) for the unrolled chain

# packed row offsets of the per-stage sublane twiddles (stage s uses
# m/2 = 2^(s-1) rows); total 31 rows
_SUB_OFF = {5: 0, 4: 16, 3: 24, 2: 28, 1: 30}


def lane_width(Bt: int) -> int:
    return L * Bt * P * N2


# ---------------------------------------------------------------------------
# host-side layout converters / table packing (jnp or numpy, outside kernel)
# ---------------------------------------------------------------------------

def prep_acc(acc, Bt: int):
    """(B, P, L, N) NTT-domain -> (32, progs*W) kernel layout.

    Kernel sublane = NTT-storage position // 32 (the four-step's second-axis
    output index), lane block order per program = (limb, batch, poly, pos%32).
    """
    B = acc.shape[0]
    progs = B // Bt
    x = acc.reshape(progs, Bt, P, L, N1, N2)
    x = jnp.transpose(x, (4, 0, 3, 1, 2, 5))      # (32, progs, L, Bt, P, 32)
    return x.reshape(N1, progs * lane_width(Bt))


def unprep_acc(x, B: int, Bt: int):
    """(32, progs*W) -> (B, P, L, N)."""
    progs = B // Bt
    y = x.reshape(N1, progs, L, Bt, P, N2)
    y = jnp.transpose(y, (1, 3, 4, 2, 0, 5))      # (progs, Bt, P, L, 32, 32)
    return y.reshape(B, P, L, N)


def prep_a(a_t, Bt: int, two_n: int):
    """(B, n) rotation amounts -> (progs*n, W) int32, each step row holding
    its batch element's amount broadcast across that element's lanes.
    (int16 would halve the block, but Mosaic requires dynamic sublane
    indices into 16-bit memrefs to be 16-aligned — per-step rows aren't.)"""
    B, n = a_t.shape
    progs = B // Bt
    a = (a_t.astype(jnp.int32) % two_n).reshape(progs, Bt, n)
    a = jnp.transpose(a, (0, 2, 1))               # (progs, n, Bt)
    a = jnp.broadcast_to(a[:, :, None, :, None, None],
                         (progs, n, L, Bt, P, N2))
    return a.reshape(progs * n, lane_width(Bt))


def _diag_key(x):
    """x (n, c, d, c', L, 32, 32) -> K (n, d, k, c', L, 32, 32) with
    K[:, d, k, c'] = x[:, c'^k, d, c'] (P=2)."""
    K0 = jnp.stack([x[:, 0, :, 0], x[:, 1, :, 1]], axis=2)
    K1 = jnp.stack([x[:, 1, :, 0], x[:, 0, :, 1]], axis=2)
    return jnp.stack([K0, K1], axis=2)            # (n, d, k, c', L, 32, 32)


def _expand_key(K, Bt: int):
    """(n, d, k, c', L, 32, 32) -> (n, d, k, 32, W): broadcast over the batch
    tile and order lanes (l, b, c', j)."""
    n = K.shape[0]
    K = jnp.transpose(K, (0, 1, 2, 5, 4, 3, 6))   # (n, d, k, 32, L, c', 32)
    K = jnp.broadcast_to(K[:, :, :, :, :, None],
                         (n, LDIG, P, N1, L, Bt, P, N2))
    return K.reshape(n, LDIG, P, N1, lane_width(Bt))


def prep_bk(bk_arr, Bt: int = 8):
    """BootKey.bk (n, R, P, L, N) -> (n, d, k, 32, W) kernel-layout stream.

    K[i, d, k][q2, (l, b, c', q1)] = bk[i, row=(c'^k)*LDIG+d, c', l, q2*32+q1]
    so the kernel's external product is   acc'[c'] += sum_{d,k}
    NTT(dig_d)[c'^k] * K[i,d,k]   with the c'^k swap done by a lane roll."""
    n = bk_arr.shape[0]
    x = bk_arr.reshape(n, P, LDIG, P, L, N1, N2)  # (i, c, d, c', l, q2, q1)
    return _expand_key(_diag_key(x), Bt)


def prep_bk2(bk2_arr, Bt: int = 8):
    """BootKey2.bk2 (n/2, 3, R, P, L, N) -> (n/2, 3, d, k, 32, W) stream."""
    n2 = bk2_arr.shape[0]
    x = bk2_arr.reshape(n2, 3, P, LDIG, P, L, N1, N2)
    ks = [_expand_key(_diag_key(x[:, t]), Bt) for t in range(3)]
    return jnp.stack(ks, axis=1)                  # (n/2, 3, d, k, 32, W)


def _lane_from_lj(tab_lj, Bt: int):
    """np (L, 32) keyed by (limb, j) -> full-width (W,) lane pattern."""
    t = np.broadcast_to(tab_lj[:, None, None, :], (L, Bt, P, N2))
    return t.reshape(-1)


def prep_tables(ctx, Bt: int = 8):
    """Pack the context's NTT/omega tables into full-width kernel-layout
    device arrays.  Returns a dict of arrays passed to blind_rotate()."""
    tb = ctx.ntt
    W = lane_width(Bt)
    p_np = np.asarray(tb.p)
    ones = np.ones((L, N2), np.uint32)

    def lane_const(per_limb):
        return jnp.asarray(
            _lane_from_lj(np.asarray(per_limb)[:, None] * ones, Bt)
            .reshape(1, W))

    # merged (negacyclic) lane-stage tables: stage s has groups of span
    # 2t = 32 >> (s-1) along j; twiddle tw1[s-1][l, j // (2t)]
    def lane_stage(tabs):
        rows = np.zeros((5, W), np.uint32)
        for s in range(1, 6):
            two_t = 32 >> (s - 1)
            g = np.arange(N2) // two_t
            rows[s - 1] = _lane_from_lj(np.asarray(tabs[s - 1])[:, g], Bt)
        return jnp.asarray(rows)

    # cyclic sublane-stage tables, packed rows (see _SUB_OFF)
    def sub_stage(tabs):
        rows = np.zeros((31, W), np.uint32)
        for s in range(1, 6):
            t = np.asarray(tabs[s - 1])               # (L, 2^(s-1))
            for j in range(t.shape[1]):
                rows[_SUB_OFF[s] + j] = _lane_from_lj(
                    np.repeat(t[:, j:j + 1], N2, axis=1), Bt)
        return jnp.asarray(rows)

    # cross tables: value at (sublane=i2, lane j=q1) = mat[l, q1*32 + i2]
    def cross(mat):
        m = np.asarray(mat).reshape(L, N1, N2)        # (l, q1, i2)
        m = np.transpose(m, (2, 0, 1))                # (i2, l, q1)
        out = np.broadcast_to(m[:, :, None, None, :],
                              (N2, L, Bt, P, N1)).reshape(N2, W)
        return jnp.asarray(np.ascontiguousarray(out))

    # omega digit tables (radix-4): row block (g*3 + c-1)*32 .. +32 holds the
    # NTT-domain mont monomial table for digit value c in {1,2,3} of radix-4
    # group g; c=0 is mont(X^0) = r1_lane, so its 6 tables aren't stored
    om = np.asarray(ctx.omega_bits).reshape(6, 4, L, N1, N2)
    om_rows = np.zeros((6 * 3 * N1, W), np.uint32)
    for g in range(6):
        for c in (1, 2, 3):
            blk = np.transpose(om[g, c], (1, 0, 2))   # (q2, l, q1)
            r = (g * 3 + c - 1) * N1
            om_rows[r:r + N1] = np.broadcast_to(
                blk[:, :, None, None, :], (N1, L, Bt, P, N2)).reshape(N1, W)

    scal = np.zeros((16,), np.uint32)
    scal[0:2] = p_np
    scal[2:4] = np.asarray(tb.pinv)
    scal[4:6] = np.asarray(tb.mu)
    scal[6] = np.uint32(ctx.p1_inv_p2)
    scal[7] = np.uint32(ctx.p1_inv_p2_sh)
    scal[8] = np.uint32(ctx.p1p2_mod32)
    scal[9] = np.uint32(ctx.p1p2_half_hi)
    scal[10] = np.uint32(ctx.p1p2_half_lo)
    scal[11] = np.uint32(ctx.offset)

    return dict(
        scal=jnp.asarray(scal),
        p_lane=lane_const(tb.p), pinv_lane=lane_const(tb.pinv),
        mu_lane=lane_const(tb.mu), r1_lane=lane_const(tb.r1),
        ltwf=lane_stage(tb.tw1), ltwf_sh=lane_stage(tb.tw1_sh),
        ltwi=lane_stage(tb.itw1), ltwi_sh=lane_stage(tb.itw1_sh),
        stwf=sub_stage(tb.tw2), stwf_sh=sub_stage(tb.tw2_sh),
        stwi=sub_stage(tb.itw2), stwi_sh=sub_stage(tb.itw2_sh),
        twmf=cross(tb.tw_mat), twmf_sh=cross(tb.tw_mat_sh),
        twmi=cross(tb.itw_mat), twmi_sh=cross(tb.itw_mat_sh),
        omega=jnp.asarray(om_rows),
    )


_TABLE_NAMES = ("p_lane", "pinv_lane", "mu_lane", "r1_lane",
                "ltwf", "ltwf_sh", "ltwi", "ltwi_sh",
                "stwf", "stwf_sh", "stwi", "stwi_sh",
                "twmf", "twmf_sh", "twmi", "twmi_sh", "omega")


# ---------------------------------------------------------------------------
# the kernel
# ---------------------------------------------------------------------------

def _chain_ops(W, scal_ref, tables):
    """Build the per-kernel closures over full-width lane tables.  All values
    are 2D (rows, W) uint32; reshapes only ever split sublanes."""
    (p_lane_ref, pinv_lane_ref, mu_lane_ref, r1_lane_ref,
     ltwf, ltwf_sh, ltwi, ltwi_sh, stwf, stwf_sh, stwi, stwi_sh,
     twmf, twmf_sh, twmi, twmi_sh, omega) = tables

    lane = jax.lax.broadcasted_iota(jnp.int32, (1, W), 1)
    p_lane = p_lane_ref[:]
    pinv_lane = pinv_lane_ref[:]
    mu_lane = mu_lane_ref[:]
    r1_lane = r1_lane_ref[:]
    p2_lane = p_lane + p_lane
    half_w = W // 2

    p1s = scal_ref[0]
    p2s = scal_ref[1]
    mu2s = scal_ref[5]
    invs = scal_ref[6]
    inv_shs = scal_ref[7]
    mod32 = scal_ref[8]
    half_hi = scal_ref[9]
    half_lo = scal_ref[10]
    offs = scal_ref[11]

    def partner(x, t):
        """x[..., j] -> x[..., j ^ t] (t a power of two dividing W)."""
        mask = (lane & t) == 0
        return jnp.where(mask, pltpu.roll(x, W - t, 1), pltpu.roll(x, t, 1))

    def lane_fwd(y):
        """Merged-negacyclic CT stages along j (within each 32-lane poly
        block); natural in, bit-reversed out; values in [0, 2p)."""
        for s in range(1, 6):
            t = 32 >> s
            tw = ltwf[pl.ds(s - 1, 1), :]
            tw_sh = ltwf_sh[pl.ds(s - 1, 1), :]
            prt = partner(y, t)
            is_u = (lane & t) == 0
            u = jnp.where(is_u, y, prt)
            v = jnp.where(is_u, prt, y)
            tt = mm.shoup_mul_lazy(v, tw, tw_sh, p_lane)
            y = jnp.where(is_u, mm.cond_sub(u + tt, p2_lane),
                          mm.cond_sub((u + p2_lane) - tt, p2_lane))
        return y

    def lane_inv(y):
        """Merged-negacyclic GS stages along j: bit-reversed in, natural
        out (n^{-1}·psi^{-r} folded into the tables)."""
        for s in range(5, 0, -1):
            t = 32 >> s
            tw = ltwi[pl.ds(s - 1, 1), :]
            tw_sh = ltwi_sh[pl.ds(s - 1, 1), :]
            prt = partner(y, t)
            is_u = (lane & t) == 0
            u = jnp.where(is_u, y, prt)
            v = jnp.where(is_u, prt, y)
            add = mm.cond_sub(u + v, p2_lane)
            tt = mm.shoup_mul_lazy((u + p2_lane) - v, tw, tw_sh, p_lane)
            y = jnp.where(is_u, add, tt)
        return y

    def sub_fwd(y, g):
        """Cyclic GS stages along sublanes of (g*32, W)."""
        for s in range(5, 0, -1):
            m = 1 << s
            z = y.reshape(g, N1 // m, m, W)
            u = z[:, :, : m // 2]
            v = z[:, :, m // 2:]
            tw = stwf[pl.ds(_SUB_OFF[s], m // 2), :]
            tw_sh = stwf_sh[pl.ds(_SUB_OFF[s], m // 2), :]
            add = mm.cond_sub(u + v, p2_lane)
            tt = mm.shoup_mul_lazy((u + p2_lane) - v, tw, tw_sh, p_lane)
            y = jnp.concatenate([add, tt], axis=2).reshape(g * N1, W)
        return y

    def sub_inv(y, g):
        """Cyclic CT stages along sublanes of (g*32, W)."""
        for s in range(1, 6):
            m = 1 << s
            z = y.reshape(g, N1 // m, m, W)
            u = z[:, :, : m // 2]
            v = z[:, :, m // 2:]
            tw = stwi[pl.ds(_SUB_OFF[s], m // 2), :]
            tw_sh = stwi_sh[pl.ds(_SUB_OFF[s], m // 2), :]
            tt = mm.shoup_mul_lazy(v, tw, tw_sh, p_lane)
            y = jnp.concatenate(
                [mm.cond_sub(u + tt, p2_lane),
                 mm.cond_sub((u + p2_lane) - tt, p2_lane)],
                axis=2).reshape(g * N1, W)
        return y

    def ntt_fwd(y, g):
        """Coefficient (sublane=i2, lane j=i1) -> NTT (sublane=q2, lane=q1);
        bit-identical to ops/ntt.ntt_fwd up to the transposed storage."""
        y = lane_fwd(y)
        z = y.reshape(g, N1, W)
        z = mm.shoup_mul_lazy(z, twmf[:], twmf_sh[:], p_lane)
        y = sub_fwd(z.reshape(g * N1, W), g)
        return mm.cond_sub(y, p_lane)

    def ntt_inv(y, g):
        y = sub_inv(y, g)
        z = y.reshape(g, N1, W)
        z = mm.shoup_mul_lazy(z, twmi[:], twmi_sh[:], p_lane)
        y = lane_inv(z.reshape(g * N1, W))
        return mm.cond_sub(y, p_lane)

    def to_torus(y):
        """Coefficient residues (g*32, W) -> Torus32, the SAME torus value
        materialised in both limb regions (one W/2 roll pairs the limbs)."""
        sw = pltpu.roll(y, half_w, 1)
        l0 = lane < half_w
        r1 = jnp.where(l0, y, sw)
        r2 = jnp.where(l0, sw, y)
        t = mm.sub_mod(r2, mm.barrett32(r1, p2s, mu2s), p2s)
        t = mm.shoup_mul(t, invs, inv_shs, p2s)
        hi, lo = mm.widening_mul(t, p1s)
        lo2 = lo + r1
        hi = hi + (lo2 < lo).astype(jnp.uint32)
        ge = jnp.logical_or(hi > half_hi,
                            jnp.logical_and(hi == half_hi, lo2 >= half_lo))
        return jnp.where(ge, lo2 - mod32, lo2)

    def to_rns(x):
        """Torus32 -> per-lane-limb residues (centered semantics)."""
        neg = x >= jnp.uint32(1 << 31)
        mag = jnp.where(neg, jnp.uint32(0) - x, x)
        m = mm.barrett32(mag, p_lane, mu_lane)
        return jnp.where(neg, mm.neg_mod(m, p_lane), m)

    def decompose_rns(tor):
        """Torus (32, W) -> (64, W) signed gadget digits as residues,
        digit-major on sublanes (rows d*32..d*32+31)."""
        u = tor + offs
        rows = []
        for d in range(LDIG):
            sh = 32 - (d + 1) * BG_BIT
            dig = (u >> sh) & jnp.uint32(BG - 1)
            negd = dig < jnp.uint32(BG // 2)
            mag = jnp.where(negd, jnp.uint32(BG // 2) - dig,
                            dig - jnp.uint32(BG // 2))
            rows.append(jnp.where(negd & (mag != 0), p_lane - mag, mag))
        return jnp.concatenate(rows, axis=0)

    def omega_of(a_row):
        """a_row (1, W) int32 in [0, 2N) -> mont NTT-domain X^a (32, W),
        product of 6 radix-4 digit-selected tables (c=0 digit = mont(1))."""
        w = None
        for g in range(6):
            dig = (a_row >> (2 * g)) & 3
            t1 = omega[pl.ds((g * 3 + 0) * N1, N1), :]
            t2 = omega[pl.ds((g * 3 + 1) * N1, N1), :]
            t3 = omega[pl.ds((g * 3 + 2) * N1, N1), :]
            sel = jnp.where(dig == 1, t1, r1_lane)
            sel = jnp.where(dig == 2, t2, sel)
            sel = jnp.where(dig == 3, t3, sel)
            w = sel if w is None else mm.mont_mul(w, sel, p_lane, pinv_lane)
        return w

    def renorm(a):
        """Pull the accumulator's integer representative back to the torus
        (the CRT pair gives ~2^58 of headroom for ~2^52 of growth)."""
        return ntt_fwd(to_rns(to_torus(ntt_inv(a, 1))), 1)

    return dict(partner=partner, ntt_fwd=ntt_fwd, ntt_inv=ntt_inv,
                to_torus=to_torus, to_rns=to_rns,
                decompose_rns=decompose_rns, omega_of=omega_of,
                renorm=renorm, p_lane=p_lane, pinv_lane=pinv_lane,
                r1_lane=r1_lane)


def _make_kernel(n, Bt):
    W = lane_width(Bt)

    def kern(a_ref, acc_ref, scal_ref, *rest):
        tables = rest[:len(_TABLE_NAMES)]
        bk_hbm = rest[len(_TABLE_NAMES)]
        out_ref = rest[len(_TABLE_NAMES) + 1]
        bk_buf = rest[len(_TABLE_NAMES) + 2]
        sem = rest[len(_TABLE_NAMES) + 3]
        ops = _chain_ops(W, scal_ref, tables)
        p_lane = ops["p_lane"]
        pinv_lane = ops["pinv_lane"]

        def get_dma(slot, i):
            return pltpu.make_async_copy(bk_hbm.at[i], bk_buf.at[slot],
                                         sem.at[slot])

        get_dma(0, 0).start()

        def body(i, acc):
            @pl.when(i + 1 < n)
            def _():
                get_dma((i + 1) % 2, i + 1).start()
            get_dma(i % 2, i).wait()

            a_row = a_ref[pl.ds(i, 1), :]
            w = ops["omega_of"](a_row)
            rot = mm.mont_mul(acc, w, p_lane, pinv_lane)
            diff = mm.sub_mod(rot, acc, p_lane)

            dt = ops["to_torus"](ops["ntt_inv"](diff, 1))
            D = ops["ntt_fwd"](ops["decompose_rns"](dt), LDIG)   # (64, W)

            ext = None
            for d in range(LDIG):
                Dd = D[d * N1:(d + 1) * N1]
                for k in range(P):
                    x = Dd if k == 0 else ops["partner"](Dd, N2)
                    term = mm.mont_mul(x, bk_buf[i % 2, d, k], p_lane,
                                       pinv_lane)
                    ext = term if ext is None else mm.add_mod(ext, term,
                                                              p_lane)
            acc = mm.add_mod(acc, ext, p_lane)
            return jax.lax.cond((i + 1) % RENORM == 0, ops["renorm"],
                                lambda a: a, acc)

        out_ref[:] = jax.lax.fori_loop(0, n, body, acc_ref[:])

    return kern


def _make_kernel2(n2, Bt):
    """2-bit key-unrolled chain: n/2 sequential steps, each consuming a TGSW
    triple (B0, B1, B01) and applying
      acc += <D(acc), B0>·u0 + <D(acc), B1>·u1 + <D(acc), B01>·u0·u1,
    u_j = X^a_j − 1 (see models/tfhe.BootKey2).  One decompose + NTT round
    per TWO secret bits — the sequential-latency lever the reference lacks."""
    W = lane_width(Bt)

    def kern(a_ref, acc_ref, scal_ref, *rest):
        tables = rest[:len(_TABLE_NAMES)]
        bk_hbm = rest[len(_TABLE_NAMES)]
        out_ref = rest[len(_TABLE_NAMES) + 1]
        bk_buf = rest[len(_TABLE_NAMES) + 2]
        sem = rest[len(_TABLE_NAMES) + 3]
        ops = _chain_ops(W, scal_ref, tables)
        p_lane = ops["p_lane"]
        pinv_lane = ops["pinv_lane"]
        r1_lane = ops["r1_lane"]

        def get_dma(slot, i):
            return pltpu.make_async_copy(bk_hbm.at[i], bk_buf.at[slot],
                                         sem.at[slot])

        get_dma(0, 0).start()

        def body(i, acc):
            @pl.when(i + 1 < n2)
            def _():
                get_dma((i + 1) % 2, i + 1).start()
            get_dma(i % 2, i).wait()

            a0 = a_ref[pl.ds(2 * i, 1), :]
            a1 = a_ref[pl.ds(2 * i + 1, 1), :]
            u0 = mm.sub_mod(ops["omega_of"](a0), r1_lane, p_lane)
            u1 = mm.sub_mod(ops["omega_of"](a1), r1_lane, p_lane)
            u01 = mm.mont_mul(u0, u1, p_lane, pinv_lane)

            dt = ops["to_torus"](ops["ntt_inv"](acc, 1))
            D = ops["ntt_fwd"](ops["decompose_rns"](dt), LDIG)

            term = None
            for t, u in ((0, u0), (1, u1), (2, u01)):
                e = None
                for d in range(LDIG):
                    Dd = D[d * N1:(d + 1) * N1]
                    for k in range(P):
                        x = Dd if k == 0 else ops["partner"](Dd, N2)
                        pr = mm.mont_mul(x, bk_buf[i % 2, t, d, k], p_lane,
                                         pinv_lane)
                        e = pr if e is None else mm.add_mod(e, pr, p_lane)
                su = mm.mont_mul(e, u, p_lane, pinv_lane)
                term = su if term is None else mm.add_mod(term, su, p_lane)
            acc = mm.add_mod(acc, term, p_lane)
            return jax.lax.cond((i + 1) % RENORM2 == 0, ops["renorm"],
                                lambda a: a, acc)

        out_ref[:] = jax.lax.fori_loop(0, n2, body, acc_ref[:])

    return kern


def _call(kernel, acc_k, a_e, bk_stream, tables, Bt, interpret, bk_slot_shape):
    W = lane_width(Bt)
    progs = acc_k.shape[1] // W
    t = tables
    in_specs = [
        pl.BlockSpec((a_e.shape[0] // progs, W), lambda b: (b, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((N1, W), lambda b: (0, b), memory_space=pltpu.VMEM),
        pl.BlockSpec(memory_space=pltpu.SMEM),
    ] + [pl.BlockSpec(memory_space=pltpu.VMEM) for _ in _TABLE_NAMES] + [
        pl.BlockSpec(memory_space=pl.ANY)]
    args = [a_e, acc_k, t["scal"]] + [t[nm] for nm in _TABLE_NAMES] + [
        bk_stream]
    return pl.pallas_call(
        kernel,
        grid=(progs,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((N1, W), lambda b: (0, b),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((N1, progs * W), jnp.uint32),
        scratch_shapes=[
            pltpu.VMEM((2,) + bk_slot_shape + (N1, W), jnp.uint32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        interpret=interpret,
    )(*args)


@functools.partial(jax.jit, static_argnames=("n", "Bt", "interpret"))
def blind_rotate(acc_k, a_e, bk_stream, tables, n: int, Bt: int = 8,
                 interpret: bool = False):
    """Run the full n-step CMux chain.

    acc_k: (32, progs*W) initial accumulator from prep_acc (NTT domain).
    a_e: (progs*n, W) int32 from prep_a.
    bk_stream: (n, d, k, 32, W) from prep_bk.
    tables: dict from prep_tables (same Bt).
    Returns the final accumulator in the same layout/domain."""
    return _call(_make_kernel(n, Bt), acc_k, a_e, bk_stream, tables, Bt,
                 interpret, (LDIG, P))


@functools.partial(jax.jit, static_argnames=("n", "Bt", "interpret"))
def blind_rotate2(acc_k, a_e, bk2_stream, tables, n: int, Bt: int = 8,
                  interpret: bool = False):
    """Key-unrolled blind rotation: n/2 chain steps over TGSW triples.
    Same layouts as blind_rotate; bk2_stream from prep_bk2."""
    return _call(_make_kernel2(n // 2, Bt), acc_k, a_e, bk2_stream, tables,
                 Bt, interpret, (3, LDIG, P))
