"""Fused Pallas TPU kernel for the Method-II keyswitch core:
FastBconv digit build -> forward NTT -> key MAC -> inverse NTT, all inside
VMEM, one program per output limb.

This is the TPU analog of the reference's fused switchkey engine
(kernel/switchkey.cu:61 keyswitch_multiply_accumulate + the surrounding
base-conversion/NTT launches): on GPU those are separate kernels with HBM
round-trips between them; here the digit polynomial for output limb l never
leaves VMEM between its base conversion, transform, MAC and the final
inverse transform.

Traffic accounting per keyswitch (vs the jnp stage path, which materialises
every butterfly stage through HBM):
  * scaled digits z (ka rows): fetched ONCE for the whole kernel (constant
    block index across the limb grid);
  * keys: streamed (j, l)-sliced with a double-buffered manual DMA — read
    exactly once;
  * accumulators: live in VMEM as lazy (hi, lo) pairs; only the two final
    coefficient-domain rows per limb are written back.

The divide-by-P stages and the optional output forward NTT stay outside
(they are cheap pointwise passes / standard transforms).
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from . import modmath as mm
from . import ntt as nttm
from . import ntt_pallas as ntp


def _fold_mac(hi, lo, p, pinv, mu):
    """(hi, lo) = Σ d·(k·R) exact 64-bit -> Σ d·k mod p (REDC with a
    pre-Barrett on hi); mirrors rns.lazy_mac_mont's fold."""
    hi_m = mm.barrett32(hi, p, mu)
    m = lo * pinv
    mhi, _ = mm.widening_mul(m, p)
    t = hi_m + mhi + (lo != 0).astype(lo.dtype)
    return mm.cond_sub(mm.cond_sub(t, p), p)


def _kernel(d_t, alpha_max, groups, log1, log2,
            z_ref, scal_ref, mat_ref, twm_ref, twm_sh_ref,
            itwm_ref, itwm_sh_ref, *refs):
    """Grid (kqp,): program l computes out[:, l] = INTT(Σ_j NTT(dig_jl)·k_jl).

    refs: stage tables (4·log1 + 4·log2 refs) + k0_hbm, k1_hbm, out_ref,
    k_buf (scratch), sem (scratch)."""
    n_stage = 2 * (log1 + log2)
    stage_refs = refs[:2 * n_stage]
    k0_hbm, k1_hbm, o_ref, k_buf, sem = refs[2 * n_stage:]

    l = pl.program_id(0)
    p = scal_ref[0, l]
    pinv = scal_ref[1, l]
    mu = scal_ref[2, l]

    tw1 = stage_refs[:log1]
    tw1_sh = stage_refs[log1: 2 * log1]
    tw2 = stage_refs[2 * log1: 2 * log1 + log2]
    tw2_sh = stage_refs[2 * log1 + log2: 2 * (log1 + log2)]
    itw1 = stage_refs[2 * (log1 + log2): 2 * (log1 + log2) + log1]
    itw1_sh = stage_refs[2 * (log1 + log2) + log1: 2 * (log1 + log2) + 2 * log1]
    itw2 = stage_refs[4 * log1 + 2 * log2: 4 * log1 + 3 * log2]
    itw2_sh = stage_refs[4 * log1 + 3 * log2:]

    def dma(key_hbm, slot, j):
        # key slice (j, l): rely on l being fixed for the whole program
        return pltpu.make_async_copy(key_hbm.at[j, l], k_buf.at[slot],
                                     sem.at[slot])

    dma(k0_hbm, 0, 0).start()
    dma(k1_hbm, 1, 0).start()

    acc = [None, None]   # lazy (hi, lo) pairs per key
    for j in range(d_t):
        if j + 1 < d_t:
            dma(k0_hbm, (2 * j + 2) % 4, j + 1).start()
            dma(k1_hbm, (2 * j + 3) % 4, j + 1).start()

        # FastBconv: dig = Σ_t z[g_t] · mat[j, t, l]  (lazy 64-bit, one REDC)
        hi = lo = None
        for t in range(alpha_max):
            i = groups[j][t] if t < len(groups[j]) else None
            if i is None:
                continue
            w = mat_ref[j * alpha_max + t, l]
            phi, plo = mm.widening_mul(z_ref[i], w)
            if hi is None:
                hi, lo = phi, plo
            else:
                hi, lo = mm.add64(hi, lo, phi, plo)
        dig = _fold_mac(hi, lo, p, pinv, mu)           # (n1, n2), < p

        # forward NTT in VMEM (merged-negacyclic, ops/ntt_pallas helpers)
        y = ntp._merged_ct_2d(dig, l, tw1, tw1_sh, p)
        y = ntp._shoup_lazy(y, twm_ref[0], twm_sh_ref[0], p)
        y = y.T
        y = ntp._gs_stages_2d(y, l, tw2, tw2_sh, p)
        y = jnp.where(y >= p, y - p, y)                # exact for the MAC

        # MAC with this digit's key rows (Montgomery form)
        dma(k0_hbm, (2 * j) % 4, j).wait()
        dma(k1_hbm, (2 * j + 1) % 4, j).wait()
        for c, slot in ((0, (2 * j) % 4), (1, (2 * j + 1) % 4)):
            phi, plo = mm.widening_mul(y, k_buf[slot])
            if acc[c] is None:
                acc[c] = (phi, plo)
            else:
                acc[c] = mm.add64(acc[c][0], acc[c][1], phi, plo)

    for c in range(2):
        a = _fold_mac(acc[c][0], acc[c][1], p, pinv, mu)   # (n2, n1), < p
        # inverse NTT in VMEM
        y = ntp._ct_stages_2d(a, l, itw2, itw2_sh, p)
        y = y.T
        y = ntp._shoup_lazy(y, itwm_ref[0], itwm_sh_ref[0], p)
        y = ntp._merged_gs_2d(y, l, itw1, itw1_sh, p)
        o_ref[c, 0] = jnp.where(y >= p, y - p, y)


def build_fused_mat(ks2, kqp: int):
    """(d̃ · alpha_max, kqp) uint32: mat[j·alpha_max + t, l] =
    |D_j/q_{g_t}|_{p_l} · 2^32 mod p_l (zero-padded for short groups).

    Traceable (jnp): ks2.convs[*].mat_mont are pytree leaves, so this must
    work when the whole context is a jit argument (models/ckks._keyswitch_poly)."""
    alpha_max = max(len(g) for g in ks2.groups)
    rows = []
    for j, conv in enumerate(ks2.convs):
        m = jnp.asarray(conv.mat_mont)                 # (len(g), kqp)
        pad = alpha_max - m.shape[0]
        if pad:
            m = jnp.concatenate(
                [m, jnp.zeros((pad, kqp), jnp.uint32)], axis=0)
        rows.append(m)
    return jnp.concatenate(rows, axis=0)


def keyswitch2_fused(poly_q, k0, k1, ks2, ntt_qp_level: nttm.NttTables,
                     base_qp_level, in_ntt: bool, out_ntt: bool,
                     ntt_q_level: nttm.NttTables, interpret: bool = False):
    """Drop-in replacement for ops.keyswitch2.keyswitch2 routing the
    digit-build/NTT/MAC/INTT core through the fused Pallas kernel."""
    if in_ntt:
        poly_q = nttm.ntt_inv(poly_q, ntt_q_level)

    # scaled digits z_i = |x_i · (D_j/q_i)^{-1}|_{q_i}, groupwise (cheap)
    zs = []
    for j, g in enumerate(ks2.groups):
        part = poly_q[..., g[0]: g[-1] + 1, :]
        zs.append(ks2.convs[j].scaled_digits(part))
    z = jnp.concatenate(zs, axis=-2)                   # (ka, N)

    tb = ntt_qp_level
    n, n1, n2 = tb.n, tb.n1, tb.n2
    log1 = n1.bit_length() - 1
    log2 = n2.bit_length() - 1
    kqp = tb.num_limbs
    d_t = len(ks2.groups)
    alpha_max = max(len(g) for g in ks2.groups)

    mat = jnp.asarray(build_fused_mat(ks2, kqp))
    scal = jnp.stack([tb.p, tb.pinv, tb.mu])           # (3, kqp)

    zf = z.reshape(z.shape[:-1] + (n1, n2))
    k0f = k0.reshape(k0.shape[:-1] + (n2, n1))         # NTT-domain view
    k1f = k1.reshape(k1.shape[:-1] + (n2, n1))

    stages = (ntp.expand_merged_tables(tb.tw1, n1)
              + ntp.expand_merged_tables(tb.tw1_sh, n1)
              + list(tb.tw2) + list(tb.tw2_sh)
              + ntp.expand_merged_tables(tb.itw1, n1)
              + ntp.expand_merged_tables(tb.itw1_sh, n1)
              + list(tb.itw2) + list(tb.itw2_sh))

    limb_map = lambda l: (l, 0, 0)
    in_specs = [
        pl.BlockSpec(memory_space=pltpu.VMEM),         # z whole, resident
        pl.BlockSpec(memory_space=pltpu.SMEM),         # scal
        pl.BlockSpec(memory_space=pltpu.SMEM),         # mat
        pl.BlockSpec((1, n1, n2), limb_map, memory_space=pltpu.VMEM),
        pl.BlockSpec((1, n1, n2), limb_map, memory_space=pltpu.VMEM),
        pl.BlockSpec((1, n1, n2), limb_map, memory_space=pltpu.VMEM),
        pl.BlockSpec((1, n1, n2), limb_map, memory_space=pltpu.VMEM),
    ]
    args = [zf, scal, mat,
            tb.tw_mat.reshape(kqp, n1, n2), tb.tw_mat_sh.reshape(kqp, n1, n2),
            tb.itw_mat.reshape(kqp, n1, n2),
            tb.itw_mat_sh.reshape(kqp, n1, n2)]
    for s in stages:
        in_specs.append(pl.BlockSpec(memory_space=pltpu.VMEM))
        args.append(s)
    in_specs.append(pl.BlockSpec(memory_space=pl.ANY))  # k0 stays in HBM
    in_specs.append(pl.BlockSpec(memory_space=pl.ANY))  # k1
    args.append(k0f)
    args.append(k1f)

    kern = functools.partial(_kernel, d_t, alpha_max, tuple(ks2.groups),
                             log1, log2)
    out = pl.pallas_call(
        kern,
        grid=(kqp,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((2, 1, n1, n2), lambda l: (0, l, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((2, kqp, n1, n2), jnp.uint32),
        scratch_shapes=[
            pltpu.VMEM((4, n2, n1), jnp.uint32),       # key double buffers
            pltpu.SemaphoreType.DMA((4,)),
        ],
        interpret=interpret,
    )(*args)
    acc = out.reshape(2, kqp, n)

    for stage in ks2.div_stages:
        acc = stage(acc)
    d0, d1 = acc[0], acc[1]
    if out_ntt:
        d0 = nttm.ntt_fwd(d0, ntt_q_level)
        d1 = nttm.ntt_fwd(d1, ntt_q_level)
    return d0, d1
