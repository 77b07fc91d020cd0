"""Fused Pallas TPU kernel for the four-step negacyclic NTT/INTT.

The jnp stage path in ops/ntt.py materialises every butterfly stage through
HBM (~2·log2(N) full-array passes per transform).  This kernel runs the whole
transform per (poly, limb) row inside VMEM: one HBM read, one HBM write, all
log2(N) butterfly stages + cross scaling on registers/VMEM.

Mapping (see ops/ntt.py for the math):
  * grid = (L, B): limb is the OUTER axis, so the per-limb tables keep the
    same block index across all B consecutive inner steps and Pallas elides
    their re-fetch — each (N-sized) table is DMA'd once per limb, not once
    per row.
  * merged-negacyclic stages (psi folded into first-transform twiddles and
    the cross table, ops/ntt.py semantics) mean only ONE big (N1, N2) table
    per direction (tw_mat / itw_mat) instead of psi+tw_mat — per-row HBM
    traffic is 1 read + 1 write of the data and (amortised) one table.
  * per-stage twiddle vectors live whole in VMEM and are limb-indexed
    dynamically.
  * modmul = Shoup (mul_hi via 16-bit limb decomposition): ~7 int32
    vector multiplies; everything stays uint32 in VMEM.

This is the TPU analog of GPU-NTT's merged-radix shared-memory kernels
(reference docs/technical_deep_dive.rst:18-33): VMEM plays the role of
shared memory, sublane butterflies the role of the merged stages.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from . import modmath as mm
from . import ntt as nttm


def _shoup_lazy(a, w, w_sh, p):
    """Harvey lazy Shoup: result in [0, 2p) for any uint32 a, w < p."""
    q = mm.mul_hi(a, w_sh)
    return a * w - q * p


def _merged_ct_2d(y, limb, tws, tws_sh, p):
    """Merged-negacyclic CT stages along axis 0 of (S, W); stage s has
    m = 2^(s-1) groups of span t = S/(2m); tws[s-1] ref shape (L, S/2, 1)
    (group twiddle pre-repeated t times — see expand_merged_tables; Mosaic
    rejects the (m,) -> (m,1,1) lane-to-leading-dim broadcast, but the
    sublane split (S/2,1) -> (m,t,1) is supported).
    Natural in, bit-reversed out, values in [0, 2p) (see ops/ntt.py)."""
    size, w = y.shape
    p2 = p + p
    for s in range(1, len(tws) + 1):
        m = 1 << (s - 1)
        t = size // (2 * m)
        z = y.reshape(m, 2, t, w)
        u = z[:, 0]
        v = z[:, 1]
        tw = tws[s - 1][limb].reshape(m, t, 1)
        tw_sh = tws_sh[s - 1][limb].reshape(m, t, 1)
        tt = _shoup_lazy(v, tw, tw_sh, p)
        add = u + tt
        add = jnp.where(add >= p2, add - p2, add)
        sub = (u + p2) - tt
        sub = jnp.where(sub >= p2, sub - p2, sub)
        y = jnp.stack([add, sub], axis=1).reshape(size, w)
    return y


def _merged_gs_2d(y, limb, tws, tws_sh, p):
    """Merged-negacyclic GS stages along axis 0: bit-reversed in, natural
    out (inverse direction; psi^{-r} absorbed, n^{-1} folded in itw_mat).
    tws[s-1] ref shape (L, S/2, 1), pre-expanded like _merged_ct_2d."""
    size, w = y.shape
    p2 = p + p
    for s in reversed(range(1, len(tws) + 1)):
        m = 1 << (s - 1)
        t = size // (2 * m)
        z = y.reshape(m, 2, t, w)
        u = z[:, 0]
        v = z[:, 1]
        tw = tws[s - 1][limb].reshape(m, t, 1)
        tw_sh = tws_sh[s - 1][limb].reshape(m, t, 1)
        add = u + v
        add = jnp.where(add >= p2, add - p2, add)
        tt = _shoup_lazy((u + p2) - v, tw, tw_sh, p)
        y = jnp.stack([add, tt], axis=1).reshape(size, w)
    return y


def expand_merged_tables(tabs, size: int):
    """Per-stage merged tables (L, 2^(s-1)) -> (L, size/2, 1): each group's
    twiddle repeated span-many times, so kernels only ever sublane-split."""
    out = []
    for s, tw in enumerate(tabs, start=1):
        m = 1 << (s - 1)
        t = size // (2 * m)
        out.append(jnp.repeat(jnp.asarray(tw), t, axis=1)[..., None])
    return out


def _gs_stages_2d(y, limb, tws, tws_sh, p):
    """Cyclic GS/DIF stages along axis 0 of (S, W); tws[s-1] ref shape
    (L, 2^(s-1)).  Harvey-lazy: values in [0, 2p) across stages."""
    size, w = y.shape
    p2 = p + p
    for s in reversed(range(1, len(tws) + 1)):
        m = 1 << s
        z = y.reshape(size // m, m, w)
        u = z[:, : m // 2, :]
        v = z[:, m // 2:, :]
        tw = tws[s - 1][limb][None, :, None]
        tw_sh = tws_sh[s - 1][limb][None, :, None]
        add = u + v
        add = jnp.where(add >= p2, add - p2, add)
        t = _shoup_lazy((u + p2) - v, tw, tw_sh, p)
        y = jnp.concatenate([add, t], axis=1).reshape(size, w)
    return y


def _ct_stages_2d(y, limb, tws, tws_sh, p):
    """Cyclic CT/DIT stages along axis 0 of (S, W), Harvey-lazy."""
    size, w = y.shape
    p2 = p + p
    for s in range(1, len(tws) + 1):
        m = 1 << s
        z = y.reshape(size // m, m, w)
        u = z[:, : m // 2, :]
        v = z[:, m // 2:, :]
        tw = tws[s - 1][limb][None, :, None]
        tw_sh = tws_sh[s - 1][limb][None, :, None]
        t = _shoup_lazy(v, tw, tw_sh, p)
        add = u + t
        add = jnp.where(add >= p2, add - p2, add)
        sub = (u + p2) - t
        sub = jnp.where(sub >= p2, sub - p2, sub)
        y = jnp.concatenate([add, sub], axis=1).reshape(size, w)
    return y


def _fwd_kernel(log1, log2, x_ref, p_ref, twm_ref, twm_sh_ref, *refs):
    stage_refs, o_ref = refs[:-1], refs[-1]
    limb = pl.program_id(0)
    p = p_ref[limb, 0]
    tw1 = stage_refs[:log1]
    tw1_sh = stage_refs[log1: 2 * log1]
    tw2 = stage_refs[2 * log1: 2 * log1 + log2]
    tw2_sh = stage_refs[2 * log1 + log2:]
    y = _merged_ct_2d(x_ref[0], limb, tw1, tw1_sh, p)
    y = _shoup_lazy(y, twm_ref[0], twm_sh_ref[0], p)
    y = y.T
    y = _gs_stages_2d(y, limb, tw2, tw2_sh, p)
    o_ref[0] = jnp.where(y >= p, y - p, y)   # single deferred reduction


def _inv_kernel(log1, log2, x_ref, p_ref, itwm_ref, itwm_sh_ref, *refs):
    stage_refs, o_ref = refs[:-1], refs[-1]
    limb = pl.program_id(0)
    p = p_ref[limb, 0]
    itw1 = stage_refs[:log1]
    itw1_sh = stage_refs[log1: 2 * log1]
    itw2 = stage_refs[2 * log1: 2 * log1 + log2]
    itw2_sh = stage_refs[2 * log1 + log2:]
    y = x_ref[0]                                   # (N2, N1)
    y = _ct_stages_2d(y, limb, itw2, itw2_sh, p)
    y = y.T                                        # (N1, N2)
    y = _shoup_lazy(y, itwm_ref[0], itwm_sh_ref[0], p)
    y = _merged_gs_2d(y, limb, itw1, itw1_sh, p)
    o_ref[0] = jnp.where(y >= p, y - p, y)   # deferred reduction (exact)


# When XLA stack-allocates BOTH the pallas_call input and result in scoped
# VMEM (it does when they are short-lived edges between fused ops), the call
# must keep in+out under the 16 MiB scoped limit.  Hit in practice at N=2^16
# with the 31-limb bootstrapping QP basis (62 rows: 16.3 MB in + 16.3 MB out
# -> 32.5 MB scoped OOM); the flagship's 48-row keyswitch transforms
# (12.3 MB) compile unsplit and MUST stay unsplit (splitting them measured
# 490 -> 247 ops/s).  So: only split calls past _SPLIT_TRIGGER, into chunks
# whose in+out fits comfortably.
_SPLIT_TRIGGER = 14 << 20   # bytes of output above which we split
_CHUNK_BYTES = 7 << 20      # target output bytes per split piece


@functools.partial(jax.jit, static_argnames=("inverse", "interpret"))
def ntt_pallas(x, tb: nttm.NttTables, inverse: bool = False,
               interpret: bool = False):
    """x: (..., L, N) uint32 -> same shape; fused single-kernel transform."""
    n, n1, n2 = tb.n, tb.n1, tb.n2
    log1 = n1.bit_length() - 1
    log2 = n2.bit_length() - 1
    L = tb.num_limbs
    lead = x.shape[:-1]
    rows = 1
    for d in lead:
        rows *= d
    B = rows // L          # lead always ends with the L axis

    if rows * n * 4 > _SPLIT_TRIGGER and not interpret:
        max_rows = max(1, _CHUNK_BYTES // (n * 4))
        x2 = x.reshape((B, L, n))
        if B > 1:
            bc = max(1, max_rows // L)
            outs = [ntt_pallas(x2[i:i + bc], tb, inverse, interpret)
                    for i in range(0, B, bc)]
            return jnp.concatenate(outs, axis=0).reshape(lead + (n,))
        outs = [ntt_pallas(x2[:, lo:min(lo + max_rows, L)],
                           tb.slice_limbs(lo, min(lo + max_rows, L)),
                           inverse, interpret)
                for lo in range(0, L, max_rows)]
        return jnp.concatenate(outs, axis=1).reshape(lead + (n,))

    if inverse:
        kern = functools.partial(_inv_kernel, log1, log2)
        # input rows are read in (N2, N1) view; big tables in matching views
        xf = x.reshape(rows, n2, n1)
        big = [tb.itw_mat.reshape(L, n1, n2), tb.itw_mat_sh.reshape(L, n1, n2)]
        stages = (expand_merged_tables(tb.itw1, n1)
                  + expand_merged_tables(tb.itw1_sh, n1)
                  + list(tb.itw2) + list(tb.itw2_sh))
        in_block = (1, n2, n1)
        out_block = (1, n1, n2)
    else:
        kern = functools.partial(_fwd_kernel, log1, log2)
        xf = x.reshape(rows, n1, n2)
        big = [tb.tw_mat.reshape(L, n1, n2), tb.tw_mat_sh.reshape(L, n1, n2)]
        stages = (expand_merged_tables(tb.tw1, n1)
                  + expand_merged_tables(tb.tw1_sh, n1)
                  + list(tb.tw2) + list(tb.tw2_sh))
        in_block = (1, n1, n2)
        out_block = (1, n2, n1)

    # grid = (L, B): the inner (fast) axis walks the batch with the limb
    # fixed, so the limb-indexed big-table blocks are fetched once per limb.
    row_map = lambda l, b: (b * L + l, 0, 0)
    limb_map = lambda l, b: (l, 0, 0)
    in_specs = [pl.BlockSpec(in_block, row_map, memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.SMEM)]
    in_specs += [pl.BlockSpec((1, n1, n2), limb_map, memory_space=pltpu.VMEM)
                 for _ in big]
    in_specs += [pl.BlockSpec(memory_space=pltpu.VMEM) for _ in stages]

    out = pl.pallas_call(
        kern,
        grid=(L, B),
        in_specs=in_specs,
        out_specs=pl.BlockSpec(out_block, row_map, memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((rows,) + out_block[1:], jnp.uint32),
        interpret=interpret,
    )(xf, tb.p.reshape(L, 1), *big, *stages)
    return out.reshape(lead + (n,))
