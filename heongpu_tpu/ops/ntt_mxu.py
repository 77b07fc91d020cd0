"""MXU (systolic-array) execution path for the four-step NTT: the two
sub-transforms become int8 modular matrix multiplies.

Why: the VPU path emulates 32x32->64-bit modular multiplies with 16-bit limb
decomposition (~17 int32 vector mults per butterfly twiddle), which makes the
NTT compute-bound on the VPU.  The MXU path instead expresses each size-S
sub-NTT as a matmul by the (bit-reversed-output) DFT matrix over Z_p:

  * matrix M and activations x are split into 4 signed 8-bit digits;
    scaling the matrix by 2^(8k) mod p *before* digit-splitting folds the
    activation digit weights into the matrix, so the product needs only the
    4 *matrix* digit planes:  out = sum_l 2^(8l) * T_l,
    T_l = sum_k (2^(8k)*M mod p)_l @ x_k — one int8 dot with contraction
    4S and output rows 4S (all T_l at once), exact in int32
    (|T_l| <= 4S * 127^2 < 2^25).
  * recombination runs on the VPU with cheap shifts + one Barrett reduce —
    ~30 int mults/element total vs ~120 for the stage path.

The matrices are built in the SAME storage order as ops/ntt.py's GS/CT
stages (rows bit-reversed), so eval_order and every downstream table are
unchanged; the two paths are bit-identical and interchangeable.

This is where the reference's GPU-NTT merged-radix kernels map onto the TPU's
strongest unit (SURVEY §7 hard-part (b)): FLOPs ride the MXU, the VPU only
does digit splits and recombines.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Tuple

import numpy as np
import jax
import jax.numpy as jnp

from ..utils import nt
from . import modmath as mm
from . import ntt as nttm

OFF = np.uint32(1) << 25          # digit-sum offset making T_l nonnegative


@partial(
    jax.tree_util.register_dataclass,
    data_fields=["m1", "m2", "im1", "im2", "coff", "coff_sh"],
    meta_fields=[],
)
@dataclasses.dataclass(frozen=True)
class MxuTables:
    """int8 digit-plane matrices for the two sub-NTT sizes, fwd + inv.
    m1/im1: (L, 4*N1, 4*N1); m2/im2: (L, 4*N2, 4*N2); coff: (L,) uint32 —
    the correction constant 4*OFF*(1+2^8+2^16+2^24) mod p."""
    m1: jnp.ndarray
    m2: jnp.ndarray
    im1: jnp.ndarray
    im2: jnp.ndarray
    coff: jnp.ndarray
    coff_sh: jnp.ndarray

    def slice_limbs(self, lo: int, hi: int) -> "MxuTables":
        t = lambda a: a[lo:hi]
        return MxuTables(m1=t(self.m1), m2=t(self.m2), im1=t(self.im1),
                         im2=t(self.im2), coff=t(self.coff),
                         coff_sh=t(self.coff_sh))

    @staticmethod
    def concat(a: "MxuTables", b: "MxuTables") -> "MxuTables":
        c = lambda x, y: jnp.concatenate([x, y], axis=0)
        return MxuTables(m1=c(a.m1, b.m1), m2=c(a.m2, b.m2),
                         im1=c(a.im1, b.im1), im2=c(a.im2, b.im2),
                         coff=c(a.coff, b.coff), coff_sh=c(a.coff_sh, b.coff_sh))


def _signed_digits_np(v: np.ndarray) -> np.ndarray:
    """v uint64 < 2^31 -> 4 balanced signed 8-bit digits (np int8),
    stacked on a new leading axis."""
    v = v.astype(np.int64)
    digs = []
    for _ in range(4):
        d = v & 255
        d = np.where(d >= 128, d - 256, d)
        digs.append(d.astype(np.int8))
        v = (v - d) >> 8
    assert np.all(v == 0)
    return np.stack(digs)


def _mat_planes(mat: np.ndarray, p: int) -> np.ndarray:
    """mat (S,S) uint64 mod p -> (4S, 4S) int8: row-block l, col-block k
    holds digit l of (2^(8k) * mat mod p)."""
    S = mat.shape[0]
    out = np.zeros((4 * S, 4 * S), np.int8)
    for k in range(4):
        # mat < 2^30 and the scaled weight < 2^30, so the product fits uint64
        mk = (mat.astype(np.uint64) * np.uint64((1 << (8 * k)) % p)) % np.uint64(p)
        digs = _signed_digits_np(mk)                          # (4, S, S)
        for l in range(4):
            out[l * S:(l + 1) * S, k * S:(k + 1) * S] = digs[l]
    return out


def _dft_matrix(size: int, root: int, p: int, bitrev_rows: bool,
                bitrev_cols: bool) -> np.ndarray:
    b = size.bit_length() - 1
    br = np.array([nt.bit_reverse(i, b) for i in range(size)], np.int64)
    r = br if bitrev_rows else np.arange(size)
    c = br if bitrev_cols else np.arange(size)
    pows = nttm.pow_series(root, size, p).astype(np.uint64)
    e = (r[:, None] * c[None, :]) % size
    return pows[e]


def build_mxu_tables(primes, n: int) -> MxuTables:
    """Digit-plane matrices matching build_ntt_tables' stage semantics."""
    n1, n2 = nttm.split_n(n)
    L = len(primes)
    psis = [nt.minimal_primitive_root_2n(2 * n, p) for p in primes]
    m1 = np.empty((L, 4 * n1, 4 * n1), np.int8)
    m2 = np.empty((L, 4 * n2, 4 * n2), np.int8)
    im1 = np.empty_like(m1)
    im2 = np.empty_like(m2)
    coff = np.empty((L,), np.uint32)
    coff_sh = np.empty((L,), np.uint32)
    for li, (p, psi) in enumerate(zip(primes, psis)):
        w = psi * psi % p
        w1, w2 = pow(w, n2, p), pow(w, n1, p)
        iw1, iw2 = pow(w1, -1, p), pow(w2, -1, p)
        psi1 = pow(psi, n2, p)
        pu = np.uint64(p)
        pows1 = nttm.pow_series(psi1, n1, p).astype(np.uint64)
        ipows1 = nttm.pow_series(pow(psi1, -1, p), n1, p).astype(np.uint64)
        # fwd n1: merged negacyclic — out[r] = sum_i psi1^i w1^(br(r)·i) x[i]
        # (the psi1^i column scale replaces ops/ntt.py's psi pre-scale)
        f1 = _dft_matrix(n1, w1, p, True, False) * pows1[None, :] % pu
        m1[li] = _mat_planes(f1, p)
        m2[li] = _mat_planes(_dft_matrix(n2, w2, p, True, False), p)
        # inv n1: out[i] = psi1^{-i} sum_r iw1^(i·br(r)) x[r] (row scale
        # replaces the final ipsi_n post-scale; n^{-1} lives in itw_mat)
        i1 = _dft_matrix(n1, iw1, p, False, True) * ipows1[:, None] % pu
        im1[li] = _mat_planes(i1, p)
        im2[li] = _mat_planes(_dft_matrix(n2, iw2, p, False, True), p)
        c = (int(OFF) * (1 + (1 << 8) + (1 << 16) + (1 << 24))) % p
        coff[li] = c
        coff_sh[li] = mm.shoup(c, p)
    return MxuTables(m1=jnp.asarray(m1), m2=jnp.asarray(m2),
                     im1=jnp.asarray(im1), im2=jnp.asarray(im2),
                     coff=jnp.asarray(coff), coff_sh=jnp.asarray(coff_sh))


def _digitize(x):
    """x (..., L, S, W) uint32 < 2^31 -> (..., L, 4S, W) int8, k-major rows."""
    v = x.astype(jnp.int32)
    digs = []
    for _ in range(4):
        d = v & 255
        d = jnp.where(d >= 128, d - 256, d)
        digs.append(d.astype(jnp.int8))
        v = (v - d) >> 8
    return jnp.concatenate(digs, axis=-2)


def _recombine(t, tb: nttm.NttTables, mx: MxuTables):
    """t (..., L, 4, S, W) int32 digit sums -> (..., L, S, W) uint32 mod p.

    With the +OFF shift each plane is a nonnegative uint32 < 2^26; the
    weighted sum accumulates exactly as a (hi, lo) pair, one Barrett reduce,
    then the constant offset correction is subtracted."""
    u = (t + jnp.int32(OFF)).astype(jnp.uint32)
    u0, u1, u2, u3 = (u[..., l, :, :] for l in range(4))
    hi, lo = mm.add64(u1 >> 24, u1 << 8, u2 >> 16, u2 << 16)
    hi, lo = mm.add64(hi, lo, u3 >> 8, u3 << 24)
    hi, lo = mm.add64(hi, lo, jnp.zeros_like(u0), u0)
    shp = (-1,) + (1,) * 2          # limb constants broadcast under (L, S, W)
    p = tb.p.reshape(shp)
    # hi < 2^19 (each plane < 2^26 before its shift) < p, so the generic
    # reduce64's Barrett pre-reduction of hi is redundant: fold hi directly
    # through r1 = 2^32 mod p and Barrett only the low word.
    r = mm.add_mod(mm.shoup_mul(hi, tb.r1.reshape(shp),
                                tb.r1_sh.reshape(shp), p),
                   mm.barrett32(lo, p, tb.mu.reshape(shp)), p)
    return mm.sub_mod(r, mx.coff.reshape(shp), p)


def _sub_ntt_mxu(x, mat, tb: nttm.NttTables, mx: MxuTables):
    """x (..., L, S, W) -> transform along axis -2 via int8 MXU dot.
    mat: (L, 4S, 4S) digit planes."""
    lead = x.shape[:-3]
    L, S, W = x.shape[-3:]
    d = _digitize(x)                          # (..., L, 4S, W)
    d2 = d.reshape((-1,) + d.shape[-3:]) if lead else d[None]
    # dot: batch L; contract 4S: (L,4S_r,4S_c) x (B,L,4S_c,W) -> (L,4S_r,B,W)
    out = jax.lax.dot_general(
        mat, d2,
        dimension_numbers=(((2,), (2,)), ((0,), (1,))),
        preferred_element_type=jnp.int32)      # (L, 4S, B, W)
    out = jnp.moveaxis(out, 2, 0)              # (B, L, 4S, W)
    out = out.reshape(out.shape[:2] + (4, S, W))
    r = _recombine(out, tb, mx)                # (B, L, S, W)
    return r.reshape(lead + (L, S, W)) if lead else r[0]


def ntt_fwd_mxu(x, tb: nttm.NttTables, mx: MxuTables):
    """Bit-identical to ops/ntt.py ntt_fwd, sub-NTTs on the MXU."""
    n1, n2 = tb.n1, tb.n2
    lead = x.shape[:-1]
    p = tb.p[:, None]
    y = x.reshape(lead + (n1, n2))
    y = _sub_ntt_mxu(y, mx.m1, tb, mx)   # merged negacyclic (psi1 in matrix)
    y = y.reshape(lead + (tb.n,))
    y = mm.shoup_mul(y, tb.tw_mat, tb.tw_mat_sh, p)
    y = jnp.swapaxes(y.reshape(lead + (n1, n2)), -1, -2)
    y = _sub_ntt_mxu(y, mx.m2, tb, mx)
    return y.reshape(lead + (tb.n,))


def ntt_inv_mxu(x, tb: nttm.NttTables, mx: MxuTables):
    """Bit-identical to ops/ntt.py ntt_inv, sub-NTTs on the MXU."""
    n1, n2 = tb.n1, tb.n2
    lead = x.shape[:-1]
    p = tb.p[:, None]
    y = x.reshape(lead + (n2, n1))
    y = _sub_ntt_mxu(y, mx.im2, tb, mx)
    y = jnp.swapaxes(y, -1, -2).reshape(lead + (tb.n,))
    y = mm.shoup_mul(y, tb.itw_mat, tb.itw_mat_sh, p)
    y = y.reshape(lead + (n1, n2))
    # merged negacyclic inverse (psi1^{-i} in matrix; n^{-1} in itw_mat);
    # _sub_ntt_mxu output is already exact (< p)
    y = _sub_ntt_mxu(y, mx.im1, tb, mx)
    return y.reshape(lead + (tb.n,))
