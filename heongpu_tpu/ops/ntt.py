"""Negacyclic NTT/INTT over RNS primes, batched over limbs and polynomials.

TPU-native replacement for GPU-NTT (`gpuntt` merged-radix kernels used by the
reference at e.g. src/lib/host/bfv/operator.cu:376-391), built as a
**four-step NTT**: N = N1·N2, so the transform is

    N2 independent *merged negacyclic* CT-DIT NTTs of size N1 (axis -2)
    →  cross-twiddle psi^(i2)·w^(i2·j1)  →  transpose  →
    N1 independent cyclic GS-DIF NTTs of size N2 (axis -2)

The classic psi^i negacyclic pre-scale is GONE: its psi1^r part (psi1 =
psi^N2) is absorbed into the first sub-transform's stage twiddles (the
Harvey/SEAL merged form: stage twiddles are psi1 powers in bit-reversed
index order), and its psi^(i2) part is folded into the cross-twiddle table.
The inverse mirrors this — the n^{-1}·psi^{-i} post-scale folds into the
inverse cross-twiddle (n^{-1}·psi^{-i2}) and the merged GS-DIF stage
twiddles (psi1^{-r}).  Each direction saves one full (L, N) multiply pass
and two (L, N) tables of HBM traffic per transform.

Every butterfly runs along a *sublane* axis (full-width VPU vector ops, no
lane shuffles), there is exactly one transpose, and — crucially — there are
**zero data permutations**: like SEAL/GPU-NTT we keep the NTT domain in the
algorithm's natural storage order instead of bit-reversing.

Layout/ordering contract (framework-wide):
  * "coefficient domain": a[..., L, i] = coefficient of X^i reduced mod p_L.
  * "NTT domain": position p holds the evaluation a(psi^(2j+1)) where
    j = eval_order(n)[p]  (eval_order[p] = br2(p // N1)·N1 + br1(p % N1)).
    Pointwise ops never care; Galois/slot/monomial index tables are built
    against eval_order (ops/polyops.py, models/ckks.py).

The inverse runs the mirror chain (CT-DIT stages consume the bit-reversed
sub-order the forward produced) and folds n^{-1}·psi^{-i} into one table.

The same tables drive both the jnp stage path (XLA-fused, used on CPU and
for small N) and the fused Pallas TPU kernel (ops/ntt_pallas.py).
"""

from __future__ import annotations

import dataclasses
from functools import lru_cache, partial
from typing import Tuple

import numpy as np
import jax
import jax.numpy as jnp

from ..utils import nt
from . import modmath as mm


def split_n(n: int) -> Tuple[int, int]:
    """N1·N2 = N with N1 = 2^(logn//2) ≤ N2 (N2 is the lane-friendly axis)."""
    logn = n.bit_length() - 1
    n1 = 1 << (logn // 2)
    return n1, n // n1


@lru_cache(maxsize=None)
def eval_order(n: int) -> np.ndarray:
    """eval_order[p] = j such that NTT-domain position p holds a(psi^(2j+1))."""
    n1, n2 = split_n(n)
    b1 = n1.bit_length() - 1
    b2 = n2.bit_length() - 1
    r = np.arange(n1)
    s = np.arange(n2)
    br1 = np.array([nt.bit_reverse(int(i), b1) for i in r], np.int64)
    br2 = np.array([nt.bit_reverse(int(i), b2) for i in s], np.int64)
    return (br2[:, None] * n1 + br1[None, :]).reshape(-1).astype(np.int32)


@lru_cache(maxsize=None)
def inv_eval_order(n: int) -> np.ndarray:
    """inv_eval_order[j] = storage position of the evaluation at psi^(2j+1)."""
    eo = eval_order(n)
    ieo = np.empty_like(eo)
    ieo[eo] = np.arange(n, dtype=np.int32)
    return ieo


@partial(
    jax.tree_util.register_dataclass,
    data_fields=[
        "p", "pinv", "r2", "mu", "r1", "r1_sh",
        "psi", "psi_sh", "ipsi_n", "ipsi_n_sh",
        "tw_mat", "tw_mat_sh", "itw_mat", "itw_mat_sh",
        "tw1", "tw1_sh", "itw1", "itw1_sh",
        "tw2", "tw2_sh", "itw2", "itw2_sh", "mxu",
    ],
    meta_fields=["n", "logn", "n1", "n2"],
)
@dataclasses.dataclass(frozen=True)
class NttTables:
    """Per-prime-set NTT tables; a JAX pytree so jitted fns take it as an arg.

    Shapes: per-limb constants (L,); psi/ipsi_n/tw_mat tables (L, N);
    stage-s twiddles (L, 2^(s-1)) for the size-N1 (tw1) / size-N2 (tw2)
    sub-transforms.

    Semantics: tw1/itw1 are MERGED-negacyclic stage tables (psi1-power
    twiddles in bit-reversed index order, consumed by _merged_ct_stages /
    _merged_gs_stages); tw2/itw2 are plain cyclic GS/CT stage tables.
    tw_mat carries the folded psi^(i2) factor and itw_mat the folded
    n^{-1}·psi^{-i2} factor (see module docstring).  psi/ipsi_n remain the
    raw psi^i / n^{-1}·psi^{-i} power tables for host-side consumers
    (encoder twists, TFHE key prep) — the transform itself no longer reads
    them."""
    n: int
    logn: int
    n1: int
    n2: int
    p: jnp.ndarray
    pinv: jnp.ndarray
    r2: jnp.ndarray
    mu: jnp.ndarray
    r1: jnp.ndarray
    r1_sh: jnp.ndarray
    psi: jnp.ndarray
    psi_sh: jnp.ndarray
    ipsi_n: jnp.ndarray
    ipsi_n_sh: jnp.ndarray
    tw_mat: jnp.ndarray
    tw_mat_sh: jnp.ndarray
    itw_mat: jnp.ndarray
    itw_mat_sh: jnp.ndarray
    tw1: Tuple[jnp.ndarray, ...]
    tw1_sh: Tuple[jnp.ndarray, ...]
    itw1: Tuple[jnp.ndarray, ...]
    itw1_sh: Tuple[jnp.ndarray, ...]
    tw2: Tuple[jnp.ndarray, ...]
    tw2_sh: Tuple[jnp.ndarray, ...]
    itw2: Tuple[jnp.ndarray, ...]
    itw2_sh: Tuple[jnp.ndarray, ...]
    mxu: object = None            # Optional MxuTables (ops/ntt_mxu.py)

    @property
    def num_limbs(self) -> int:
        return self.p.shape[0]

    @property
    def brev(self) -> jnp.ndarray:  # legacy alias: storage order table
        return jnp.asarray(eval_order(self.n))

    def slice_limbs(self, lo: int, hi: int) -> "NttTables":
        """Tables restricted to limbs [lo, hi) — used for leveled CKKS ops."""
        take = lambda a: a[lo:hi]
        return NttTables(
            n=self.n, logn=self.logn, n1=self.n1, n2=self.n2,
            p=take(self.p), pinv=take(self.pinv), r2=take(self.r2),
            mu=take(self.mu), r1=take(self.r1), r1_sh=take(self.r1_sh),
            psi=take(self.psi), psi_sh=take(self.psi_sh),
            ipsi_n=take(self.ipsi_n), ipsi_n_sh=take(self.ipsi_n_sh),
            tw_mat=take(self.tw_mat), tw_mat_sh=take(self.tw_mat_sh),
            itw_mat=take(self.itw_mat), itw_mat_sh=take(self.itw_mat_sh),
            tw1=tuple(take(t) for t in self.tw1),
            tw1_sh=tuple(take(t) for t in self.tw1_sh),
            itw1=tuple(take(t) for t in self.itw1),
            itw1_sh=tuple(take(t) for t in self.itw1_sh),
            tw2=tuple(take(t) for t in self.tw2),
            tw2_sh=tuple(take(t) for t in self.tw2_sh),
            itw2=tuple(take(t) for t in self.itw2),
            itw2_sh=tuple(take(t) for t in self.itw2_sh),
            mxu=self.mxu.slice_limbs(lo, hi) if self.mxu is not None else None,
        )


def pow_series(base: int, n: int, p: int) -> np.ndarray:
    """[base^0, base^1, ..., base^(n-1)] mod p as uint32, vectorised.

    log2(n) numpy passes via binary exponent decomposition (p < 2**30 so
    intermediate products fit uint64)."""
    out = np.ones(n, dtype=np.uint64)
    e = np.arange(n, dtype=np.uint64)
    sq = np.uint64(base % p)
    pu = np.uint64(p)
    bit = 0
    while (1 << bit) < max(n, 2):
        mask = (e >> np.uint64(bit)) & np.uint64(1)
        out = np.where(mask == 1, out * sq % pu, out)
        sq = sq * sq % pu
        bit += 1
    return out.astype(np.uint32)


def shoup_np(w: np.ndarray, p: int) -> np.ndarray:
    """Vectorised floor(w * 2**32 / p) (fits uint64 for p < 2**30)."""
    return ((w.astype(np.uint64) << np.uint64(32)) // np.uint64(p)).astype(np.uint32)


def _stage_tables(w_sub: int, size: int, p: int):
    """Twiddle arrays for a size-`size` cyclic sub-NTT with primitive root
    w_sub: stage s (m = 2^s) uses w_m^t = w_sub^((size/m)·t), t < m/2."""
    logm = size.bit_length() - 1
    tw, tw_sh = [], []
    for s in range(1, logm + 1):
        m = 1 << s
        wm = pow(w_sub, size // m, p)
        ts = pow_series(wm, m // 2, p)
        tw.append(ts)
        tw_sh.append(shoup_np(ts, p))
    return tw, tw_sh


def _merged_stage_tables(psi_sub: int, size: int, p: int):
    """Merged-negacyclic stage twiddles for a size-`size` sub-NTT: stage s
    (m = 2^(s-1) butterfly groups) uses S_i = psi_sub^(bitrev_log2(size)(m+i))
    for i < m — the Harvey/SEAL form that needs no psi pre/post-scale.
    Same shapes as _stage_tables (stage s -> (m,) = (2^(s-1),))."""
    logm = size.bit_length() - 1
    pows = pow_series(psi_sub, size, p)
    tw, tw_sh = [], []
    for s in range(1, logm + 1):
        m = 1 << (s - 1)
        idx = np.array([nt.bit_reverse(m + i, logm) for i in range(m)],
                       np.int64)
        ts = pows[idx]
        tw.append(ts)
        tw_sh.append(shoup_np(ts, p))
    return tw, tw_sh


def build_ntt_tables(primes, n: int, psis=None, use_mxu=None) -> NttTables:
    """Host-side table construction (numpy / python ints).

    use_mxu: attach int8 digit-plane matrices so ntt_fwd/ntt_inv run the
    sub-transforms on the MXU (ops/ntt_mxu.py).  Default OFF: in fused
    pipelines XLA folds neighboring elementwise work into the VPU stage
    path, which measures faster end-to-end (458 vs 379 ops/s on the
    N=2^16 mult+relin chain); the MXU path remains available for
    workloads that saturate the VPU elsewhere."""
    logn = n.bit_length() - 1
    assert 1 << logn == n
    n1, n2 = split_n(n)
    b1 = n1.bit_length() - 1
    L = len(primes)
    for p in primes:
        assert p < (1 << 30), "framework requires primes < 2**30 for lazy headroom"
        assert (p - 1) % (2 * n) == 0

    if psis is None:
        psis = [nt.minimal_primitive_root_2n(2 * n, p) for p in primes]

    p_a = np.array(primes, dtype=np.uint32)
    pinv_a = np.array([mm.mont_pinv(p) for p in primes], dtype=np.uint32)
    r2_a = np.array([mm.mont_r2(p) for p in primes], dtype=np.uint32)
    mu_a = np.array([mm.barrett_mu(p) for p in primes], dtype=np.uint32)
    r1_l = [mm.mont_r1(p) for p in primes]
    r1_a = np.array(r1_l, dtype=np.uint32)
    r1_sh_a = np.array([mm.shoup(r, p) for r, p in zip(r1_l, primes)],
                       dtype=np.uint32)

    br1 = np.array([nt.bit_reverse(i, b1) for i in range(n1)], np.int64)

    psi_pows = np.empty((L, n), np.uint32)
    psi_sh = np.empty((L, n), np.uint32)
    ipsi_n = np.empty((L, n), np.uint32)
    ipsi_n_sh = np.empty((L, n), np.uint32)
    tw_mat = np.empty((L, n), np.uint32)
    tw_mat_sh = np.empty((L, n), np.uint32)
    itw_mat = np.empty((L, n), np.uint32)
    itw_mat_sh = np.empty((L, n), np.uint32)
    tw1 = [np.empty((L, 1 << (s - 1)), np.uint32) for s in range(1, b1 + 1)]
    tw1_sh = [np.empty_like(t) for t in tw1]
    itw1 = [np.empty_like(t) for t in tw1]
    itw1_sh = [np.empty_like(t) for t in tw1]
    b2 = n2.bit_length() - 1
    tw2 = [np.empty((L, 1 << (s - 1)), np.uint32) for s in range(1, b2 + 1)]
    tw2_sh = [np.empty_like(t) for t in tw2]
    itw2 = [np.empty_like(t) for t in tw2]
    itw2_sh = [np.empty_like(t) for t in tw2]

    from ..utils import native
    use_native = native.available()

    for li, (p, psi) in enumerate(zip(primes, psis)):
        w = psi * psi % p
        iw = pow(w, -1, p)
        if use_native:
            a, b, c, d = native.psi_tables(psi, n, p)
            psi_pows[li], psi_sh[li], ipsi_n[li], ipsi_n_sh[li] = a, b, c, d
            pp = a
        else:
            ninv = pow(n, -1, p)
            ipsi = pow(psi, -1, p)
            pp = pow_series(psi, n, p)
            psi_pows[li] = pp
            psi_sh[li] = shoup_np(pp, p)
            ip = (pow_series(ipsi, n, p).astype(np.uint64)
                  * np.uint64(ninv) % np.uint64(p))
            ipsi_n[li] = ip.astype(np.uint32)
            ipsi_n_sh[li] = shoup_np(ip, p)

        # cross twiddle with the folded negacyclic factors:
        #   fwd: tw_mat[r·N2 + i2] = psi^(i2) · w^(i2 · br1(r))
        #   inv: itw_mat[r·N2 + i2] = n^{-1}·psi^{-i2} · w^{-i2 · br1(r)}
        ipr = ipsi_n[li]                      # n^{-1}·psi^{-i} powers
        wp = pow_series(w, n, p).astype(np.uint64)  # w^e for e < n
        e = (np.arange(n2, dtype=np.int64)[None, :] * br1[:, None]) % n
        pu = np.uint64(p)
        tm = (wp[e] * pp[:n2].astype(np.uint64)[None, :] % pu)
        tm = tm.reshape(-1).astype(np.uint32)
        tw_mat[li] = tm
        tw_mat_sh[li] = shoup_np(tm, p)
        iwp = pow_series(iw, n, p).astype(np.uint64)
        itm = (iwp[e] * ipr[:n2].astype(np.uint64)[None, :] % pu)
        itm = itm.reshape(-1).astype(np.uint32)
        itw_mat[li] = itm
        itw_mat_sh[li] = shoup_np(itm, p)

        psi1 = pow(psi, n2, p)   # psi1^2 = w1, order 2·n1 (negacyclic n1)
        w2 = pow(w, n1, p)       # order n2
        a, b = _merged_stage_tables(psi1, n1, p)
        ia, ib = _merged_stage_tables(pow(psi1, -1, p), n1, p)
        for s in range(b1):
            tw1[s][li] = a[s]
            tw1_sh[s][li] = b[s]
            itw1[s][li] = ia[s]
            itw1_sh[s][li] = ib[s]
        a, b = _stage_tables(w2, n2, p)
        ia, ib = _stage_tables(pow(w2, -1, p), n2, p)
        for s in range(b2):
            tw2[s][li] = a[s]
            tw2_sh[s][li] = b[s]
            itw2[s][li] = ia[s]
            itw2_sh[s][li] = ib[s]

    if use_mxu is None:
        use_mxu = False
    mxu = None
    if use_mxu:
        from . import ntt_mxu
        mxu = ntt_mxu.build_mxu_tables(primes, n)

    j = jnp.asarray
    return NttTables(
        n=n, logn=logn, n1=n1, n2=n2, mxu=mxu,
        p=j(p_a), pinv=j(pinv_a), r2=j(r2_a), mu=j(mu_a),
        r1=j(r1_a), r1_sh=j(r1_sh_a),
        psi=j(psi_pows), psi_sh=j(psi_sh),
        ipsi_n=j(ipsi_n), ipsi_n_sh=j(ipsi_n_sh),
        tw_mat=j(tw_mat), tw_mat_sh=j(tw_mat_sh),
        itw_mat=j(itw_mat), itw_mat_sh=j(itw_mat_sh),
        tw1=tuple(j(t) for t in tw1), tw1_sh=tuple(j(t) for t in tw1_sh),
        itw1=tuple(j(t) for t in itw1), itw1_sh=tuple(j(t) for t in itw1_sh),
        tw2=tuple(j(t) for t in tw2), tw2_sh=tuple(j(t) for t in tw2_sh),
        itw2=tuple(j(t) for t in itw2), itw2_sh=tuple(j(t) for t in itw2_sh),
    )


def _merged_ct_stages(y, tws, tws_sh, p):
    """Merged-negacyclic CT-DIT stages along axis -2 of (..., L, S, W):
    natural order in, bit-reversed order out, psi pre-scale absorbed into
    the twiddles (tables from _merged_stage_tables).  Stage s has m=2^(s-1)
    butterfly groups of span t = S/(2m): (u, v) -> (u + S·v, u − S·v).

    Harvey-lazy: inputs/outputs in [0, 2p)."""
    shp = y.shape
    size = shp[-2]
    pb = p[:, None, None, None]
    p2 = pb + pb
    for s in range(1, len(tws) + 1):
        m = 1 << (s - 1)
        t = size // (2 * m)
        z = y.reshape(shp[:-2] + (m, 2, t, shp[-1]))
        u = z[..., 0, :, :]
        v = z[..., 1, :, :]
        tw = tws[s - 1][:, :, None, None]
        tw_sh = tws_sh[s - 1][:, :, None, None]
        tt = mm.shoup_mul_lazy(v, tw, tw_sh, pb)
        y = jnp.stack(
            [mm.cond_sub(u + tt, p2), mm.cond_sub((u + p2) - tt, p2)],
            axis=-3).reshape(shp)
    return y


def _merged_gs_stages(y, tws, tws_sh, p):
    """Merged-negacyclic GS-DIF stages along axis -2: bit-reversed in,
    natural out, psi^{-r} post-scale absorbed into the twiddles (only the
    n^{-1} factor is left for the caller to fold elsewhere).  Stage order
    mirrors _merged_ct_stages (consumed largest m first):
    (u, v) -> (u + v, (u − v)·S).  Harvey-lazy: values in [0, 2p)."""
    shp = y.shape
    size = shp[-2]
    pb = p[:, None, None, None]
    p2 = pb + pb
    for s in reversed(range(1, len(tws) + 1)):
        m = 1 << (s - 1)
        t = size // (2 * m)
        z = y.reshape(shp[:-2] + (m, 2, t, shp[-1]))
        u = z[..., 0, :, :]
        v = z[..., 1, :, :]
        tw = tws[s - 1][:, :, None, None]
        tw_sh = tws_sh[s - 1][:, :, None, None]
        tt = mm.shoup_mul_lazy((u + p2) - v, tw, tw_sh, pb)
        y = jnp.stack([mm.cond_sub(u + v, p2), tt],
                      axis=-3).reshape(shp)
    return y


def _gs_stages(y, tws, tws_sh, p):
    """Gentleman-Sande (DIF) stages along axis -2 of (..., L, S, W):
    natural order in, bit-reversed order out.  Twiddle s has shape (L, 2^(s-1))
    and is consumed from the largest stage down.

    Harvey-lazy: values stay in [0, 2p) across stages.  The add branch
    reduces u+v < 4p by one conditional 2p; the twiddle branch uses the
    lazy Shoup form on (u + 2p) - v < 4p, landing in [0, 2p) with no
    conditional at all.  Callers do one deferred reduction at the end."""
    shp = y.shape
    size = shp[-2]
    pb = p[:, None, None, None]
    p2 = pb + pb
    for s in reversed(range(1, len(tws) + 1)):
        m = 1 << s
        z = y.reshape(shp[:-2] + (size // m, m, shp[-1]))
        u = z[..., : m // 2, :]
        v = z[..., m // 2:, :]
        tw = tws[s - 1][:, None, :, None]
        tw_sh = tws_sh[s - 1][:, None, :, None]
        t = mm.shoup_mul_lazy((u + p2) - v, tw, tw_sh, pb)
        y = jnp.concatenate([mm.cond_sub(u + v, p2), t],
                            axis=-2).reshape(shp)
    return y


def _ct_stages(y, tws, tws_sh, p):
    """Cooley-Tukey (DIT) stages along axis -2: bit-reversed in, natural out.

    Harvey-lazy like _gs_stages: t = lazy-Shoup(v·tw) in [0, 2p); both
    output branches reduce by one conditional 2p back into [0, 2p)."""
    shp = y.shape
    size = shp[-2]
    pb = p[:, None, None, None]
    p2 = pb + pb
    for s in range(1, len(tws) + 1):
        m = 1 << s
        z = y.reshape(shp[:-2] + (size // m, m, shp[-1]))
        u = z[..., : m // 2, :]
        v = z[..., m // 2:, :]
        tw = tws[s - 1][:, None, :, None]
        tw_sh = tws_sh[s - 1][:, None, :, None]
        t = mm.shoup_mul_lazy(v, tw, tw_sh, pb)
        y = jnp.concatenate(
            [mm.cond_sub(u + t, p2), mm.cond_sub((u + p2) - t, p2)],
            axis=-2).reshape(shp)
    return y


import os

# Transform backend: "auto" (fused Pallas VMEM kernel on TPU — measured
# 495 vs 465 ops/s on the N=2^16 flagship chain — jnp stage path on CPU,
# where the Pallas interpreter is slow), "stages", or "pallas".  Tables with
# an attached MXU plan always take the MXU path.  Trace-time static, so it
# can be flipped per-process via HEONGPU_NTT or set_backend() for A/B runs.
_BACKEND = os.environ.get("HEONGPU_NTT", "auto")


def set_backend(name: str) -> None:
    """'auto', 'stages' or 'pallas' (module-wide; affects later traces)."""
    global _BACKEND
    assert name in ("auto", "stages", "pallas"), name
    _BACKEND = name


def _use_pallas() -> bool:
    if _BACKEND == "auto":
        import jax
        return jax.default_backend() not in ("cpu",)
    return _BACKEND == "pallas"


# Per-limb twiddle tables above this size route to the stage path even when
# pallas is selected: a pallas call whose operands (input + output + the two
# (L, N) twiddle matrices) appear as short-lived edges inside a larger XLA
# program gets ALL of them stack-allocated in scoped VMEM (16 MiB); measured
# at N=2^16: L=12 compiles everywhere (flagship), L=48/52 fails with a
# 45-54 MB scoped allocation even after row-splitting, because each split
# slice is itself such an edge.  4 MB/table keeps the validated small-L hot
# shapes on pallas and sends the wide keygen/bootstrap QP bases (L > 16 at
# N=2^16) to the jnp stage path, which streams from HBM.
_PALLAS_TABLE_LIMIT = 4 << 20


def _pallas_fits(tb: "NttTables") -> bool:
    return tb.num_limbs * tb.n * 4 <= _PALLAS_TABLE_LIMIT


def ntt_fwd(x, tb: NttTables):
    """Coefficient domain -> NTT domain (storage order eval_order).
    x: (..., L, N) uint32, values < p."""
    if tb.mxu is not None:
        from . import ntt_mxu
        return ntt_mxu.ntt_fwd_mxu(x, tb, tb.mxu)
    if _use_pallas() and _pallas_fits(tb):
        from . import ntt_pallas
        return ntt_pallas.ntt_pallas(x, tb, inverse=False)
    n1, n2 = tb.n1, tb.n2
    lead = x.shape[:-1]
    p = tb.p[:, None]
    y = x.reshape(lead + (n1, n2))
    y = _merged_ct_stages(y, tb.tw1, tb.tw1_sh, tb.p)
    y = y.reshape(lead + (tb.n,))
    y = mm.shoup_mul_lazy(y, tb.tw_mat, tb.tw_mat_sh, p)
    y = jnp.swapaxes(y.reshape(lead + (n1, n2)), -1, -2)
    y = _gs_stages(y, tb.tw2, tb.tw2_sh, tb.p)
    # single deferred reduction from the lazy [0, 2p) stage range
    return mm.cond_sub(y.reshape(lead + (tb.n,)), p)


def ntt_inv(x, tb: NttTables):
    """NTT domain (storage order) -> coefficient domain."""
    if tb.mxu is not None:
        from . import ntt_mxu
        return ntt_mxu.ntt_inv_mxu(x, tb, tb.mxu)
    if _use_pallas() and _pallas_fits(tb):
        from . import ntt_pallas
        return ntt_pallas.ntt_pallas(x, tb, inverse=True)
    n1, n2 = tb.n1, tb.n2
    lead = x.shape[:-1]
    p = tb.p[:, None]
    y = x.reshape(lead + (n2, n1))
    y = _ct_stages(y, tb.itw2, tb.itw2_sh, tb.p)
    y = jnp.swapaxes(y, -1, -2).reshape(lead + (tb.n,))
    y = mm.shoup_mul_lazy(y, tb.itw_mat, tb.itw_mat_sh, p)
    y = y.reshape(lead + (n1, n2))
    y = _merged_gs_stages(y, tb.itw1, tb.itw1_sh, tb.p)
    y = y.reshape(lead + (tb.n,))
    # n^{-1}·psi^{-i} is already folded into itw_mat/itw1; one deferred
    # reduction from the lazy [0, 2p) stage range makes the output exact
    return mm.cond_sub(y, p)


def ntt_naive_host(a, p: int, psi: int):
    """O(N^2) reference for tests: evaluations at psi^(2j+1) in NATURAL j
    order, python ints.  Device NTT position p holds want[eval_order(n)[p]]."""
    n = len(a)
    out = []
    for j in range(n):
        pt = pow(psi, 2 * j + 1, p)
        acc = 0
        x = 1
        for i in range(n):
            acc = (acc + a[i] * x) % p
            x = x * pt % p
        out.append(acc)
    return out
