"""Negacyclic NTT/INTT over RNS primes, batched over limbs and polynomials.

TPU-native replacement for GPU-NTT (`gpuntt` merged-radix kernels used by the
reference at e.g. src/lib/host/bfv/operator.cu:376-391).  Instead of CUDA
shared-memory butterfly stages, we express the transform as log2(N) fully
vectorised stages over a (..., L, N) array: XLA fuses each stage into a few
large VPU ops, and the limb axis L is the natural sharding axis for a device
mesh (each limb is an independent transform).

Layout/ordering contract (framework-wide):
  * "coefficient domain": a[..., L, i] = coefficient of X^i reduced mod p_L.
  * "NTT domain": A[..., L, j] = a(psi * w^j) where w = psi^2 is an N-th root
    of unity mod p_L and psi is a primitive 2N-th root — i.e. evaluations at
    the odd powers psi^(2j+1) in *natural j order*.  Galois automorphisms act
    on this layout as a fixed gather (see ops/polyops.py).

Negacyclic handling: forward pre-scales by psi^i then runs a cyclic NTT
(bit-reverse gather + Cooley-Tukey stages); inverse runs the conjugate stages
then post-scales by psi^{-i} * N^{-1} (folded into one table).
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


@partial(
    jax.tree_util.register_dataclass,
    data_fields=[
        "p", "pinv", "r2", "mu", "r1", "r1_sh",
        "psi", "psi_sh", "ipsi_n", "ipsi_n_sh",
        "brev", "tw", "tw_sh", "itw", "itw_sh",
    ],
    meta_fields=["n", "logn"],
)
@dataclasses.dataclass(frozen=True)
class NttTables:
    """Per-prime-set NTT tables; a JAX pytree so jitted fns take it as an arg.

    All arrays are uint32 except `brev` (int32).  Shapes: per-limb constants
    (L,), psi tables (L, N), stage s twiddles (L, 2^(s-1)).
    """
    n: int
    logn: int
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
    brev: jnp.ndarray
    tw: Tuple[jnp.ndarray, ...]
    tw_sh: Tuple[jnp.ndarray, ...]
    itw: Tuple[jnp.ndarray, ...]
    itw_sh: Tuple[jnp.ndarray, ...]

    @property
    def num_limbs(self) -> int:
        return self.p.shape[0]

    def slice_limbs(self, lo: int, hi: int) -> "NttTables":
        """Tables restricted to limbs [lo, hi) — used for leveled CKKS ops."""
        take = lambda a: a[lo:hi]
        return NttTables(
            n=self.n, logn=self.logn,
            p=take(self.p), pinv=take(self.pinv), r2=take(self.r2),
            mu=take(self.mu), r1=take(self.r1), r1_sh=take(self.r1_sh),
            psi=take(self.psi), psi_sh=take(self.psi_sh),
            ipsi_n=take(self.ipsi_n), ipsi_n_sh=take(self.ipsi_n_sh),
            brev=self.brev,
            tw=tuple(take(t) for t in self.tw),
            tw_sh=tuple(take(t) for t in self.tw_sh),
            itw=tuple(take(t) for t in self.itw),
            itw_sh=tuple(take(t) for t in self.itw_sh),
        )


def pow_series(base: int, n: int, p: int) -> np.ndarray:
    """[base^0, base^1, ..., base^(n-1)] mod p as uint32, vectorised.

    log2(n) numpy passes via binary exponent decomposition (p < 2**30 so
    intermediate products fit uint64).
    """
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


def build_ntt_tables(primes, n: int, psis=None) -> NttTables:
    """Host-side table construction (numpy / python ints)."""
    logn = n.bit_length() - 1
    assert 1 << logn == n
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

    psi_pows = np.empty((L, n), dtype=np.uint32)
    psi_sh = np.empty((L, n), dtype=np.uint32)
    ipsi_n = np.empty((L, n), dtype=np.uint32)
    ipsi_n_sh = np.empty((L, n), dtype=np.uint32)
    tw = [np.empty((L, 1 << (s - 1)), dtype=np.uint32) for s in range(1, logn + 1)]
    tw_sh = [np.empty_like(t) for t in tw]
    itw = [np.empty_like(t) for t in tw]
    itw_sh = [np.empty_like(t) for t in tw]

    for li, (p, psi) in enumerate(zip(primes, psis)):
        w = psi * psi % p
        ninv = pow(n, -1, p)
        ipsi = pow(psi, -1, p)
        pp = pow_series(psi, n, p)
        psi_pows[li] = pp
        psi_sh[li] = shoup_np(pp, p)
        ip = pow_series(ipsi, n, p).astype(np.uint64) * np.uint64(ninv) % np.uint64(p)
        ipsi_n[li] = ip.astype(np.uint32)
        ipsi_n_sh[li] = shoup_np(ip, p)
        for s in range(1, logn + 1):
            m = 1 << s
            wm = pow(w, n // m, p)
            iwm = pow(wm, -1, p)
            ts = pow_series(wm, m // 2, p)
            its = pow_series(iwm, m // 2, p)
            tw[s - 1][li] = ts
            tw_sh[s - 1][li] = shoup_np(ts, p)
            itw[s - 1][li] = its
            itw_sh[s - 1][li] = shoup_np(its, p)

    brev = np.array([nt.bit_reverse(i, logn) for i in range(n)], dtype=np.int32)

    j = jnp.asarray
    return NttTables(
        n=n, logn=logn,
        p=j(p_a), pinv=j(pinv_a), r2=j(r2_a), mu=j(mu_a),
        r1=j(r1_a), r1_sh=j(r1_sh_a),
        psi=j(psi_pows), psi_sh=j(psi_sh),
        ipsi_n=j(ipsi_n), ipsi_n_sh=j(ipsi_n_sh),
        brev=j(brev),
        tw=tuple(j(t) for t in tw), tw_sh=tuple(j(t) for t in tw_sh),
        itw=tuple(j(t) for t in itw), itw_sh=tuple(j(t) for t in itw_sh),
    )


def _stages(x, tws, tws_sh, p):
    """Cooley-Tukey butterfly stages; x (..., L, N) bit-reversed in, natural out."""
    shp = x.shape
    n = shp[-1]
    pb = p[:, None, None]
    for s, (tw, tw_sh) in enumerate(zip(tws, tws_sh), start=1):
        m = 1 << s
        y = x.reshape(shp[:-1] + (n // m, m))
        u = y[..., : m // 2]
        v = y[..., m // 2:]
        t = mm.shoup_mul(v, tw[:, None, :], tw_sh[:, None, :], pb)
        x = jnp.concatenate(
            [mm.add_mod(u, t, pb), mm.sub_mod(u, t, pb)], axis=-1
        ).reshape(shp)
    return x


def ntt_fwd(x, tb: NttTables):
    """Coefficient domain -> NTT domain.  x: (..., L, N) uint32, values < p."""
    p = tb.p[:, None]
    y = mm.shoup_mul(x, tb.psi, tb.psi_sh, p)
    y = jnp.take(y, tb.brev, axis=-1)
    return _stages(y, tb.tw, tb.tw_sh, tb.p)


def ntt_inv(x, tb: NttTables):
    """NTT domain -> coefficient domain."""
    y = jnp.take(x, tb.brev, axis=-1)
    y = _stages(y, tb.itw, tb.itw_sh, tb.p)
    return mm.shoup_mul(y, tb.ipsi_n, tb.ipsi_n_sh, tb.p[:, None])


def ntt_naive_host(a, p: int, psi: int):
    """O(N^2) reference for tests: evaluate at psi^(2j+1), python ints."""
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
