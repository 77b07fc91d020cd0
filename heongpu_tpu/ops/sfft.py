"""Device special FFT for the CKKS canonical embedding (df64 precision).

TPU-native replacement for the reference's GPU-FFT encoder path
(src/lib/host/ckks/encoder.cu:103-220: GPU_Special_FFT with rot-group 5^i
ordered root tables; kernel/encoding.cu encode_kernel_ckks_conversion).
The radix-2 transform runs as log2(n) vectorized butterfly stages over
float32-pair (df64) complex arrays — everything on device, batched over a
leading axis; no host numpy FFT and no object-dtype big-int loops.

Layout trick: the forward transform is decimation-in-time with the
bit-reversal permutation composed into the (static, host-built) slot scatter
indices, and the inverse is decimation-in-frequency with bit-reversal
composed into the final slot gather — so no runtime permutation at all.

Conventions (match models/ckks._embed_coeffs_from_slots exactly):
  encode:  spec[nat(j)] = z_j, spec[conj] = conj(z_j);
           u = DFT_n(spec)/n;  a_i = Re(u_i * e^{-i*pi*i/n})
  decode:  spec = IDFT_n(a_i * e^{+i*pi*i/n}) * n;  z_j = spec[nat(j)]
"""

from __future__ import annotations

import dataclasses
from typing import Tuple

import numpy as np
import jax
import jax.numpy as jnp

from . import df64


def _bitrev(n: int) -> np.ndarray:
    L = n.bit_length() - 1
    idx = np.arange(n)
    out = np.zeros(n, np.int64)
    for b in range(L):
        out |= ((idx >> b) & 1) << (L - 1 - b)
    return out


def _slot_nat_index(n: int) -> np.ndarray:
    """Natural eval index of slot j (the 5^j orbit; see ckks._slot_eval_nat)."""
    m2 = 2 * n
    out = np.empty(n // 2, np.int64)
    g5 = 1
    for j in range(n // 2):
        out[j] = (g5 - 1) // 2
        g5 = g5 * 5 % m2
    return out


@dataclasses.dataclass(frozen=True)
class SfftTables:
    """Static per-n tables (a pytree; all leaves are device arrays)."""
    n: int
    # encode: scatter positions (bit-reversed) for z and conj(z)
    enc_pos: jnp.ndarray        # (n/2,) int32
    enc_pos_conj: jnp.ndarray   # (n/2,) int32
    # decode: gather positions (bit-reversed) for slots
    dec_pos: jnp.ndarray        # (n/2,) int32
    # stage twiddles, padded to (L, n/2): DIT stage s uses the first 2^s entries
    dit_re: Tuple               # df64 pair, (L, n/2)
    dit_im: Tuple
    dif_re: Tuple
    dif_im: Tuple
    # output/input phase twists e^{-i pi k/n} (encode, includes 1/n) and
    # e^{+i pi k/n} (decode), natural order
    twe_re: Tuple               # df64 pair, (n,)
    twe_im: Tuple
    twd_re: Tuple
    twd_im: Tuple


def _f2(x):
    return df64.from_f64(x)


jax.tree_util.register_dataclass(
    SfftTables,
    data_fields=["enc_pos", "enc_pos_conj", "dec_pos", "dit_re", "dit_im",
                 "dif_re", "dif_im", "twe_re", "twe_im", "twd_re", "twd_im"],
    meta_fields=["n"])


def build_tables(n: int) -> SfftTables:
    L = n.bit_length() - 1
    br = _bitrev(n)
    inv_br = np.argsort(br)
    nat = _slot_nat_index(n)
    conj_nat = n - 1 - nat                      # position of psi^{-(2e+1)}
    half = n // 2

    dit_re = np.zeros((L, half), np.float64)
    dit_im = np.zeros((L, half), np.float64)
    dif_re = np.zeros((L, half), np.float64)
    dif_im = np.zeros((L, half), np.float64)
    for s in range(L):
        m = 1 << s
        k = np.arange(m)
        w = np.exp(-2j * np.pi * k / (2 * m))   # forward kernel
        dit_re[s, :m] = w.real
        dit_im[s, :m] = w.imag
        h = n >> (s + 1)
        k = np.arange(h)
        w = np.exp(+2j * np.pi * k / (2 * h))   # inverse kernel
        dif_re[s, :h] = w.real
        dif_im[s, :h] = w.imag

    k = np.arange(n)
    twe = np.exp(-1j * np.pi * k / n) / n
    twd = np.exp(+1j * np.pi * k / n)

    return SfftTables(
        n=n,
        enc_pos=jnp.asarray(inv_br[nat].astype(np.int32)),
        enc_pos_conj=jnp.asarray(inv_br[conj_nat].astype(np.int32)),
        dec_pos=jnp.asarray(br[nat].astype(np.int32)),
        dit_re=_f2(dit_re), dit_im=_f2(dit_im),
        dif_re=_f2(dif_re), dif_im=_f2(dif_im),
        twe_re=_f2(twe.real), twe_im=_f2(twe.imag),
        twd_re=_f2(twd.real), twd_im=_f2(twd.imag),
    )


def _stage_slice(pair, s, m):
    return (pair[0][s, :m], pair[1][s, :m])


def _fft_dit(re, im, tabs: SfftTables):
    """Forward DFT; input bit-reversed, output natural.  re/im are df64 pairs
    of (..., n) arrays."""
    n = tabs.n
    L = n.bit_length() - 1
    for s in range(L):
        m = 1 << s
        g = n >> (s + 1)
        shp = re[0].shape[:-1]
        v_re = (re[0].reshape(shp + (g, 2, m)), re[1].reshape(shp + (g, 2, m)))
        v_im = (im[0].reshape(shp + (g, 2, m)), im[1].reshape(shp + (g, 2, m)))
        e = ((v_re[0][..., 0, :], v_re[1][..., 0, :]),
             (v_im[0][..., 0, :], v_im[1][..., 0, :]))
        o = ((v_re[0][..., 1, :], v_re[1][..., 1, :]),
             (v_im[0][..., 1, :], v_im[1][..., 1, :]))
        w = (_stage_slice(tabs.dit_re, s, m), _stage_slice(tabs.dit_im, s, m))
        wo = df64.cmul(w, o)
        top = df64.cadd(e, wo)
        bot = df64.csub(e, wo)
        re = (jnp.concatenate([top[0][0], bot[0][0]], axis=-1).reshape(shp + (n,)),
              jnp.concatenate([top[0][1], bot[0][1]], axis=-1).reshape(shp + (n,)))
        im = (jnp.concatenate([top[1][0], bot[1][0]], axis=-1).reshape(shp + (n,)),
              jnp.concatenate([top[1][1], bot[1][1]], axis=-1).reshape(shp + (n,)))
    return re, im


def _fft_dif_inv(re, im, tabs: SfftTables):
    """Inverse-kernel DFT (no 1/n); input natural, output bit-reversed."""
    n = tabs.n
    L = n.bit_length() - 1
    for s in range(L):
        h = n >> (s + 1)
        g = n // (2 * h)
        shp = re[0].shape[:-1]
        v_re = (re[0].reshape(shp + (g, 2, h)), re[1].reshape(shp + (g, 2, h)))
        v_im = (im[0].reshape(shp + (g, 2, h)), im[1].reshape(shp + (g, 2, h)))
        a0 = ((v_re[0][..., 0, :], v_re[1][..., 0, :]),
              (v_im[0][..., 0, :], v_im[1][..., 0, :]))
        a1 = ((v_re[0][..., 1, :], v_re[1][..., 1, :]),
              (v_im[0][..., 1, :], v_im[1][..., 1, :]))
        w = (_stage_slice(tabs.dif_re, s, h), _stage_slice(tabs.dif_im, s, h))
        top = df64.cadd(a0, a1)
        bot = df64.cmul(w, df64.csub(a0, a1))
        re = (jnp.stack([top[0][0], bot[0][0]], axis=-2).reshape(shp + (n,)),
              jnp.stack([top[0][1], bot[0][1]], axis=-2).reshape(shp + (n,)))
        im = (jnp.stack([top[1][0], bot[1][0]], axis=-2).reshape(shp + (n,)),
              jnp.stack([top[1][1], bot[1][1]], axis=-2).reshape(shp + (n,)))
    return re, im


def embed_from_slots(z_re, z_im, tabs: SfftTables):
    """slots (df64 pairs of (..., n/2)) -> real coeffs (df64 pair (..., n)),
    unscaled (device analog of ckks._embed_coeffs_from_slots)."""
    n = tabs.n
    shp = z_re[0].shape[:-1]
    zero = jnp.zeros(shp + (n,), jnp.float32)

    def scatter(dst, idx, val):
        return dst.at[..., idx].set(val)

    re = (scatter(scatter(zero, tabs.enc_pos, z_re[0]),
                  tabs.enc_pos_conj, z_re[0]),
          scatter(scatter(zero, tabs.enc_pos, z_re[1]),
                  tabs.enc_pos_conj, z_re[1]))
    im = (scatter(scatter(zero, tabs.enc_pos, z_im[0]),
                  tabs.enc_pos_conj, -z_im[0]),
          scatter(scatter(zero, tabs.enc_pos, z_im[1]),
                  tabs.enc_pos_conj, -z_im[1]))
    ure, uim = _fft_dit(re, im, tabs)
    # a = Re(u * twe):   (includes the 1/n)
    a = df64.sub(df64.mul(ure, tabs.twe_re), df64.mul(uim, tabs.twe_im))
    return a


def slots_from_embed(a, tabs: SfftTables):
    """real coeffs (df64 pair (..., n)) -> slot values (complex df64 pairs of
    (..., n/2)); device analog of ckks._slots_from_embed_coeffs."""
    yre = df64.mul(a, tabs.twd_re)
    yim = df64.mul(a, tabs.twd_im)
    sre, sim = _fft_dif_inv(yre, yim, tabs)
    zr = (sre[0][..., tabs.dec_pos], sre[1][..., tabs.dec_pos])
    zi = (sim[0][..., tabs.dec_pos], sim[1][..., tabs.dec_pos])
    return zr, zi
