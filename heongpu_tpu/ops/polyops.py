"""Polynomial-ring structural ops: Galois automorphisms and negacyclic shifts.

TPU analog of the reference's permutation kernels
(kernel/keygeneration.cu `permutation`/`steps_to_galois_elt`,
kernel/switchkey.cu `galois_permute_ntt_pql_kernel`,
`negacyclic_shift_poly_coeffmod_kernel`).  Both domains reduce to a fixed
gather (+ sign fixup in coefficient domain), which XLA lowers to a single
dynamic-gather — no hand scheduling needed.

NTT-domain convention (see ops/ntt.py): index j holds the evaluation at
psi^(2j+1), natural j order, so sigma_g acts as j -> j' with
2j'+1 = g*(2j+1) mod 2N.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from . import modmath as mm


def steps_to_galois_elt(step: int, n: int) -> int:
    """Rotation step -> Galois element 5^step mod 2n (negative steps wrap)."""
    m = 2 * n
    step = step % (n // 2)
    return pow(5, step, m)


GALOIS_CONJ = "conj"  # column-swap / conjugation element: 2n - 1


def galois_perm_coeff(g: int, n: int):
    """Host: coefficient-domain automorphism tables.

    Returns (src_index[n] int32, negate[n] uint32) such that
    out[j] = (-1)^negate[j] * in[src_index[j]].
    """
    m = 2 * n
    i = np.arange(n, dtype=np.int64)
    r = (i * g) % m
    wrap = r >= n
    dst = np.where(wrap, r - n, r)
    src = np.empty(n, np.int32)
    neg = np.empty(n, np.uint32)
    src[dst] = i
    neg[dst] = wrap
    return jnp.asarray(src), jnp.asarray(neg)


def galois_perm_ntt(g: int, n: int):
    """Host: NTT-domain automorphism gather table in the framework's NTT
    storage order (ops/ntt.py eval_order): out[p] = in[perm[p]].

    In natural evaluation order sigma_g maps eval index j to source
    j' = (g·(2j+1)-1)/2 mod n; storage positions compose with eval_order
    (the reference's galois_permute_ntt_pql_kernel bakes the same
    bit-reversal composition into its index formula, switchkey.cuh:163-168).
    """
    from . import ntt as nttm
    m = 2 * n
    eo = nttm.eval_order(n).astype(np.int64)
    ieo = nttm.inv_eval_order(n).astype(np.int64)
    j = eo                                   # natural eval index at position p
    src_nat = ((g * (2 * j + 1)) % m - 1) // 2
    return jnp.asarray(ieo[src_nat].astype(np.int32))


def apply_galois_coeff(x, src, neg, p):
    """x: (..., L, N) coeff domain; p broadcastable (L, 1)."""
    y = jnp.take(x, src, axis=-1)
    flip = jnp.take(neg, jnp.arange(neg.shape[0]), axis=0)  # (N,)
    return jnp.where(flip.astype(bool), mm.neg_mod(y, p), y)


def apply_galois_ntt(x, perm):
    return jnp.take(x, perm, axis=-1)


def negacyclic_shift_tables(k: int, n: int):
    """Host tables for multiplication by X^k (k may be negative)."""
    k = k % (2 * n)
    i = np.arange(n, dtype=np.int64)
    j = (i + k) % (2 * n)
    wrap = j >= n
    dst = np.where(wrap, j - n, j)
    src = np.empty(n, np.int32)
    neg = np.empty(n, np.uint32)
    src[dst] = i
    neg[dst] = wrap
    return jnp.asarray(src), jnp.asarray(neg)


def negacyclic_shift(x, src, neg, p):
    y = jnp.take(x, src, axis=-1)
    return jnp.where(neg.astype(bool), mm.neg_mod(y, p), y)
