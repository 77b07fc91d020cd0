"""CSPRNG facade: uniform / gaussian / ternary sampling directly into RNS form.

TPU-native replacement for RNGonGPU's AES-CTR DRBG facade
(reference util/random.cuh:52-714: modular_{uniform,gaussian,ternary}_
random_number_generation).  We use JAX's counter-based Threefry PRNG keyed
from OS entropy; like the reference, the same facade is re-seedable with a
common seed so MPC parties can derive a common reference string
(reference src/lib/host/bfv/mpcmanager.cu:1578 RNG.set(common_seed)).

All samplers return uint32 residue arrays of shape (..., L, N) given a prime
vector of shape (L,).  Uniform sampling draws 64 bits per element and reduces
mod p so the statistical bias is < 2^-34 (a single 32-bit draw mod a ~30-bit
prime would be unusably biased).
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp
import numpy as np

from ..ops import modmath as mm

ERROR_STD_DEV = 3.2  # sigma of the centered discrete gaussian (reference secstdparams.h)
GAUSS_TAIL = 6  # truncate at 6 sigma like common HE implementations


def new_key(seed: int | None = None) -> jax.Array:
    """Fresh PRNG key; seeded from OS entropy unless an explicit seed is given
    (explicit seeds = the MPC common-reference-string path)."""
    if seed is None:
        seed = int.from_bytes(os.urandom(8), "little") >> 1
    return jax.random.PRNGKey(seed)


def _prime_consts(primes):
    p = jnp.asarray(np.asarray(primes, dtype=np.uint32))
    mu = jnp.asarray(np.array([mm.barrett_mu(int(q)) for q in primes], np.uint32))
    r1 = np.array([mm.mont_r1(int(q)) for q in primes], np.uint64)
    r1s = np.array([mm.shoup(int(r), int(q)) for r, q in zip(r1, primes)], np.uint32)
    return p, mu, jnp.asarray(r1.astype(np.uint32)), jnp.asarray(r1s)


def uniform_rns(key, primes, shape) -> jnp.ndarray:
    """Uniform in [0, p) independently per limb; output (*shape[:-1], L, N)...

    `shape` is the per-limb polynomial shape, output shape = (L,) + shape.
    """
    p, mu, r1, r1s = _prime_consts(primes)
    L = p.shape[0]
    full = (L,) + tuple(shape)
    k_hi, k_lo = jax.random.split(key)
    hi = jax.random.bits(k_hi, full, dtype=jnp.uint32)
    lo = jax.random.bits(k_lo, full, dtype=jnp.uint32)
    bshape = (L,) + (1,) * len(shape)
    return mm.reduce64(hi, lo, p.reshape(bshape), mu.reshape(bshape),
                       r1.reshape(bshape), r1s.reshape(bshape))


def _lift_signed(e, primes_b, mu_b=None):
    """Map int32 (possibly negative, any magnitude < 2^31) values into RNS
    residues: |e| is Barrett-reduced mod p before the sign lift."""
    neg = e < 0
    mag = jnp.abs(e).astype(jnp.uint32)
    if mu_b is None:
        mag = jnp.where(mag >= primes_b, mag - primes_b, mag)  # |e| < 2p fast path
    else:
        mag = mm.barrett32(mag, primes_b, mu_b)
    return jnp.where(neg, mm.neg_mod(mag, primes_b), mag).astype(jnp.uint32)


def gaussian_rns(key, primes, shape, sigma: float = ERROR_STD_DEV) -> jnp.ndarray:
    """Centered discrete gaussian (sigma=3.2), same noise on every limb."""
    p, _, _, _ = _prime_consts(primes)
    L = p.shape[0]
    g = jax.random.normal(key, tuple(shape), dtype=jnp.float32) * sigma
    e = jnp.clip(jnp.round(g), -GAUSS_TAIL * sigma, GAUSS_TAIL * sigma).astype(jnp.int32)
    bshape = (L,) + (1,) * len(shape)
    return _lift_signed(e[None], p.reshape(bshape))


def ternary_rns(key, primes, shape) -> jnp.ndarray:
    """Uniform ternary {-1, 0, 1}, lifted to every limb."""
    p, _, _, _ = _prime_consts(primes)
    L = p.shape[0]
    u = jax.random.randint(key, tuple(shape), 0, 3, dtype=jnp.int32) - 1
    bshape = (L,) + (1,) * len(shape)
    return _lift_signed(u[None], p.reshape(bshape))


def ternary_hw(key, n: int, hamming_weight: int) -> jnp.ndarray:
    """Ternary secret with fixed hamming weight as int32 in {-1,0,1} (coeff form).

    Mirrors the reference secret key default hw = n/2
    (src/lib/host/bfv/secretkey.cu:23)."""
    k_pos, k_sign = jax.random.split(key)
    perm = jax.random.permutation(k_pos, n)
    signs = jax.random.randint(k_sign, (n,), 0, 2, dtype=jnp.int32) * 2 - 1
    mask = jnp.zeros((n,), jnp.int32).at[perm[:hamming_weight]].set(1)
    return mask * signs


def signed_to_rns(e, primes) -> jnp.ndarray:
    """Lift an int32 array of signed values (any int32 magnitude) to
    (L,)+shape residues."""
    p, mu, _, _ = _prime_consts(primes)
    bshape = (p.shape[0],) + (1,) * e.ndim
    return _lift_signed(e[None], p.reshape(bshape), mu.reshape(bshape))
