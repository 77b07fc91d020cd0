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

import functools
import os

import jax
import jax.numpy as jnp
import numpy as np

from ..ops import modmath as mm
from . import drbg as _drbg

ERROR_STD_DEV = 3.2  # sigma of the centered discrete gaussian (reference secstdparams.h)
GAUSS_TAIL = 6  # truncate at 6 sigma like common HE implementations

CtrDrbg = _drbg.CtrDrbg


def new_key(seed: int | None = None) -> jax.Array:
    """Fresh PRNG key; seeded from OS entropy unless an explicit seed is given
    (explicit seeds = the MPC common-reference-string path)."""
    if seed is None:
        seed = int.from_bytes(os.urandom(8), "little") >> 1
    return jax.random.PRNGKey(seed)


def new_drbg(entropy: bytes | None = None,
             personalization: bytes = b"") -> _drbg.CtrDrbg:
    """NIST SP 800-90A AES-CTR DRBG mode of the facade (reference RNGonGPU's
    SecurityLevel::AES128 backend, util/random.cuh:52).  The returned object
    is accepted by every sampler in this module in place of a jax key;
    sampling then happens host-side (keygen-rate).  Threefry (new_key) stays
    the default for bulk speed."""
    return _drbg.CtrDrbg(entropy, personalization)


def is_drbg(key) -> bool:
    return isinstance(key, _drbg.CtrDrbg)


def drbg_eager(fn):
    """Decorator for jitted entry points taking a PRNG key: when the caller
    passes a CtrDrbg, run the wrapped function eagerly (the stateful DRBG
    cannot be traced)."""
    @functools.wraps(fn)
    def wrapper(*args, **kwargs):
        if any(is_drbg(a) for a in args) or any(is_drbg(v) for v in kwargs.values()):
            with jax.disable_jit():
                return fn(*args, **kwargs)
        return fn(*args, **kwargs)
    return wrapper


# --- key-plumbing primitives, DRBG-aware (the single sampling facade) ---

def split(key, num: int = 2):
    """jax.random.split that passes a DRBG through (its state IS the stream)."""
    if is_drbg(key):
        return (key,) * num
    return jax.random.split(key, num)


def fold_in(key, data: int):
    if is_drbg(key):
        return key
    return jax.random.fold_in(key, data)


def bits32(key, shape) -> jnp.ndarray:
    """Raw uniform 32-bit words (facade for jax.random.bits; reference
    uniform_random_number_generation)."""
    if is_drbg(key):
        n = int(np.prod(shape)) if len(shape) else 1
        return jnp.asarray(key.bits32(n).reshape(shape))
    return jax.random.bits(key, tuple(shape), dtype=jnp.uint32)


def randint(key, shape, lo: int, hi: int, dtype=jnp.int32) -> jnp.ndarray:
    if is_drbg(key):
        n = int(np.prod(shape)) if len(shape) else 1
        span = hi - lo
        u = key.bits64(n)
        return jnp.asarray((lo + (u % span)).astype(np.int64).reshape(shape), dtype)
    return jax.random.randint(key, tuple(shape), lo, hi, dtype=dtype)


def normal(key, shape, dtype=jnp.float32) -> jnp.ndarray:
    if is_drbg(key):
        n = int(np.prod(shape)) if len(shape) else 1
        # Box-Muller over DRBG uniforms in (0, 1]
        u1 = (key.bits64(n).astype(np.float64) + 1.0) / 2.0 ** 64
        u2 = key.bits64(n).astype(np.float64) / 2.0 ** 64
        g = np.sqrt(-2.0 * np.log(u1)) * np.cos(2.0 * np.pi * u2)
        return jnp.asarray(g.reshape(shape), dtype)
    return jax.random.normal(key, tuple(shape), dtype)


def permutation(key, n: int) -> jnp.ndarray:
    if is_drbg(key):
        return jnp.asarray(np.argsort(key.bits64(n)).astype(np.int32))
    return jax.random.permutation(key, n)


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
    k_hi, k_lo = split(key)
    hi = bits32(k_hi, full)
    lo = bits32(k_lo, full)
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


def gaussian_rns(key, primes, shape, sigma: float = ERROR_STD_DEV,
                 noise_scale: int = 1) -> jnp.ndarray:
    """Centered discrete gaussian (sigma=3.2), same noise on every limb.
    noise_scale multiplies the sampled integers before the RNS lift (BGV uses
    t*e noise; noise_scale*6*sigma must stay below 2^31)."""
    p, _, _, _ = _prime_consts(primes)
    L = p.shape[0]
    g = normal(key, tuple(shape)) * sigma
    e = jnp.clip(jnp.round(g), -GAUSS_TAIL * sigma, GAUSS_TAIL * sigma).astype(jnp.int32)
    if noise_scale != 1:
        e = e * jnp.int32(noise_scale)
    bshape = (L,) + (1,) * len(shape)
    mu = None
    if noise_scale * GAUSS_TAIL * ERROR_STD_DEV >= float(np.min(np.asarray(primes, np.uint64))):
        _, mu, _, _ = _prime_consts(primes)
        mu = mu.reshape(bshape)
    return _lift_signed(e[None], p.reshape(bshape), mu)


def ternary_rns(key, primes, shape) -> jnp.ndarray:
    """Uniform ternary {-1, 0, 1}, lifted to every limb."""
    p, _, _, _ = _prime_consts(primes)
    L = p.shape[0]
    u = randint(key, tuple(shape), 0, 3) - 1
    bshape = (L,) + (1,) * len(shape)
    return _lift_signed(u[None], p.reshape(bshape))


def ternary_hw(key, n: int, hamming_weight: int) -> jnp.ndarray:
    """Ternary secret with fixed hamming weight as int32 in {-1,0,1} (coeff form).

    Mirrors the reference secret key default hw = n/2
    (src/lib/host/bfv/secretkey.cu:23)."""
    k_pos, k_sign = split(key)
    perm = permutation(k_pos, n)
    signs = randint(k_sign, (n,), 0, 2) * 2 - 1
    mask = jnp.zeros((n,), jnp.int32).at[perm[:hamming_weight]].set(1)
    return mask * signs


def signed_to_rns(e, primes) -> jnp.ndarray:
    """Lift an int32 array of signed values (any int32 magnitude) to
    (L,)+shape residues."""
    p, mu, _, _ = _prime_consts(primes)
    bshape = (p.shape[0],) + (1,) * e.ndim
    return _lift_signed(e[None], p.reshape(bshape), mu.reshape(bshape))
