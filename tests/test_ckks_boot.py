"""CKKS regular bootstrapping end-to-end (reference example/bootstrapping
accuracy-demo analog, asserted with loose tolerances)."""

import functools

import numpy as np
import pytest

from heongpu_tpu.models import ckks, ckks_boot
from heongpu_tpu.utils import rng

pytestmark = pytest.mark.slow

N = 256
DEPTH = 19  # chain length: q0 + scale primes


def _setup():
    ctx = ckks.make_context(N, [29] + [28] * (DEPTH - 1), scale_bits=28,
                            sec_level="none")
    sk = ckks.keygen_secret(ctx, rng.new_key(61), hamming_weight=16)
    pk = ckks.keygen_public(ctx, rng.new_key(62), sk)
    keys = ckks_boot.generate_bootstrap_keys(
        ctx, rng.new_key(63), sk,
        ckks_boot.BootConfig(taylor_degree=7, exp_squarings=4))
    return ctx, sk, pk, keys


_setup = functools.lru_cache()(_setup)
RNGN = np.random.default_rng(99)


def test_mod_raise_roundtrip():
    """Raised plaintext coefficients are congruent to the originals mod q0."""
    CTX, SK, PK, KEYS = _setup()
    from heongpu_tpu.ops import ntt as nttm
    from heongpu_tpu.utils import nt

    z = RNGN.uniform(-1, 1, CTX.n // 2)
    ct = ckks.encrypt(CTX, PK, ckks.encode(CTX, z), rng.new_key(64))
    ct = ckks.mod_drop(CTX, ct, CTX.k - 1)
    raised = ckks_boot.mod_raise(CTX, ct)
    assert raised.level == 0

    q0 = int(CTX.q_primes[0])
    # original coefficients mod q0 (1-limb decrypt)
    pt1 = ckks.decrypt(CTX, SK, ct)
    c_orig = np.asarray(nttm.ntt_inv(pt1.m, CTX.ntt_q(ct.level)))[0]
    # raised coefficients composed over the full chain, then mod q0
    pt0 = ckks.decrypt(CTX, SK, raised)
    coeffs = np.asarray(nttm.ntt_inv(pt0.m, CTX.ntt_q(0)))
    primes = [int(q) for q in CTX.q_primes]
    comp = np.array([nt.crt_compose([int(coeffs[i, j]) for i in range(CTX.k)],
                                    primes) for j in range(0, CTX.n, 17)])
    orig = c_orig[::17].astype(np.int64)
    # |raised| stays small (m + q0*I with small I) and matches mod q0
    assert np.all(np.abs(comp) < q0 * 64)
    diff = (comp - orig) % q0
    diff = np.minimum(diff, q0 - diff)
    # allow the tiny mod-raise rounding noise
    np.testing.assert_array_less(diff, 10)


def test_coeff_to_slot_then_back():
    """StoC(CtoS(x)) == c_in * c_out * x (the folded constants compose)."""
    CTX, SK, PK, KEYS = _setup()
    z = RNGN.uniform(-0.5, 0.5, CTX.n // 2)
    ct = ckks.encrypt(CTX, PK, ckks.encode(CTX, z), rng.new_key(65))
    t0, t1 = ckks_boot.coeff_to_slot(CTX, ct, KEYS)
    out = ckks_boot.slot_to_coeff(CTX, t0, t1, KEYS)
    got = ckks.decode(CTX, ckks.decrypt(CTX, SK, out))
    cfg = KEYS.cfg
    c = 2 / (1 << cfg.exp_squarings) * (-0.5j)  # c_in*c_out product
    np.testing.assert_allclose(got, z * c, atol=2e-2)


def test_regular_bootstrap():
    CTX, SK, PK, KEYS = _setup()
    z = RNGN.uniform(-0.5, 0.5, CTX.n // 2)
    ct = ckks.encrypt(CTX, PK, ckks.encode(CTX, z), rng.new_key(66))
    ct = ckks.mod_drop(CTX, ct, CTX.k - 1)
    assert CTX.active(ct.level) == 1
    fresh = ckks_boot.regular_bootstrap(CTX, ct, KEYS)
    # bootstrapping must return to a usable (low) depth
    assert CTX.active(fresh.level) >= 2
    got = ckks.decode(CTX, ckks.decrypt(CTX, SK, fresh))
    np.testing.assert_allclose(got.real, z, atol=5e-2)
    # and support further computation: square the refreshed ct
    rk = KEYS.rk
    sq = ckks.rescale(CTX, ckks.relinearize(CTX, ckks.multiply(CTX, fresh, fresh), rk))
    got2 = ckks.decode(CTX, ckks.decrypt(CTX, SK, sq))
    np.testing.assert_allclose(got2.real, z * z, atol=1e-1)


def test_precision_bootstrap_composite():
    """Precision mode: composite q0 (Q0~2^58) + composite-scale pieces
    (piece_depth=2) + arcsine correction => ~18 bits of precision under
    <2^30 lanes (reference-competitive; its 60-bit-q0 regime).  Measured
    4.4e-6 max err; the 3e-5 bound here is the regression threshold."""
    from heongpu_tpu.models import ckks, ckks_boot
    DEPTH = 44
    ctx = ckks.make_context(256, [29, 29] + [28] * (DEPTH - 2), scale_bits=28,
                            sec_level="none", ks_type="II", alpha=2,
                            p_count=4)
    sk = ckks.keygen_secret(ctx, rng.new_key(61), hamming_weight=16)
    pk = ckks.keygen_public(ctx, rng.new_key(62), sk)
    cfg = ckks_boot.BootConfig(taylor_degree=9, exp_squarings=5, base_count=2,
                               arcsin_order=1, piece_depth=2)
    keys = ckks_boot.generate_bootstrap_keys(ctx, rng.new_key(63), sk, cfg)
    z = np.random.default_rng(99).uniform(-0.5, 0.5, ctx.n // 2)
    ct = ckks.encrypt(ctx, pk, ckks.encode(ctx, z, scale=keys.msg_scale),
                      rng.new_key(66))
    ct = ckks.mod_drop(ctx, ct, ctx.k - 2 - ct.level)
    fresh = ckks_boot.regular_bootstrap(ctx, ct, keys)
    got = ckks.decode(ctx, ckks.decrypt(ctx, sk, fresh))
    err = np.max(np.abs(got.real - z))
    assert err < 3e-5, err
