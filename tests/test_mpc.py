"""Multiparty computation tests: 3 parties simulated in-process (the
reference's example/mpc pattern — SURVEY §3.6)."""

import functools

import numpy as np
import pytest
import jax.numpy as jnp

from heongpu_tpu.models import bfv, ckks, mpc, ringkit
from heongpu_tpu.utils import rng, params

pytestmark = pytest.mark.slow

N_PARTIES = 3
SEED_CRS = 777

RNGN = np.random.default_rng(55)


@functools.lru_cache()
def _setup():
    """Collective BFV context, party keys, joint pk, and the implicit joint
    secret key sum(s_i) (oracle only) — built lazily so the fast CI set does
    not pay for MPC keygen at collection time."""
    T = params.plain_modulus_for(1024, 20)
    BCTX = bfv.make_context(1024, T, q_bits=[29, 29, 29], sec_level="none")
    BRING = bfv._ring(BCTX)
    BSKS = [ringkit.keygen_secret(BRING, rng.new_key(200 + i))
            for i in range(N_PARTIES)]
    _A = mpc.crs_uniform(BRING, SEED_CRS, (BCTX.n,))
    _BPK = mpc.pk_assemble(
        BRING, [mpc.pk_share(BRING, sk, _A, rng.new_key(210 + i))
                for i, sk in enumerate(BSKS)], _A)
    s_sum = sum(np.asarray(sk.s_coeff) for sk in BSKS)
    s_rns = rng.signed_to_rns(jnp.asarray(s_sum.astype(np.int32)), BRING.qp_primes)
    from heongpu_tpu.ops import ntt as nttm, modmath as mm
    p, pinv, r2, *_ = BRING.base_qp.bview()
    s_ntt = nttm.ntt_fwd(s_rns, BRING.ntt_qp)
    JOINT = ringkit.SecretKey(jnp.asarray(s_sum.astype(np.int32)),
                              mm.to_mont(s_ntt, p, pinv, r2), 0)
    return BCTX, BRING, BSKS, _BPK, JOINT


def test_collective_pk_threshold_decrypt():
    BCTX, BRING, BSKS, _BPK, JOINT = _setup()
    m = RNGN.integers(0, BCTX.t, size=BCTX.n, dtype=np.int64)
    ct = bfv.encrypt(BCTX, _BPK, bfv.encode(BCTX, m), rng.new_key(220))
    partials = [mpc.bfv_decrypt_partial(BCTX, sk, ct, rng.new_key(230 + i))
                for i, sk in enumerate(BSKS)]
    got = bfv.decode(BCTX, mpc.bfv_decrypt_fuse(BCTX, ct, partials))
    np.testing.assert_array_equal(got, m.astype(np.uint32))


def test_collective_relin_2round():
    BCTX, BRING, BSKS, _BPK, JOINT = _setup()
    m1 = RNGN.integers(0, BCTX.t, size=BCTX.n, dtype=np.int64)
    m2 = RNGN.integers(0, BCTX.t, size=BCTX.n, dtype=np.int64)
    a_d = mpc.relin_crs(BRING, SEED_CRS + 1)
    r1, ephs = [], []
    for i, sk in enumerate(BSKS):
        share, eph = mpc.relin_round1(BRING, sk, a_d, rng.new_key(240 + i))
        r1.append(share)
        ephs.append(eph)
    from heongpu_tpu.ops import modmath as mm
    p, _, _, _, _, _ = BRING.base_qp.bview()
    d0 = r1[0][0]
    d1 = r1[0][1]
    for s in r1[1:]:
        d0 = mm.add_mod(d0, s[0], p)
        d1 = mm.add_mod(d1, s[1], p)
    r2s = [mpc.relin_round2(BRING, sk, eph, d0, d1, rng.new_key(250 + i))
           for i, (sk, eph) in enumerate(zip(BSKS, ephs))]
    rk = mpc.relin_assemble(BRING, r1, r2s)

    ct1 = bfv.encrypt(BCTX, _BPK, bfv.encode(BCTX, m1), rng.new_key(260))
    ct2 = bfv.encrypt(BCTX, _BPK, bfv.encode(BCTX, m2), rng.new_key(261))
    ct3 = bfv.relinearize(BCTX, bfv.multiply(BCTX, ct1, ct2), rk)
    partials = [mpc.bfv_decrypt_partial(BCTX, sk, ct3, rng.new_key(270 + i))
                for i, sk in enumerate(BSKS)]
    got = bfv.decode(BCTX, mpc.bfv_decrypt_fuse(BCTX, ct3, partials))
    np.testing.assert_array_equal(got, (m1 * m2 % BCTX.t).astype(np.uint32))


def test_collective_galois():
    BCTX, BRING, BSKS, _BPK, JOINT = _setup()
    m = RNGN.integers(0, BCTX.t, size=BCTX.n, dtype=np.int64)
    from heongpu_tpu.ops import polyops
    g = polyops.steps_to_galois_elt(1, BCTX.n)
    a_d = mpc.relin_crs(BRING, SEED_CRS + 2)
    shares = [mpc.galois_share(BRING, sk, g, a_d, rng.new_key(280 + i))
              for i, sk in enumerate(BSKS)]
    gk1 = mpc.galois_assemble(BRING, g, shares, a_d)
    ct = bfv.encrypt(BCTX, _BPK, bfv.encode(BCTX, m), rng.new_key(290))
    ct_r = bfv.apply_galois(BCTX, ct, gk1)
    partials = [mpc.bfv_decrypt_partial(BCTX, sk, ct_r, rng.new_key(295 + i))
                for i, sk in enumerate(BSKS)]
    got = bfv.decode(BCTX, mpc.bfv_decrypt_fuse(BCTX, ct_r, partials))
    half = BCTX.n // 2
    rows = m.reshape(2, half)
    want = np.concatenate([np.roll(rows[0], -1), np.roll(rows[1], -1)])
    np.testing.assert_array_equal(got, want.astype(np.uint32))


def test_bfv_collective_bootstrap():
    BCTX, BRING, BSKS, _BPK, JOINT = _setup()
    m = RNGN.integers(0, BCTX.t, size=BCTX.n, dtype=np.int64)
    ct = bfv.encrypt(BCTX, _BPK, bfv.encode(BCTX, m), rng.new_key(300))
    shares = [mpc.bfv_colboot_participant(BCTX, sk, ct, SEED_CRS + 3,
                                          rng.new_key(310 + i))
              for i, sk in enumerate(BSKS)]
    fresh = mpc.bfv_colboot_coordinator(BCTX, ct, shares, SEED_CRS + 3)
    # refreshed ct decrypts to the same message under the joint key
    partials = [mpc.bfv_decrypt_partial(BCTX, sk, fresh, rng.new_key(320 + i))
                for i, sk in enumerate(BSKS)]
    got = bfv.decode(BCTX, mpc.bfv_decrypt_fuse(BCTX, fresh, partials))
    np.testing.assert_array_equal(got, m.astype(np.uint32))
    # and its noise is fresh-level (bounded away from failure)
    nb = bfv.noise_budget(BCTX, JOINT, fresh)
    assert nb > 5


def test_ckks_collective_pk_and_bootstrap():
    BCTX, BRING, BSKS, _BPK, JOINT = _setup()
    cctx = ckks.make_context(1024, [29, 25, 25, 25], sec_level="none")
    cring = ckks._ring(cctx)
    sks = [ringkit.keygen_secret(cring, rng.new_key(400 + i)) for i in range(N_PARTIES)]
    a = mpc.crs_uniform(cring, SEED_CRS + 4, (cctx.n,))
    pk = mpc.pk_assemble(
        cring, [mpc.pk_share(cring, sk, a, rng.new_key(410 + i))
                for i, sk in enumerate(sks)], a)
    z = RNGN.uniform(-1, 1, cctx.n // 2)
    ct = ckks.encrypt(cctx, pk, ckks.encode(cctx, z), rng.new_key(420))
    # threshold decrypt
    partials = [mpc.ckks_decrypt_partial(cctx, sk, ct, rng.new_key(430 + i))
                for i, sk in enumerate(sks)]
    got = ckks.decode(cctx, mpc.ckks_decrypt_fuse(cctx, ct, partials))
    np.testing.assert_allclose(got.real, z, atol=5e-2)
    # drop two levels, collectively bootstrap back to level 0
    ct2 = ckks.mod_drop(cctx, ct, 2)
    shares = [mpc.ckks_colboot_participant(cctx, sk, ct2, SEED_CRS + 5,
                                           rng.new_key(440 + i))
              for i, sk in enumerate(sks)]
    fresh = mpc.ckks_colboot_coordinator(cctx, ct2, shares, SEED_CRS + 5)
    assert fresh.level == 0
    partials = [mpc.ckks_decrypt_partial(cctx, sk, fresh, rng.new_key(450 + i))
                for i, sk in enumerate(sks)]
    got = ckks.decode(cctx, mpc.ckks_decrypt_fuse(cctx, fresh, partials))
    np.testing.assert_allclose(got.real, z, atol=5e-2)
