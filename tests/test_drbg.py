"""NIST known-answer tests for the AES-CTR DRBG facade mode
(reference RNGonGPU SP 800-90A backend, util/random.cuh:52-714)."""

import numpy as np
import pytest

from heongpu_tpu.utils import rng
from heongpu_tpu.utils.drbg import CtrDrbg, aes128_encrypt_blocks


def test_aes128_fips197():
    """FIPS-197 Appendix C.1."""
    key = bytes.fromhex("000102030405060708090a0b0c0d0e0f")
    pt = np.frombuffer(bytes.fromhex("00112233445566778899aabbccddeeff"),
                       np.uint8).reshape(1, 16)
    assert aes128_encrypt_blocks(key, pt).tobytes().hex() == \
        "69c4e0d86a7b0430d8cdb78070b4c55a"


def test_aes128_sp800_38a_ecb():
    key = bytes.fromhex("2b7e151628aed2a6abf7158809cf4f3c")
    pts = ["6bc1bee22e409f96e93d7e117393172a",
           "ae2d8a571e03ac9c9eb76fac45af8e51"]
    cts = ["3ad77bb40d7a3660a89ecaf32466ef97",
           "f5d3d58503b9699de785895a96fdbaaf"]
    blocks = np.frombuffer(bytes.fromhex("".join(pts)), np.uint8).reshape(-1, 16)
    out = aes128_encrypt_blocks(key, blocks)
    assert out.tobytes().hex() == "".join(cts)


def test_ctr_drbg_cavp_no_df():
    """NIST CAVP CTR_DRBG.rsp, [AES-128 no df][PredictionResistance=False]
    [EntropyInputLen=256][NonceLen=0][PersoLen=0][AdditionalInputLen=0],
    COUNT=0 of the reseed suite: instantiate, reseed, generate x2."""
    d = CtrDrbg(bytes.fromhex(
        "ed1e7f21ef66ea5d8e2a85b9337245445b71d6393a4eecb0e63c193d0f72f9a9"))
    d.reseed(bytes.fromhex(
        "303fb519f0a4e17d6df0b6426aa0ecb2a36079bd48be47ad2a8dbfe48da3efad"))
    d.generate(64)
    got = d.generate(64)
    assert got.hex() == (
        "f80111d08e874672f32f42997133a5210f7a9375e22cea70587f9cfafebe0f6a"
        "6aa2eb68e7dd9164536d53fa020fcab20f54caddfab7d6d91e5ffec1dfd8deaa")


def test_drbg_input_validation():
    with pytest.raises(ValueError):
        CtrDrbg(b"short")
    d = CtrDrbg()
    with pytest.raises(ValueError):
        d.reseed(b"short")


def test_facade_samplers_accept_drbg():
    primes = (536871001, 536870951)  # two ~29-bit primes (values unimportant)
    d = rng.new_drbg(b"\x07" * 32)
    u = np.asarray(rng.uniform_rns(d, primes, (64,)))
    assert u.shape == (2, 64)
    assert (u < np.array(primes, np.uint32)[:, None]).all()
    g = np.asarray(rng.gaussian_rns(d, primes, (64,)))
    assert g.shape == (2, 64)
    t = np.asarray(rng.ternary_rns(d, primes, (64,)))
    assert t.shape == (2, 64)
    s = np.asarray(rng.ternary_hw(d, 64, 32))
    assert int((s != 0).sum()) == 32
    # determinism under fixed entropy
    d2 = rng.new_drbg(b"\x07" * 32)
    u2 = np.asarray(rng.uniform_rns(d2, primes, (64,)))
    np.testing.assert_array_equal(u, u2)


def test_drbg_end_to_end_bfv():
    from heongpu_tpu.models import bfv
    from heongpu_tpu.utils import params
    d = rng.new_drbg(b"\x21" * 32)
    t = params.plain_modulus_for(256, 20)
    ctx = bfv.make_context(256, t, q_bits=[29, 29], sec_level="none")
    sk = bfv.keygen_secret(ctx, d)
    pk = bfv.keygen_public(ctx, d, sk)
    m = np.arange(256) % ctx.t
    ct = bfv.encrypt(ctx, pk, bfv.encode(ctx, m), d)
    got = bfv.decode(ctx, bfv.decrypt(ctx, sk, ct))
    np.testing.assert_array_equal(got, m.astype(np.uint32))
