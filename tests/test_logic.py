"""Logic operators over BFV and CKKS (reference HELogicOperator families)."""

import numpy as np
import pytest

from heongpu_tpu.models import bfv, ckks, logic
from heongpu_tpu.utils import params, rng

N = 1024


@pytest.fixture(scope="module")
def bfv_setup():
    t = params.plain_modulus_for(N, 17)
    ctx = bfv.make_context(N, t, q_bits=[29, 29, 29], sec_level="none")
    sk = bfv.keygen_secret(ctx, rng.new_key(1))
    pk = bfv.keygen_public(ctx, rng.new_key(2), sk)
    rk = bfv.keygen_relin(ctx, rng.new_key(3), sk)
    return ctx, sk, pk, rk


@pytest.fixture(scope="module")
def ckks_setup():
    ctx = ckks.make_context(256, [29, 28, 28, 28, 28], scale_bits=28,
                            sec_level="none")
    sk = ckks.keygen_secret(ctx, rng.new_key(4))
    pk = ckks.keygen_public(ctx, rng.new_key(5), sk)
    rk = ckks.keygen_relin(ctx, rng.new_key(6), sk)
    return ctx, sk, pk, rk


BITS_A = np.array([0, 0, 1, 1], np.uint64)
BITS_B = np.array([0, 1, 0, 1], np.uint64)
TRUTH = {
    "AND": [0, 0, 0, 1], "OR": [0, 1, 1, 1], "XOR": [0, 1, 1, 0],
    "NAND": [1, 1, 1, 0], "NOR": [1, 0, 0, 0], "XNOR": [1, 0, 0, 1],
}


def test_bfv_gates(bfv_setup):
    ctx, sk, pk, rk = bfv_setup
    a_vals = np.resize(BITS_A, ctx.n)
    b_vals = np.resize(BITS_B, ctx.n)
    ca = bfv.encrypt(ctx, pk, bfv.encode(ctx, a_vals), rng.new_key(7))
    cb = bfv.encrypt(ctx, pk, bfv.encode(ctx, b_vals), rng.new_key(8))
    gates = {
        "AND": logic.bfv_and, "OR": logic.bfv_or, "XOR": logic.bfv_xor,
        "NAND": logic.bfv_nand, "NOR": logic.bfv_nor, "XNOR": logic.bfv_xnor,
    }
    for name, fn in gates.items():
        out = fn(ctx, ca, cb, rk)
        got = bfv.decode(ctx, bfv.decrypt(ctx, sk, out))[:4]
        np.testing.assert_array_equal(got, TRUTH[name], err_msg=name)
    got = bfv.decode(ctx, bfv.decrypt(ctx, sk, logic.bfv_not(ctx, ca)))[:4]
    np.testing.assert_array_equal(got, 1 - BITS_A)


def test_bfv_plain_gates(bfv_setup):
    ctx, sk, pk, rk = bfv_setup
    a_vals = np.resize(BITS_A, ctx.n)
    b_vals = np.resize(BITS_B, ctx.n)
    ca = bfv.encrypt(ctx, pk, bfv.encode(ctx, a_vals), rng.new_key(9))
    pb = bfv.encode(ctx, b_vals)
    for name, fn in [("AND", logic.bfv_and_plain), ("OR", logic.bfv_or_plain),
                     ("XOR", logic.bfv_xor_plain)]:
        got = bfv.decode(ctx, bfv.decrypt(ctx, sk, fn(ctx, ca, pb)))[:4]
        np.testing.assert_array_equal(got, TRUTH[name], err_msg=name)


def test_ckks_gates(ckks_setup):
    ctx, sk, pk, rk = ckks_setup
    half = ctx.n // 2
    a_vals = np.resize(BITS_A.astype(np.float64), half)
    b_vals = np.resize(BITS_B.astype(np.float64), half)
    ca = ckks.encrypt(ctx, pk, ckks.encode(ctx, a_vals), rng.new_key(10))
    cb = ckks.encrypt(ctx, pk, ckks.encode(ctx, b_vals), rng.new_key(11))
    gates = {
        "AND": logic.ckks_and, "OR": logic.ckks_or, "XOR": logic.ckks_xor,
        "NAND": logic.ckks_nand, "NOR": logic.ckks_nor, "XNOR": logic.ckks_xnor,
    }
    for name, fn in gates.items():
        out = fn(ctx, ca, cb, rk)
        got = ckks.decode(ctx, ckks.decrypt(ctx, sk, out)).real[:4]
        np.testing.assert_allclose(got, TRUTH[name], atol=1e-2, err_msg=name)
    got = ckks.decode(ctx, ckks.decrypt(ctx, sk, logic.ckks_not(ctx, ca))).real[:4]
    np.testing.assert_allclose(got, 1 - BITS_A.astype(float), atol=1e-2)
