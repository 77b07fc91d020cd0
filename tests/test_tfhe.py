"""TFHE gate bootstrapping end-to-end (mirrors reference test_tfhe_gate_boot)."""

import numpy as np
import pytest

from heongpu_tpu.models import tfhe
from heongpu_tpu.utils import rng

CTX = tfhe.make_context()
SK = tfhe.keygen_secret(rng.new_key(101))
BK = tfhe.keygen_boot(CTX, rng.new_key(102), SK)

# all four input combinations, batched
B1 = np.array([True, True, False, False])
B2 = np.array([True, False, True, False])
CT1 = tfhe.encrypt(CTX, SK, B1, rng.new_key(103))
CT2 = tfhe.encrypt(CTX, SK, B2, rng.new_key(104))


def test_encrypt_decrypt():
    np.testing.assert_array_equal(tfhe.decrypt(CTX, SK, CT1), B1)
    np.testing.assert_array_equal(tfhe.decrypt(CTX, SK, CT2), B2)


def test_not():
    np.testing.assert_array_equal(
        tfhe.decrypt(CTX, SK, tfhe.NOT(CTX, CT1)), ~B1)


def test_nand():
    got = tfhe.decrypt(CTX, SK, tfhe.NAND(CTX, BK, CT1, CT2))
    np.testing.assert_array_equal(got, ~(B1 & B2))


def test_and_or():
    got = tfhe.decrypt(CTX, SK, tfhe.AND(CTX, BK, CT1, CT2))
    np.testing.assert_array_equal(got, B1 & B2)
    got = tfhe.decrypt(CTX, SK, tfhe.OR(CTX, BK, CT1, CT2))
    np.testing.assert_array_equal(got, B1 | B2)


def test_nor_xor_xnor():
    got = tfhe.decrypt(CTX, SK, tfhe.NOR(CTX, BK, CT1, CT2))
    np.testing.assert_array_equal(got, ~(B1 | B2))
    got = tfhe.decrypt(CTX, SK, tfhe.XOR(CTX, BK, CT1, CT2))
    np.testing.assert_array_equal(got, B1 ^ B2)
    got = tfhe.decrypt(CTX, SK, tfhe.XNOR(CTX, BK, CT1, CT2))
    np.testing.assert_array_equal(got, ~(B1 ^ B2))


def test_mux():
    sel = tfhe.encrypt(CTX, SK, np.array([True, False, True, False]),
                       rng.new_key(105))
    got = tfhe.decrypt(CTX, SK, tfhe.MUX(CTX, BK, sel, CT1, CT2))
    want = np.where([True, False, True, False], B1, B2)
    np.testing.assert_array_equal(got, want)


def test_gate_chain():
    """(a NAND b) XOR (a OR b) — composition keeps correctness."""
    x = tfhe.NAND(CTX, BK, CT1, CT2)
    y = tfhe.OR(CTX, BK, CT1, CT2)
    got = tfhe.decrypt(CTX, SK, tfhe.XOR(CTX, BK, x, y))
    np.testing.assert_array_equal(got, (~(B1 & B2)) ^ (B1 | B2))
