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


def test_gate_chain():
    """(a NAND b) XOR (a OR b) — composition keeps correctness."""
    x = tfhe.NAND(CTX, BK, CT1, CT2)
    y = tfhe.OR(CTX, BK, CT1, CT2)
    got = tfhe.decrypt(CTX, SK, tfhe.XOR(CTX, BK, x, y))
    np.testing.assert_array_equal(got, (~(B1 & B2)) ^ (B1 | B2))


def test_mux(monkeypatch):
    """MUX correctness + cost structure (reference operator.cuh:688-812):
    two blind rotations (here ONE batched 2B no-keyswitch call) + ONE
    keyswitch — never a third bootstrap."""
    boots, switches = [], []
    orig_boot, orig_ks = tfhe._bootstrap, tfhe.lwe_keyswitch
    monkeypatch.setattr(tfhe, "_bootstrap",
                        lambda ctx, bk, ct, keyswitch=True: boots.append(
                            (ct.a.shape[0], keyswitch))
                        or orig_boot(ctx, bk, ct, keyswitch=keyswitch))
    monkeypatch.setattr(tfhe, "lwe_keyswitch",
                        lambda ctx, bk, s: switches.append(s.a.shape[0])
                        or orig_ks(ctx, bk, s))
    sel = tfhe.encrypt(CTX, SK, np.array([True, False, True, False]),
                       rng.new_key(106))
    got = tfhe.decrypt(CTX, SK, tfhe.MUX(CTX, BK, sel, CT1, CT2))
    np.testing.assert_array_equal(
        got, np.where([True, False, True, False], B1, B2))
    assert boots == [(8, False)]   # one call, batch 2B=8, pre-keyswitch
    assert switches == [4]         # one keyswitch on the combined B=4
