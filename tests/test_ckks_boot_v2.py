"""CKKS bootstrapping variants: Chebyshev-cosine EvalMod (v2), slim, bit and
gate bootstrapping (reference regular_bootstrapping_v2 / slim_bootstrapping /
bit_bootstrapping / gate_bootstrapping, ePrint 2024/767)."""

import numpy as np
import pytest

from heongpu_tpu.models import ckks, ckks_boot_ext
from heongpu_tpu.utils import rng

pytestmark = pytest.mark.slow

N = 256
DEPTH = 19
CFG = ckks_boot_ext.BootConfigV2(cos_degree=24, double_angles=5, K=12)


@pytest.fixture(scope="module")
def base():
    ctx = ckks.make_context(N, [29] + [28] * (DEPTH - 1), scale_bits=28,
                            sec_level="none")
    sk = ckks.keygen_secret(ctx, rng.new_key(71), hamming_weight=16)
    pk = ckks.keygen_public(ctx, rng.new_key(72), sk)
    return ctx, sk, pk


def test_regular_v2(base):
    ctx, sk, pk = base
    keys = ckks_boot_ext.generate_bootstrap_keys_v2(
        ctx, rng.new_key(73), sk, CFG, variant="regular")
    z = np.random.default_rng(7).uniform(-0.5, 0.5, N // 2)
    ct = ckks.encrypt(ctx, pk, ckks.encode(ctx, z), rng.new_key(74))
    ct = ckks.mod_drop(ctx, ct, ctx.k - 1)
    fresh = ckks_boot_ext.regular_bootstrap_v2(ctx, ct, keys)
    assert ctx.active(fresh.level) >= 2
    got = ckks.decode(ctx, ckks.decrypt(ctx, sk, fresh))
    np.testing.assert_allclose(got.real, z, atol=1e-2)


def test_slim(base):
    ctx, sk, pk = base
    # slim's StoC turns slot values into full-magnitude coefficients, so the
    # sin(x)≈x modular-reduction error is governed by msg_scale·|z|/q0 — the
    # working scale during bootstrap must sit well below q0 (the reference
    # uses 40-bit Δ under a 60-bit q0; our uint32 chain uses 2^21 under 2^29).
    msg_scale = 2.0 ** 22
    keys = ckks_boot_ext.generate_bootstrap_keys_v2(
        ctx, rng.new_key(75), sk, CFG, variant="slim", msg_scale=msg_scale)
    z = np.random.default_rng(8).uniform(-0.5, 0.5, N // 2)
    ct = ckks.encrypt(ctx, pk, ckks.encode(ctx, z, scale=msg_scale),
                      rng.new_key(76))
    # user computes down to the slim entry level, then refreshes
    ct = ckks.mod_drop(ctx, ct, keys.stoc_pieces[0].level)
    fresh = ckks_boot_ext.slim_bootstrap(ctx, ct, keys)
    assert ctx.active(fresh.level) >= 2
    got = ckks.decode(ctx, ckks.decrypt(ctx, sk, fresh))
    # slim precision under a 29-bit q0 is bounded by the double-angle noise
    # amplification (~4^r) — a few bits; the 60-bit-q0 regime of the
    # reference is not reachable with uint32 lanes.
    np.testing.assert_allclose(got.real, z, atol=3e-2)


def test_bit_bootstrap(base):
    ctx, sk, pk = base
    keys = ckks_boot_ext.generate_bootstrap_keys_v2(
        ctx, rng.new_key(77), sk, CFG, variant="bit")
    q0 = int(ctx.q_primes[0])
    bits = np.random.default_rng(9).integers(0, 2, N // 2)
    pt = ckks.encode(ctx, bits.astype(np.float64), scale=q0 / 2.0)
    ct = ckks.encrypt(ctx, pk, pt, rng.new_key(78))
    ct = ckks.mod_drop(ctx, ct, keys.stoc_pieces[0].level)
    fresh = ckks_boot_ext.bit_bootstrap(ctx, ct, keys)
    got = ckks.decode(ctx, ckks.decrypt(ctx, sk, fresh))
    np.testing.assert_allclose(got.real, bits, atol=0.1)


def test_gate_bootstrap(base):
    ctx, sk, pk = base
    keys = ckks_boot_ext.generate_bootstrap_keys_v2(
        ctx, rng.new_key(79), sk, CFG, variant="gate")
    q0 = int(ctx.q_primes[0])
    R = np.random.default_rng(10)
    b1 = R.integers(0, 2, N // 2)
    b2 = R.integers(0, 2, N // 2)
    c1 = ckks.encrypt(ctx, pk, ckks.encode(ctx, b1.astype(np.float64),
                                           scale=q0 / 3.0), rng.new_key(80))
    c2 = ckks.encrypt(ctx, pk, ckks.encode(ctx, b2.astype(np.float64),
                                           scale=q0 / 3.0), rng.new_key(81))
    lvl = keys.stoc_pieces[0].level
    c1 = ckks.mod_drop(ctx, c1, lvl)
    c2 = ckks.mod_drop(ctx, c2, lvl)
    cases = {
        "AND": np.logical_and, "XOR": np.logical_xor,
        "NOR": lambda a, b: ~np.logical_or(a, b),
    }
    for gate, fn in cases.items():
        out = ckks_boot_ext.gate_bootstrap(ctx, c1, c2, gate, keys)
        got = ckks.decode(ctx, ckks.decrypt(ctx, sk, out))
        want = fn(b1.astype(bool), b2.astype(bool)).astype(float)
        np.testing.assert_allclose(got.real, want, atol=0.1, err_msg=gate)


def test_regular_v2_sparse_switch(base):
    """Dense production key + temporary sparse key around the mod-raise
    (reference mod_up_from_q0 + switch keys, ePrint 2020/1203)."""
    ctx, _, _ = base
    sk_dense = ckks.keygen_secret(ctx, rng.new_key(91))   # hw = n/2
    pk = ckks.keygen_public(ctx, rng.new_key(92), sk_dense)
    keys = ckks_boot_ext.generate_bootstrap_keys_v2(
        ctx, rng.new_key(93), sk_dense, CFG, variant="regular", sparse_hw=16)
    z = np.random.default_rng(7).uniform(-0.5, 0.5, N // 2)
    ct = ckks.encrypt(ctx, pk, ckks.encode(ctx, z), rng.new_key(94))
    ct = ckks.mod_drop(ctx, ct, ctx.k - 1)
    fresh = ckks_boot_ext.regular_bootstrap_v2(ctx, ct, keys)
    got = ckks.decode(ctx, ckks.decrypt(ctx, sk_dense, fresh))
    np.testing.assert_allclose(got.real, z, atol=1e-2)


def test_less_key_mode(base):
    """LKM trades Galois-key count for composed giant rotations (reference
    less_key_mode).  One CtoS piece must still evaluate correctly."""
    from heongpu_tpu.models import ckks_boot
    ctx, sk, pk = base
    std = ckks_boot_ext.generate_bootstrap_keys_v2(
        ctx, rng.new_key(95), sk, CFG, variant="regular")
    lkm = ckks_boot_ext.generate_bootstrap_keys_v2(
        ctx, rng.new_key(95), sk, CFG, variant="regular", less_key_mode=True)
    assert len(lkm.gk.keys) <= len(std.gk.keys)
    z = np.random.default_rng(11).uniform(-0.5, 0.5, N // 2)
    ct = ckks.encrypt(ctx, pk, ckks.encode(ctx, z), rng.new_key(96))
    a = ckks_boot.matvec_piece(ctx, ct, std.ctos_pieces[0], std.gk)
    b = ckks_boot.matvec_piece(ctx, ct, lkm.ctos_pieces[0], lkm.gk)
    va = ckks.decode(ctx, ckks.decrypt(ctx, sk, a))
    vb = ckks.decode(ctx, ckks.decrypt(ctx, sk, b))
    np.testing.assert_allclose(va, vb, atol=1e-4)


def test_regular_v2_method_ii():
    """Full v2 bootstrap over a Method-II (hybrid keyswitching) context —
    alpha-times smaller evaluation keys, the reference's bootstrapping
    configuration."""
    ctx = ckks.make_context(N, [29] + [28] * (DEPTH - 1), scale_bits=28,
                            sec_level="none", ks_type="II", alpha=3)
    sk = ckks.keygen_secret(ctx, rng.new_key(121), hamming_weight=16)
    pk = ckks.keygen_public(ctx, rng.new_key(122), sk)
    keys = ckks_boot_ext.generate_bootstrap_keys_v2(
        ctx, rng.new_key(123), sk, CFG, variant="regular")
    assert keys.rk.k0.shape[0] < DEPTH  # grouped digits
    z = np.random.default_rng(12).uniform(-0.5, 0.5, N // 2)
    ct = ckks.encrypt(ctx, pk, ckks.encode(ctx, z), rng.new_key(124))
    ct = ckks.mod_drop(ctx, ct, ctx.k - 1)
    fresh = ckks_boot_ext.regular_bootstrap_v2(ctx, ct, keys)
    got = ckks.decode(ctx, ckks.decrypt(ctx, sk, fresh))
    np.testing.assert_allclose(got.real, z, atol=1e-2)
