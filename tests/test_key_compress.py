"""Seed-expanded (stripped) evaluation keys consumed directly: the uniform
half k1 is dropped from HBM and regenerated on device from a_seed at each
use (ringkit.ensure_k1).  Halves the resident size of large rotation-key
sets — what bounds the N=2^16 deep-chain bootstrap on one 16 GB chip.

Reference analog: common-seed key storage (host/bfv/publickey.cuh:324),
which the reference only exploits at serialization time; here the stripped
form is also the eval-time format.
"""

import numpy as np
import pytest
import jax

from heongpu_tpu.models import bfv, ckks, ckks_boot, ringkit
from heongpu_tpu.utils import rng, serializer


@pytest.fixture(scope="module", params=["I", "II"])
def ckks_ctx(request):
    return ckks.make_context(256, [30, 29, 29, 29], scale_bits=29,
                             sec_level="none", ks_type=request.param, alpha=2)


def test_ckks_stripped_keys_bit_identical(ckks_ctx):
    ctx = ckks_ctx
    sk = ckks.keygen_secret(ctx, rng.new_key(1))
    pk = ckks.keygen_public(ctx, rng.new_key(2), sk)
    gk_full = ckks.keygen_galois(ctx, rng.new_key(3), sk, steps=[1, 2],
                                 a_seed=77)
    gk_strip = ringkit.strip_seeded(gk_full)
    # store_a=False generates the same keys without ever storing k1
    gk_gen = ckks.keygen_galois(ctx, rng.new_key(3), sk, steps=[1, 2],
                                a_seed=77, store_a=False)
    rk_strip = ringkit.strip_seeded(
        ckks.keygen_relin(ctx, rng.new_key(4), sk, a_seed=88))
    rk_full = ckks.keygen_relin(ctx, rng.new_key(4), sk, a_seed=88)

    z = np.arange(128) / 128.0
    ct = ckks.encrypt(ctx, pk, ckks.encode(ctx, z), rng.new_key(5))

    a = ckks.rotate(ctx, ct, gk_full, 3)
    for gk in (gk_strip, gk_gen):
        b = ckks.rotate(ctx, ct, gk, 3)
        np.testing.assert_array_equal(np.asarray(a.c), np.asarray(b.c))

    m = ckks.multiply(ctx, ct, ct)
    r1 = ckks.relinearize(ctx, m, rk_full)
    r2 = ckks.relinearize(ctx, m, rk_strip)
    np.testing.assert_array_equal(np.asarray(r1.c), np.asarray(r2.c))

    # hoisted path + stripped key as a jitted pytree argument
    d = ckks.hoist(ctx, ct)
    g = [k for k in gk_full.keys if k != "conj"][0]
    h1 = ckks.rotate_hoisted(ctx, ct, d, gk_full.keys[g])
    h2 = ckks.rotate_hoisted(ctx, ct, d, gk_strip.keys[g])
    np.testing.assert_array_equal(np.asarray(h1.c), np.asarray(h2.c))
    f = jax.jit(lambda c_, k_: ckks.apply_galois(ctx, c_, k_))
    j1 = f(ct, gk_strip.keys[g])
    j2 = ckks.apply_galois(ctx, ct, gk_full.keys[g])
    np.testing.assert_array_equal(np.asarray(j1.c), np.asarray(j2.c))


def test_stripped_key_serializer_roundtrip(ckks_ctx):
    ctx = ckks_ctx
    sk = ckks.keygen_secret(ctx, rng.new_key(1))
    gk = ckks.keygen_galois(ctx, rng.new_key(3), sk, steps=[1], a_seed=7,
                            store_a=False)
    rk = ringkit.strip_seeded(ckks.keygen_relin(ctx, rng.new_key(4), sk,
                                                a_seed=8))
    back = serializer.deserialize(serializer.serialize({"gk": gk, "rk": rk}))
    g = [k for k in gk.keys if k != "conj"][0]
    assert back["gk"].keys[g].k1 is None
    assert back["gk"].keys[g].a_seed == gk.keys[g].a_seed
    np.testing.assert_array_equal(np.asarray(back["gk"].keys[g].k0),
                                  np.asarray(gk.keys[g].k0))
    assert back["rk"].k1 is None and back["rk"].a_seed == 8


def test_ensure_k1_requires_seed(ckks_ctx):
    ctx = ckks_ctx
    sk = ckks.keygen_secret(ctx, rng.new_key(1))
    rk = ckks.keygen_relin(ctx, rng.new_key(4), sk)  # no a_seed
    import dataclasses
    broken = dataclasses.replace(rk, k1=None)
    with pytest.raises(ValueError):
        ringkit.ensure_k1(ckks._ring(ctx), broken)
    with pytest.raises(ValueError):
        ckks.keygen_galois(ctx, rng.new_key(3), sk, steps=[1], store_a=False)


def test_bfv_stripped_keys_bit_identical():
    from heongpu_tpu.utils import params
    t = params.plain_modulus_for(256, 17)
    ctx = bfv.make_context(256, t, q_bits=[29, 29], sec_level="none")
    sk = bfv.keygen_secret(ctx, rng.new_key(1))
    pk = bfv.keygen_public(ctx, rng.new_key(2), sk)
    gk_full = bfv.keygen_galois(ctx, rng.new_key(3), sk, steps=[1], a_seed=9)
    gk_strip = ringkit.strip_seeded(gk_full)
    rk_full = bfv.keygen_relin(ctx, rng.new_key(4), sk, a_seed=10)
    rk_strip = ringkit.strip_seeded(rk_full)
    m = np.arange(256, dtype=np.int64) % ctx.t
    ct = bfv.encrypt(ctx, pk, bfv.encode(ctx, m), rng.new_key(5))
    a = bfv.rotate_rows(ctx, ct, gk_full, 1)
    b = bfv.rotate_rows(ctx, ct, gk_strip, 1)
    np.testing.assert_array_equal(np.asarray(a.c), np.asarray(b.c))
    mm_ = bfv.multiply(ctx, ct, ct)
    r1 = bfv.relinearize(ctx, mm_, rk_full)
    r2 = bfv.relinearize(ctx, mm_, rk_strip)
    np.testing.assert_array_equal(np.asarray(r1.c), np.asarray(r2.c))


@pytest.mark.slow
def test_bootstrap_compress_keys_bit_identical():
    """compress_keys=True bootstrap output is bit-identical to the full-key
    bootstrap (same keygen PRNG key), at the composite-scale precision
    config shape."""
    ctx = ckks.make_context(256, [29, 29] + [28] * 34, scale_bits=28,
                            sec_level="none", ks_type="II", alpha=2,
                            p_count=3)
    sk = ckks.keygen_secret(ctx, rng.new_key(61), hamming_weight=16)
    pk = ckks.keygen_public(ctx, rng.new_key(62), sk)
    cfg = ckks_boot.BootConfig(taylor_degree=7, exp_squarings=4,
                               ctos_pieces=2, stoc_pieces=2, base_count=2,
                               arcsin_order=1, piece_depth=2)
    k_full = ckks_boot.generate_bootstrap_keys(ctx, rng.new_key(63), sk, cfg)
    k_comp = ckks_boot.generate_bootstrap_keys(ctx, rng.new_key(63), sk, cfg,
                                               compress_keys=True)
    nb = lambda ks: sum(x.nbytes for x in jax.tree_util.tree_leaves(ks)
                        if hasattr(x, "nbytes"))
    assert nb(k_comp) < 0.75 * nb(k_full)
    # the stripped bundle must be bit-identical to its seed-expanded form
    # (a fresh unseeded keygen draws different uniform halves, so the
    # comparison is stripped-vs-expanded, not compressed-vs-uncompressed)
    ring = ckks._ring(ctx)
    k_exp = ckks_boot.BootKeys(
        gk=ringkit.expand_seeded(k_comp.gk, ring),
        rk=ringkit.expand_seeded(k_comp.rk, ring),
        cfg=k_comp.cfg, msg_scale=k_comp.msg_scale,
        ctos_pieces=k_comp.ctos_pieces, stoc_pieces=k_comp.stoc_pieces,
        mult_i=k_comp.mult_i, mult_neg_i=k_comp.mult_neg_i)
    z = np.random.default_rng(0).uniform(-0.5, 0.5, 128)
    ct = ckks.encrypt(ctx, pk, ckks.encode(ctx, z, scale=k_full.msg_scale),
                      rng.new_key(64))
    ct = ckks.mod_drop(ctx, ct, ctx.k - 2)
    fboot = jax.jit(lambda c_, k_: ckks_boot.regular_bootstrap(ctx, c_, k_))
    o1 = fboot(ct, k_exp)
    o2 = fboot(ct, k_comp)
    np.testing.assert_array_equal(np.asarray(o1.c), np.asarray(o2.c))
    # and the full-key bundle lands the same precision (different randomness)
    of = fboot(ct, k_full)
    gf = ckks.decode(ctx, ckks.decrypt(ctx, sk, of)).real
    g2 = ckks.decode(ctx, ckks.decrypt(ctx, sk, o2)).real
    e2, ef = float(np.abs(g2 - z).max()), float(np.abs(gf - z).max())
    assert abs(np.log10(max(e2, 1e-12)) - np.log10(max(ef, 1e-12))) < 0.5
