"""Serialization roundtrips for every user-visible object (reference
examples 13/14 bfv/ckks serialization)."""

import os
import numpy as np

from heongpu_tpu.models import bfv, ckks, tfhe
from heongpu_tpu.utils import rng, serializer, params


def _roundtrip(obj):
    data = serializer.serialize(obj)
    back = serializer.deserialize(data)
    flat1 = __import__("jax").tree_util.tree_leaves(obj)
    flat2 = __import__("jax").tree_util.tree_leaves(back)
    assert len(flat1) == len(flat2)
    for a, b in zip(flat1, flat2):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    return back, len(data)


def test_bfv_objects(tmp_path):
    t = params.plain_modulus_for(1024, 20)
    ctx = bfv.make_context(1024, t, q_bits=[29, 29], sec_level="none")
    sk = bfv.keygen_secret(ctx, rng.new_key(1))
    pk = bfv.keygen_public(ctx, rng.new_key(2), sk)
    m = np.arange(1024, dtype=np.int64) % ctx.t
    ct = bfv.encrypt(ctx, pk, bfv.encode(ctx, m), rng.new_key(3))

    for obj in (sk, pk, ct):
        _roundtrip(obj)

    # ciphertext survives a file roundtrip and still decrypts
    path = os.path.join(tmp_path, "ct.bin")
    serializer.save_to_file(ct, path)
    ct2 = serializer.load_from_file(path)
    got = bfv.decode(ctx, bfv.decrypt(ctx, sk, ct2))
    np.testing.assert_array_equal(got, m.astype(np.uint32))

    # compression does something on structured data
    raw = np.asarray(ct.c).nbytes
    comp = len(serializer.serialize(ct))
    assert comp < raw * 1.1


def test_ckks_objects():
    ctx = ckks.make_context(1024, [29, 25, 25], sec_level="none")
    sk = ckks.keygen_secret(ctx, rng.new_key(4))
    pk = ckks.keygen_public(ctx, rng.new_key(5), sk)
    rk = ckks.keygen_relin(ctx, rng.new_key(6), sk)
    z = np.linspace(-1, 1, 512)
    pt = ckks.encode(ctx, z)
    ct = ckks.encrypt(CTX := ctx, pk, pt, rng.new_key(7))
    for obj in (sk, pk, rk, pt, ct):
        back, _ = _roundtrip(obj)
    back, _ = _roundtrip(ct)
    got = ckks.decode(ctx, ckks.decrypt(ctx, sk, back))
    np.testing.assert_allclose(got.real, z, atol=1e-3)


def test_context_roundtrip():
    ctx = ckks.make_context(1024, [29, 25], sec_level="none")
    back, _ = _roundtrip(ctx)
    assert back.q_primes == ctx.q_primes and back.n == ctx.n


def test_tfhe_ct_roundtrip():
    ctx = tfhe.make_context()
    sk = tfhe.keygen_secret(rng.new_key(8))
    bits = np.array([True, False, True])
    ct = tfhe.encrypt(ctx, sk, bits, rng.new_key(9))
    back, _ = _roundtrip(ct)
    np.testing.assert_array_equal(tfhe.decrypt(ctx, sk, back), bits)


def test_seed_expanded_key_compression():
    """Seed-expanded keys serialize ~50% smaller and expand exactly
    (reference stores common seeds for the uniform halves,
    host/bfv/publickey.cuh:324; README.md:76 'up to 60%' reduction)."""
    from heongpu_tpu.models import bfv, ringkit
    from heongpu_tpu.utils import params, rng

    t = params.plain_modulus_for(256, 20)
    ctx = bfv.make_context(256, t, q_bits=[29, 29], sec_level="none")
    ring = bfv._ring(ctx)
    sk = ringkit.keygen_secret(ring, rng.new_key(1))

    pk = bfv.keygen_public(ctx, rng.new_key(2), sk, a_seed=4242)
    data_full = serializer.serialize(pk)
    data_small = serializer.serialize(ringkit.strip_seeded(pk))
    assert len(data_small) < 0.6 * len(data_full)
    pk2 = ringkit.expand_seeded(serializer.deserialize(data_small), ring)
    np.testing.assert_array_equal(np.asarray(pk.pk1), np.asarray(pk2.pk1))
    np.testing.assert_array_equal(np.asarray(pk.pk0), np.asarray(pk2.pk0))

    gk = bfv.keygen_galois(ctx, rng.new_key(3), sk, steps=[1, -1], a_seed=900)
    small = serializer.serialize(ringkit.strip_seeded(gk))
    gk2 = ringkit.expand_seeded(serializer.deserialize(small), ring)
    for name in gk.keys:
        np.testing.assert_array_equal(np.asarray(gk.keys[name].k1),
                                      np.asarray(gk2.keys[name].k1))

    # an unseeded key is unaffected by strip/expand
    rk = bfv.keygen_relin(ctx, rng.new_key(4), sk)
    assert ringkit.strip_seeded(rk) is rk

    # and the seeded public key still encrypts correctly
    m = np.arange(256) % ctx.t
    ct = bfv.encrypt(ctx, pk2, bfv.encode(ctx, m), rng.new_key(5))
    got = bfv.decode(ctx, bfv.decrypt(ctx, sk, ct))
    np.testing.assert_array_equal(got, m.astype(np.uint32))
