"""Fused Pallas blind-rotation kernel (ops/tfhe_kernel.py) vs the jnp chain.

The kernel must be BIT-identical to models/tfhe.bootstrap_raw — same NTT
tables, same renormalisation points, same gadget decomposition — so the test
compares raw uint32 LWE outputs, not just decrypted bits.  Runs in pallas
interpret mode on CPU (the TPU-compiled kernel is exercised by benchmarks).
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from heongpu_tpu.models import tfhe


@pytest.mark.slow
def test_bootstrap_fused_matches_raw():
    ctx = tfhe.make_context()
    sk = tfhe.keygen_secret(jax.random.PRNGKey(0))
    bk = tfhe.keygen_boot(ctx, jax.random.PRNGKey(1), sk)
    bits = np.array([0, 1, 0, 1, 1, 0, 1, 1], dtype=np.int32)
    ct = tfhe.encrypt(ctx, sk, bits, jax.random.PRNGKey(2))

    r_raw = tfhe.bootstrap_raw(ctx, bk, ct)
    r_fused = tfhe.bootstrap_fused(ctx, bk, ct, tile=8, interpret=True)

    assert bool(jnp.all(r_raw.a == r_fused.a))
    assert bool(jnp.all(r_raw.b == r_fused.b))
    np.testing.assert_array_equal(np.asarray(tfhe.decrypt(ctx, sk, r_fused)),
                                  bits.astype(bool))


@pytest.mark.slow
def test_bootstrap_fused_pads_partial_tile():
    ctx = tfhe.make_context()
    sk = tfhe.keygen_secret(jax.random.PRNGKey(3))
    bk = tfhe.keygen_boot(ctx, jax.random.PRNGKey(4), sk)
    bits = np.array([1, 0, 1], dtype=np.int32)   # B=3, tile=8 -> padded
    ct = tfhe.encrypt(ctx, sk, bits, jax.random.PRNGKey(5))
    out = tfhe.bootstrap_fused(ctx, bk, ct, tile=8, interpret=True)
    assert out.a.shape[0] == 3
    np.testing.assert_array_equal(np.asarray(tfhe.decrypt(ctx, sk, out)),
                                  bits.astype(bool))


@pytest.mark.slow
def test_bootstrap_unrolled_decrypts():
    """2-bit key unrolling is a different algorithm (TGSW triples, n/2 steps)
    so no bit-identity with raw — the oracle is exact decryption of the
    bootstrap payload plus a NAND truth-table through the dispatcher."""
    ctx = tfhe.make_context()
    sk = tfhe.keygen_secret(jax.random.PRNGKey(10))
    bk2 = tfhe.keygen_boot_unrolled(ctx, jax.random.PRNGKey(11), sk)
    bits = np.array([0, 1, 0, 1, 1, 0, 1, 1], dtype=np.int32)
    ct = tfhe.encrypt(ctx, sk, bits, jax.random.PRNGKey(12))
    out = tfhe.bootstrap_fused2(ctx, bk2, ct, tile=8, interpret=True)
    np.testing.assert_array_equal(np.asarray(tfhe.decrypt(ctx, sk, out)),
                                  bits.astype(bool))
    # gates accept BootKey2 through the dispatcher
    c1 = tfhe.encrypt(ctx, sk, np.array([0, 0, 1, 1]), jax.random.PRNGKey(13))
    c2 = tfhe.encrypt(ctx, sk, np.array([0, 1, 0, 1]), jax.random.PRNGKey(14))
    g = tfhe.NAND(ctx, bk2, c1, c2)
    np.testing.assert_array_equal(np.asarray(tfhe.decrypt(ctx, sk, g)),
                                  np.array([True, True, True, False]))


@pytest.mark.slow
def test_weak_id_cache_never_aliases_recycled_objects():
    """Two sequentially-allocated keying objects must never share a cache
    entry, even if the second lands at the first's recycled id() address
    (VERDICT r3 weak §5: stale key stream = silent wrong results)."""
    import gc
    import jax.numpy as jnp

    cache = tfhe._WeakIdCache()

    class Obj:  # stand-in for a key array (weakref-able, GC-able)
        pass

    hits = []
    addr = None
    for i in range(64):  # loop raises the odds of CPython address reuse
        o = Obj()
        if addr is None:
            addr = id(o)
        got = cache.get(o, 8)
        hits.append(got)
        cache.put(o, 8, f"stream-{i}")
        assert cache.get(o, 8) == f"stream-{i}"
        del o
        gc.collect()
    assert all(h is None for h in hits)  # no cross-object hit, ever
    # finalizers evicted everything -> no leak
    assert len(cache._d) == 0

    # distinct tiles are distinct entries for the same object
    k = jnp.zeros((4,), jnp.uint32)
    cache.put(k, 8, "t8")
    cache.put(k, 16, "t16")
    assert cache.get(k, 8) == "t8" and cache.get(k, 16) == "t16"
