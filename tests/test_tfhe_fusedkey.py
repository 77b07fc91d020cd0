"""FusedKey (pre-compiled fused-chain key) surfaces: layout-converter
roundtrips, end-to-end jit of gates/adders with the key as a pytree arg, and
the Kogge-Stone carry-gate margin fallback."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from heongpu_tpu.models import tfhe, tfhe_int
from heongpu_tpu.ops import tfhe_kernel as tk


def test_prep_acc_roundtrip():
    R = np.random.default_rng(0)
    acc = jnp.asarray(R.integers(0, 1 << 30, (16, 2, 2, 1024),
                                 dtype=np.uint32))
    for Bt in (8, 16):
        k = tk.prep_acc(acc, Bt)
        assert k.shape == (32, (16 // Bt) * tk.lane_width(Bt))
        back = tk.unprep_acc(k, 16, Bt)
        np.testing.assert_array_equal(np.asarray(back), np.asarray(acc))


def test_prep_a_broadcast():
    R = np.random.default_rng(1)
    a = jnp.asarray(R.integers(0, 2048, (8, 512), dtype=np.int32))
    e = tk.prep_a(a, 8, 2048)
    assert e.shape == (512, tk.lane_width(8))
    ev = np.asarray(e).reshape(512, 2, 8, 2, 32)
    # every lane of batch b in step i holds a[b, i], in both limb regions
    for i in (0, 17, 511):
        for b in (0, 3, 7):
            assert (ev[i, :, b] == int(a[b, i])).all()


def test_carry_gate_margin_fallback():
    # fresh standard-key variance: 1-round path qualifies
    v = tfhe.bootstrap_output_variance(tfhe.make_context.__wrapped__()
                                       if hasattr(tfhe.make_context,
                                                  "__wrapped__")
                                       else tfhe.make_context())
    pre_v = 6 * v
    assert tfhe_int._carry_margin_bits(pre_v) >= 1.0
    # 4x-variance unrolled-key outputs: must fall back to the 2-round form
    assert tfhe_int._carry_margin_bits(6 * 4 * v) < 1.0


@pytest.mark.slow
def test_fusedkey_gate_and_add_jit_interpret():
    """End-to-end jit with FusedKey as a pytree argument (CPU interpreter)."""
    ctx = tfhe.make_context()
    sk = tfhe.keygen_secret(jax.random.PRNGKey(0))
    bk = tfhe.keygen_boot(ctx, jax.random.PRNGKey(1), sk)
    fk = tfhe.compile_key(ctx, bk, tile=8)

    c1 = tfhe.encrypt(ctx, sk, np.array([0, 0, 1, 1]), jax.random.PRNGKey(2))
    c2 = tfhe.encrypt(ctx, sk, np.array([0, 1, 0, 1]), jax.random.PRNGKey(3))
    g = jax.jit(lambda a, b: tfhe.NAND(ctx, fk, a, b))(c1, c2)
    np.testing.assert_array_equal(np.asarray(tfhe.decrypt(ctx, sk, g)),
                                  [True, True, True, False])

    xs = np.array([173], np.int64)
    ys = np.array([201], np.int64)
    hx = tfhe_int.encrypt_huint(ctx, sk, xs, 8, jax.random.PRNGKey(4))
    hy = tfhe_int.encrypt_huint(ctx, sk, ys, 8, jax.random.PRNGKey(5))
    hs, _ = jax.jit(tfhe_int.add)(ctx, fk, hx, hy)
    np.testing.assert_array_equal(
        tfhe_int.decrypt_huint(ctx, sk, hs).astype(np.int64),
        (xs + ys) % 256)
