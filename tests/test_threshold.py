"""t-out-of-N threshold decryption (Shamir shares + Lagrange fusing).

The reference defers t-out-of-N to future work (example/mpc/README.md:72);
this verifies the standard construction end-to-end: any t of the N shares
reconstruct exactly (BFV) / within noise (CKKS), a wrong subset does not."""

import numpy as np
import pytest

from heongpu_tpu.models import bfv, ckks, mpc
from heongpu_tpu.utils import rng, params

RNG = np.random.default_rng(17)


def test_bfv_threshold_3_of_5():
    t = params.plain_modulus_for(1024, 20)
    ctx = bfv.make_context(1024, t, q_bits=[29, 29, 29], sec_level="none")
    sk = bfv.keygen_secret(ctx, rng.new_key(1))
    pk = bfv.keygen_public(ctx, rng.new_key(2), sk)
    shares = mpc.shamir_share_secret(ctx, rng.new_key(3), sk,
                                     n_parties=5, threshold=3)

    m = RNG.integers(0, ctx.t, ctx.n, dtype=np.int64)
    ct = bfv.encrypt(ctx, pk, bfv.encode(ctx, m), rng.new_key(4))

    for group in [(1, 3, 5), (2, 3, 4), (1, 2, 3, 4, 5)]:
        partials = [mpc.bfv_decrypt_partial_threshold(
            ctx, shares[i - 1], ct, group, rng.new_key(50 + i))
            for i in group]
        got = np.asarray(bfv.decode(ctx, mpc.bfv_decrypt_fuse(ctx, ct, partials)))
        np.testing.assert_array_equal(got, m.astype(np.uint32))

    # fewer than t participants is rejected up front
    with pytest.raises(AssertionError):
        mpc.bfv_decrypt_partial_threshold(ctx, shares[0], ct, (1, 2),
                                          rng.new_key(99))

    # a t-subset the party is not in is rejected
    with pytest.raises(AssertionError):
        mpc.bfv_decrypt_partial_threshold(ctx, shares[0], ct, (2, 3, 4),
                                          rng.new_key(98))


def test_ckks_threshold_2_of_3():
    ctx = ckks.make_context(1024, [29, 25, 25], scale_bits=25,
                            sec_level="none")
    sk = ckks.keygen_secret(ctx, rng.new_key(11))
    pk = ckks.keygen_public(ctx, rng.new_key(12), sk)
    shares = mpc.shamir_share_secret(ctx, rng.new_key(13), sk,
                                     n_parties=3, threshold=2)

    z = RNG.uniform(-1, 1, ctx.n // 2)
    ct = ckks.encrypt(ctx, pk, ckks.encode(ctx, z), rng.new_key(14))

    partials = [mpc.ckks_decrypt_partial_threshold(
        ctx, shares[i - 1], ct, (1, 3), rng.new_key(60 + i))
        for i in (1, 3)]
    got = ckks.decode(ctx, mpc.ckks_decrypt_fuse(ctx, ct, partials))
    # flooding noise (+-2^13/coeff) spreads ~sqrt(n) through the embedding:
    # bound ~ 2 parties * 2^13 * 32 / 2^25 ~ 1.6e-2 (same as N-of-N fusing)
    np.testing.assert_allclose(got.real, z, atol=5e-2)
