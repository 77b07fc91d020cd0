"""Fused Pallas keyswitch core vs the jnp stage path — bit-exact parity.

The fused kernel (ops/keyswitch_pallas.py) must produce the identical
(d0, d1) pair as ops/keyswitch2.keyswitch2 for the same inputs, since both
implement the same exact integer algorithm (FastBconv -> NTT -> lazy MAC ->
INTT -> ÷P stages)."""

import numpy as np
import jax.numpy as jnp
import pytest

from heongpu_tpu.ops import keyswitch2 as ks2m
from heongpu_tpu.ops import keyswitch_pallas as ksp
from heongpu_tpu.ops import ntt as nttm
from heongpu_tpu.ops import rns
from heongpu_tpu.utils import nt


@pytest.mark.parametrize("ka,alpha", [(4, 2), (5, 2)])
def test_fused_matches_stages(ka, alpha):
    n = 256
    p_count = alpha
    primes = nt.generate_ntt_primes(29, ka + p_count, n)
    q_primes, p_primes = primes[:ka], primes[ka:]
    ks2 = ks2m.build_ks2_level(q_primes, p_primes, ka, alpha)
    kqp = ka + p_count
    tb_qp = nttm.build_ntt_tables(primes, n)
    tb_q = nttm.build_ntt_tables(q_primes, n)
    base_qp = rns.Base.build(primes)

    rng = np.random.default_rng(7)
    d_t = len(ks2.groups)
    poly = jnp.asarray(
        rng.integers(0, np.array(q_primes)[:, None], (ka, n)).astype(np.uint32))
    k0 = jnp.asarray(
        rng.integers(0, np.array(primes)[None, :, None],
                     (d_t, kqp, n)).astype(np.uint32))
    k1 = jnp.asarray(
        rng.integers(0, np.array(primes)[None, :, None],
                     (d_t, kqp, n)).astype(np.uint32))

    for in_ntt, out_ntt in [(False, False), (True, True),
                            (True, False), (False, True)]:
        want0, want1 = ks2m.keyswitch2(poly, k0, k1, ks2, tb_qp, base_qp,
                                       in_ntt, out_ntt, tb_q)
        got0, got1 = ksp.keyswitch2_fused(poly, k0, k1, ks2, tb_qp, base_qp,
                                          in_ntt, out_ntt, tb_q,
                                          interpret=True)
        assert (np.asarray(want0) == np.asarray(got0)).all(), (in_ntt, out_ntt)
        assert (np.asarray(want1) == np.asarray(got1)).all(), (in_ntt, out_ntt)
