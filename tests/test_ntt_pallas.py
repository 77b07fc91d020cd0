"""Fused Pallas NTT kernel vs the jnp four-step path (interpret mode on CPU;
the driver's bench exercises the compiled TPU path)."""

import numpy as np
import jax.numpy as jnp

from heongpu_tpu.ops import ntt as nttm
from heongpu_tpu.ops import ntt_pallas
from heongpu_tpu.utils import nt


def test_pallas_matches_jnp():
    n = 256
    primes = nt.generate_ntt_primes(29, 3, n)
    tb = nttm.build_ntt_tables(primes, n)
    R = np.random.default_rng(0)
    x = np.stack([np.stack([R.integers(0, p, size=n, dtype=np.uint32)
                            for p in primes]) for _ in range(2)])
    xj = jnp.asarray(x)
    ref_f = nttm.ntt_fwd(xj, tb)
    got_f = ntt_pallas.ntt_pallas(xj, tb, inverse=False, interpret=True)
    np.testing.assert_array_equal(np.asarray(ref_f), np.asarray(got_f))
    got_i = ntt_pallas.ntt_pallas(got_f, tb, inverse=True, interpret=True)
    np.testing.assert_array_equal(np.asarray(got_i), x)
