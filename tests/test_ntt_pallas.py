"""Fused Pallas NTT kernel vs the jnp four-step path.

On CPU these run in interpret mode; the sizes cover symmetric (n1 == n2)
and asymmetric (n1 != n2) four-step splits plus the small-N TFHE shape.
`test_pallas_compiled_matches_stages_tpu` asserts compiled-vs-stages
bit-equality when a real TPU is attached (skipped on CPU CI).
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from heongpu_tpu.ops import ntt as nttm
from heongpu_tpu.ops import ntt_pallas
from heongpu_tpu.utils import nt


def _roundtrip_case(n, limbs, interpret):
    primes = nt.generate_ntt_primes(29, limbs, n)
    tb = nttm.build_ntt_tables(primes, n)
    R = np.random.default_rng(n + limbs)
    x = np.stack([np.stack([R.integers(0, p, size=n, dtype=np.uint32)
                            for p in primes]) for _ in range(2)])
    xj = jnp.asarray(x)
    ref_f = nttm.ntt_fwd(xj, tb)
    got_f = ntt_pallas.ntt_pallas(xj, tb, inverse=False, interpret=interpret)
    np.testing.assert_array_equal(np.asarray(ref_f), np.asarray(got_f))
    got_i = ntt_pallas.ntt_pallas(got_f, tb, inverse=True, interpret=interpret)
    np.testing.assert_array_equal(np.asarray(got_i), x)


# n = 256/1024 are symmetric splits (n1 == n2), 512/2048 asymmetric
# (n1 == 2*n2), matching every shape class the schemes use.
@pytest.mark.parametrize("n,limbs", [(256, 3), (512, 3), (1024, 2),
                                     (2048, 4)])
def test_pallas_matches_jnp(n, limbs):
    _roundtrip_case(n, limbs, interpret=True)


@pytest.mark.skipif(jax.default_backend() == "cpu",
                    reason="needs a real TPU for the compiled Mosaic path")
@pytest.mark.parametrize("n,limbs", [(256, 3), (512, 3), (2048, 4),
                                     (65536, 12)])
def test_pallas_compiled_matches_stages_tpu(n, limbs):
    """Compiled (Mosaic) kernel bit-equals the jnp stage path on TPU,
    including the flagship N=2^16 shape (ADVICE r2: compiled parity had
    only benchmark coverage)."""
    _roundtrip_case(n, limbs, interpret=False)
