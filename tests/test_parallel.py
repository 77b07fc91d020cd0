"""Multi-device sharding tests on the 8-virtual-device CPU mesh:
limb/dp-sharded flagship op equivalence and the coefficient-sharded
four-step NTT (all-to-all transpose over the mesh)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from heongpu_tpu.ops import ntt as nttm
from heongpu_tpu.parallel import mesh as meshlib
from heongpu_tpu.parallel import ntt_sharded
from heongpu_tpu.utils import nt


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 devices")
def test_sharded_ntt_matches_single_device():
    n, L = 2048, 3
    primes = nt.generate_ntt_primes(29, L, n)
    tb = nttm.build_ntt_tables(primes, n, use_mxu=False)
    mesh = Mesh(np.array(jax.devices()[:8]).reshape(8), ("coef",))
    fwd, inv = ntt_sharded.make_sharded_ntt(mesh, tb)

    R = np.random.default_rng(0)
    x = np.stack([R.integers(0, p, size=n, dtype=np.uint32) for p in primes])
    xj = jnp.asarray(x)
    x4 = jax.device_put(ntt_sharded.to_four_step(xj, tb),
                        NamedSharding(mesh, P(None, None, "coef")))
    y4 = fwd(x4)
    np.testing.assert_array_equal(
        np.asarray(ntt_sharded.from_four_step_ntt(y4)),
        np.asarray(nttm.ntt_fwd(xj, tb)))
    np.testing.assert_array_equal(np.asarray(inv(y4)).reshape(x.shape), x)


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 devices")
def test_limb_sharded_mult_relin_matches():
    from heongpu_tpu.models import ckks
    from heongpu_tpu.utils import rng

    ctx = ckks.make_context(1024, [29, 25, 25, 25], sec_level="none")
    sk = ckks.keygen_secret(ctx, rng.new_key(1))
    pk = ckks.keygen_public(ctx, rng.new_key(2), sk)
    rk = ckks.keygen_relin(ctx, rng.new_key(3), sk)
    z = np.linspace(-1, 1, ctx.n // 2)
    ct = ckks.encrypt(ctx, pk, ckks.encode(ctx, z), rng.new_key(4))

    def step(c):
        a = ckks.Ciphertext(c, 2, 0, ctx.default_scale)
        return ckks.relinearize(ctx, ckks.multiply(ctx, a, a), rk).c

    ref = jax.jit(step)(ct.c)

    m = meshlib.make_mesh(8, limb_shards=4)
    c_sh = jax.device_put(ct.c, NamedSharding(m, P(None, "limb", None)))
    with m:
        got = jax.jit(step)(c_sh)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))
