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


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 devices")
def test_digit_sharded_keyswitch_bit_identical():
    """Explicit shard_map digit-parallel keyswitch (keys sharded over the
    digit axis, one butterfly modular all-reduce) is bit-identical to the
    single-device Method-II keyswitch at every mesh size."""
    from heongpu_tpu.models import ckks
    from heongpu_tpu.ops import keyswitch2 as ks2m
    from heongpu_tpu.parallel import keyswitch_sharded as kss
    from heongpu_tpu.utils import rng

    # 16 Q limbs / alpha=4 -> 4 digits; mesh sizes 1,2,4 split group-aligned
    ctx = ckks.make_context(512, [29] + [25] * 15, sec_level="none",
                            ks_type="II", alpha=4, p_count=4)
    sk = ckks.keygen_secret(ctx, rng.new_key(1))
    rk = ckks.keygen_relin(ctx, rng.new_key(2), sk)
    ks2 = ctx.ks2[0]
    R = np.random.default_rng(0)
    poly = np.stack([R.integers(0, p, ctx.n).astype(np.uint32)
                     for p in ctx.q_primes])
    ref0, ref1 = ks2m.keyswitch2(
        jnp.asarray(poly), rk.k0, rk.k1, ks2, ctx.ntt_qp_at(0),
        ctx.base_qp_at(0), in_ntt=False, out_ntt=True,
        ntt_q_level=ctx.ntt_q(0))
    sc = kss.stack_convs(ks2)
    for k in (2, 4):
        mesh = Mesh(np.array(jax.devices()[:k]).reshape(1, k),
                    ("dp", "limb"))
        pq = jax.device_put(jnp.asarray(poly),
                            NamedSharding(mesh, P("limb", None)))
        k0 = jax.device_put(rk.k0, NamedSharding(mesh, P("limb", None, None)))
        k1 = jax.device_put(rk.k1, NamedSharding(mesh, P("limb", None, None)))
        assert not k0.sharding.is_fully_replicated
        with mesh:
            s0, s1 = jax.jit(
                lambda a, b, c, m=mesh: kss.keyswitch2_sharded(
                    m, a, b, c, ks2, sc, ctx.ntt_qp_at(0),
                    ctx.base_qp_at(0), ctx.ntt_q(0)))(pq, k0, k1)
        np.testing.assert_array_equal(np.asarray(s0), np.asarray(ref0))
        np.testing.assert_array_equal(np.asarray(s1), np.asarray(ref1))
