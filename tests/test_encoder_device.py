"""Device-side CKKS encoder / compose paths vs the host float64/big-int
oracles (reference runs encode/decode fully on-GPU:
src/lib/host/ckks/encoder.cu:103-220, kernel/encoding.cu,
kernel/decryption.cu compose/max-norm kernels)."""

import numpy as np
import pytest

from heongpu_tpu.models import ckks
from heongpu_tpu.ops import compose, df64, sfft
from heongpu_tpu.utils import nt, rng


@pytest.fixture(scope="module")
def ctx():
    return ckks.make_context(256, [29, 25, 25, 25], sec_level="none")


def test_sfft_matches_host_embedding(ctx):
    tabs = sfft.build_tables(ctx.n)
    r = np.random.default_rng(1)
    z = r.uniform(-1, 1, ctx.n // 2) + 1j * r.uniform(-1, 1, ctx.n // 2)
    a_ref = ckks._embed_coeffs_from_slots(ctx, z)
    a_dev = df64.to_f64(sfft.embed_from_slots(
        df64.from_f64(z.real), df64.from_f64(z.imag), tabs))
    np.testing.assert_allclose(a_dev, a_ref, atol=1e-12)
    zr, zi = sfft.slots_from_embed(df64.from_f64(a_ref), tabs)
    z_back = df64.to_f64(zr) + 1j * df64.to_f64(zi)
    np.testing.assert_allclose(
        z_back, ckks._slots_from_embed_coeffs(ctx, a_ref), atol=1e-11)


def test_device_encode_matches_host(ctx):
    r = np.random.default_rng(2)
    z = r.uniform(-1, 1, ctx.n // 2) + 1j * r.uniform(-1, 1, ctx.n // 2)
    pt_d = ckks.encode(ctx, z)
    pt_h = ckks.encode_host(ctx, z)
    # residues may differ by ±1 on rounding-tie coefficients only
    from heongpu_tpu.ops import ntt as nttm
    cd = np.asarray(nttm.ntt_inv(pt_d.m, ctx.ntt_q(0)))
    chost = np.asarray(nttm.ntt_inv(pt_h.m, ctx.ntt_q(0)))
    for i, q in enumerate(ctx.q_primes):
        di = (cd[i].astype(np.int64) - chost[i].astype(np.int64)) % int(q)
        di = np.minimum(di, int(q) - di)
        assert di.max() <= 1
    # and decodes to the message
    np.testing.assert_allclose(ckks.decode(ctx, pt_d), z, atol=1e-6)


def test_device_decode_matches_host(ctx):
    r = np.random.default_rng(3)
    z = r.uniform(-1, 1, ctx.n // 2)
    pt = ckks.encode_host(ctx, z)
    np.testing.assert_allclose(ckks.decode(ctx, pt), ckks.decode_host(ctx, pt),
                               atol=1e-7)


def test_coeff_mode_device(ctx):
    r = np.random.default_rng(4)
    v = r.uniform(-3, 3, ctx.n)
    pt = ckks.encode_coeff(ctx, v)
    got = ckks.decode_coeff(ctx, pt)
    np.testing.assert_allclose(got, v, atol=1e-6)


def test_compose_small_exact():
    primes = [int(q) for q in nt.generate_ntt_primes(29, 5, 512)]
    t = compose.build_tables(primes)
    r = np.random.default_rng(5)
    vals = r.integers(-2 ** 48, 2 ** 48, 2048)
    x = np.stack([(vals % q).astype(np.uint32) for q in primes])
    got = df64.to_f64(compose.compose_small(np.asarray(x), tuple(primes), t))
    np.testing.assert_allclose(got, vals, rtol=2e-14, atol=0.5)


def test_frac_log2_norm():
    from functools import reduce
    primes = [int(q) for q in nt.generate_ntt_primes(29, 4, 512)]
    Q = reduce(lambda a, b: a * b, primes)
    t = compose.build_tables(primes)
    r = np.random.default_rng(6)
    mag = Q // 1000
    # r.integers caps at int64; draw big ints from random bits instead
    vals = [int.from_bytes(r.bytes(16), "little") % (2 * mag) - mag
            for _ in range(512)]
    x = np.stack([np.array([v % q for v in vals], np.uint32) for q in primes])
    got = float(compose.frac_log2_norm(np.asarray(x), tuple(primes), t))
    ref = float(np.log2(float(max(abs(v) for v in vals))))
    assert abs(got - ref) < 0.01


def test_batch_encode_rns(ctx):
    r = np.random.default_rng(7)
    zs = (r.uniform(-1, 1, (5, ctx.n // 2)) +
          1j * r.uniform(-1, 1, (5, ctx.n // 2)))
    primes = tuple(ctx.q_primes[:3])
    res = np.asarray(ckks.encode_batch_rns(ctx.n, zs, primes, 2.0 ** 25))
    assert res.shape == (5, 3, ctx.n)
    # each row matches the single-vector host path to ±1
    a = ckks._embed_coeffs_from_slots(ctx, zs[2]) * 2.0 ** 25
    ref = ckks.coeffs_to_rns(a, primes)
    for i, q in enumerate(primes):
        d = (res[2, i].astype(np.int64) - ref[i].astype(np.int64)) % int(q)
        d = np.minimum(d, int(q) - d)
        assert d.max() <= 1


def test_noise_budget_device_matches_host():
    import math
    from functools import reduce
    from heongpu_tpu.models import bfv
    from heongpu_tpu.utils import params

    t = params.plain_modulus_for(256, 20)
    bctx = bfv.make_context(256, t, q_bits=[29, 29], sec_level="none")
    sk = bfv.keygen_secret(bctx, rng.new_key(8))
    pk = bfv.keygen_public(bctx, rng.new_key(9), sk)
    m = np.arange(256) % bctx.t
    ct = bfv.encrypt(bctx, pk, bfv.encode(bctx, m), rng.new_key(10))
    nb = bfv.noise_budget(bctx, sk, ct)
    # host oracle
    y = np.asarray(bfv._ct_dot_sk(bctx, ct, sk))
    lift = np.asarray(bfv._plain_lift(bctx, bfv.decrypt(bctx, sk, ct)))
    qb = np.array(bctx.q_primes, np.uint64)
    diff = (y.astype(np.int64) - lift.astype(np.int64)) % qb[:, None]
    Q = reduce(lambda a, b: a * b, [int(q) for q in bctx.q_primes])
    mx = max(abs(nt.crt_compose([int(diff[i, c]) for i in range(bctx.k)],
                                list(bctx.q_primes))) for c in range(256))
    ref = max(0.0, math.log2(Q / 2) - math.log2(mx))
    assert abs(nb - ref) < 1e-6
