"""BSGS polynomial evaluation + Chebyshev helpers (reference gen_power /
evaluate_poly / chebyshev_interpolation)."""

import math

import numpy as np
import pytest

from heongpu_tpu.models import ckks, poly_eval
from heongpu_tpu.utils import rng, precision


@pytest.fixture(scope="module")
def setup():
    ctx = ckks.make_context(256, [29] + [28] * 11, scale_bits=28,
                            sec_level="none")
    sk = ckks.keygen_secret(ctx, rng.new_key(21), hamming_weight=16)
    pk = ckks.keygen_public(ctx, rng.new_key(22), sk)
    rk = ckks.keygen_relin(ctx, rng.new_key(23), sk)
    return ctx, sk, pk, rk


@pytest.mark.slow
def test_cos_poly(setup):
    ctx, sk, pk, rk = setup
    z = np.linspace(-1, 1, ctx.n // 2)
    ct = ckks.encrypt(ctx, pk, ckks.encode(ctx, z), rng.new_key(24))
    coeffs = poly_eval.cosine_approx_coeffs(2.5, 23)
    out = poly_eval.eval_poly_bsgs(ctx, ct, coeffs, rk)
    got = ckks.decode(ctx, ckks.decrypt(ctx, sk, out)).real
    assert out.level <= 6  # log-depth, not Horner
    np.testing.assert_allclose(got, np.cos(2.5 * z), atol=1e-4)


@pytest.mark.slow
def test_odd_poly_and_precision_stats(setup):
    ctx, sk, pk, rk = setup
    z = np.linspace(-1, 1, ctx.n // 2)
    ct = ckks.encrypt(ctx, pk, ckks.encode(ctx, z), rng.new_key(25))
    coeffs = poly_eval.cheb_to_monomial(
        poly_eval.chebyshev_interp_coeffs(lambda v: math.sin(2 * v), 15))
    out = poly_eval.eval_poly_bsgs(ctx, ct, coeffs, rk)
    got = ckks.decode(ctx, ckks.decrypt(ctx, sk, out))
    stats = precision.precision_stats(np.sin(2 * z), got)
    assert stats.real_mean > 14  # ≥14 bits of precision
    np.testing.assert_allclose(got.real, np.sin(2 * z), atol=1e-4)


def test_chebyshev_interp_exactness():
    # interpolation of a degree-5 polynomial is exact
    f = lambda x: 3 * x ** 5 - x ** 3 + 0.5 * x - 2
    c = poly_eval.cheb_to_monomial(poly_eval.chebyshev_interp_coeffs(f, 7))
    x = np.linspace(-1, 1, 101)
    np.testing.assert_allclose(np.polynomial.polynomial.polyval(x, c), f(x),
                               atol=1e-10)
