"""CKKS COEFFICIENT encoding mode (values as polynomial coefficients).
Mirrors reference example/basic/6_ckks_coefficient_encoding.cpp."""

import os as _os, sys as _sys
_sys.path.insert(0, _os.path.abspath(_os.path.join(_os.path.dirname(__file__), '..', '..')))

import numpy as np

from heongpu_tpu.models import ckks
from heongpu_tpu.utils import rng

ctx = ckks.make_context(2048, [29, 28, 28], scale_bits=28, sec_level="none")
sk = ckks.keygen_secret(ctx, rng.new_key())
pk = ckks.keygen_public(ctx, rng.new_key(), sk)

v = np.linspace(-2, 2, ctx.n)
pt = ckks.encode_coeff(ctx, v)
ct = ckks.encrypt(ctx, pk, pt, rng.new_key())
# additions behave coefficient-wise in this mode
ct2 = ckks.add(ctx, ct, ct)
got = ckks.decode_coeff(ctx, ckks.decrypt(ctx, sk, ct2))
assert np.allclose(got, 2 * v, atol=1e-4)
print("coefficient encoding roundtrip ok")
