"""Basic CKKS: encode -> encrypt -> add/mult(+relin+rescale)/rotate -> decode.
Mirrors reference example/basic/2_basic_ckks.cpp."""

import os as _os, sys as _sys
_sys.path.insert(0, _os.path.abspath(_os.path.join(_os.path.dirname(__file__), '..', '..')))

import numpy as np

from heongpu_tpu.models import ckks
from heongpu_tpu.utils import rng

ctx = ckks.make_context(4096, [29, 28, 28, 28], scale_bits=28, sec_level="none")
sk = ckks.keygen_secret(ctx, rng.new_key())
pk = ckks.keygen_public(ctx, rng.new_key(), sk)
rk = ckks.keygen_relin(ctx, rng.new_key(), sk)
gk = ckks.keygen_galois(ctx, rng.new_key(), sk)

z1 = np.linspace(0, 1, ctx.n // 2)
z2 = np.linspace(1, 2, ctx.n // 2)
c1 = ckks.encrypt(ctx, pk, ckks.encode(ctx, z1), rng.new_key())
c2 = ckks.encrypt(ctx, pk, ckks.encode(ctx, z2), rng.new_key())

c_add = ckks.add(ctx, c1, c2)
c_mul = ckks.rescale(ctx, ckks.relinearize(ctx, ckks.multiply(ctx, c1, c2), rk))
c_rot = ckks.rotate(ctx, c1, gk, 5)

assert np.allclose(ckks.decode(ctx, ckks.decrypt(ctx, sk, c_add)).real,
                   z1 + z2, atol=1e-3)
assert np.allclose(ckks.decode(ctx, ckks.decrypt(ctx, sk, c_mul)).real,
                   z1 * z2, atol=1e-2)
assert np.allclose(ckks.decode(ctx, ckks.decrypt(ctx, sk, c_rot)).real,
                   np.roll(z1, -5), atol=1e-3)
print("basic ckks ok")
