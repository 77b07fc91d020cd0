"""CKKS approximate boolean gates on {0,1} slots.
Mirrors reference example/basic/12_basic_ckks_logic.cpp."""

import os as _os, sys as _sys
_sys.path.insert(0, _os.path.abspath(_os.path.join(_os.path.dirname(__file__), '..', '..')))

import numpy as np

from heongpu_tpu.models import ckks, logic
from heongpu_tpu.utils import rng

ctx = ckks.make_context(2048, [29, 28, 28, 28, 28], scale_bits=28,
                        sec_level="none")
sk = ckks.keygen_secret(ctx, rng.new_key())
pk = ckks.keygen_public(ctx, rng.new_key(), sk)
rk = ckks.keygen_relin(ctx, rng.new_key(), sk)

half = ctx.n // 2
a = np.resize([0.0, 0.0, 1.0, 1.0], half)
b = np.resize([0.0, 1.0, 0.0, 1.0], half)
ca = ckks.encrypt(ctx, pk, ckks.encode(ctx, a), rng.new_key())
cb = ckks.encrypt(ctx, pk, ckks.encode(ctx, b), rng.new_key())

ab, bb = a > 0.5, b > 0.5
for name, fn, want in [
    ("AND", logic.ckks_and, ab & bb), ("OR", logic.ckks_or, ab | bb),
    ("XOR", logic.ckks_xor, ab ^ bb), ("NAND", logic.ckks_nand, ~(ab & bb)),
]:
    got = ckks.decode(ctx, ckks.decrypt(ctx, sk, fn(ctx, ca, cb, rk))).real
    assert np.allclose(got, want.astype(float), atol=1e-2), name
    print(name, "ok:", np.round(got[:4], 3))
