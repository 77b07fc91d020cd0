"""BFV boolean logic gates composed from ring arithmetic.
Mirrors reference example/basic/11_basic_bfv_logic.cpp."""

import os as _os, sys as _sys
_sys.path.insert(0, _os.path.abspath(_os.path.join(_os.path.dirname(__file__), '..', '..')))

import numpy as np

from heongpu_tpu.models import bfv, logic
from heongpu_tpu.utils import params, rng

N = 2048
ctx = bfv.make_context(N, params.plain_modulus_for(N, 17),
                       q_bits=[29, 29, 29], sec_level="none")
sk = bfv.keygen_secret(ctx, rng.new_key())
pk = bfv.keygen_public(ctx, rng.new_key(), sk)
rk = bfv.keygen_relin(ctx, rng.new_key(), sk)

a = np.resize([0, 0, 1, 1], N).astype(np.uint64)
b = np.resize([0, 1, 0, 1], N).astype(np.uint64)
ca = bfv.encrypt(ctx, pk, bfv.encode(ctx, a), rng.new_key())
cb = bfv.encrypt(ctx, pk, bfv.encode(ctx, b), rng.new_key())

for name, fn, want in [
    ("AND", logic.bfv_and, a & b), ("OR", logic.bfv_or, a | b),
    ("XOR", logic.bfv_xor, a ^ b), ("NAND", logic.bfv_nand, 1 - (a & b)),
    ("NOR", logic.bfv_nor, 1 - (a | b)), ("XNOR", logic.bfv_xnor, 1 - (a ^ b)),
]:
    got = bfv.decode(ctx, bfv.decrypt(ctx, sk, fn(ctx, ca, cb, rk)))
    assert np.array_equal(got, want), name
    print(name, "ok:", got[:4])
got = bfv.decode(ctx, bfv.decrypt(ctx, sk, logic.bfv_not(ctx, ca)))
assert np.array_equal(got, 1 - a)
print("NOT ok:", got[:4])
