"""Basic TFHE: encrypt bool vectors, run all gates + MUX through real gate
bootstrapping, plus huint8 arithmetic.
Mirrors reference example/basic/15_basic_tfhe.cpp (extended with the
advertised huint types)."""

import os as _os, sys as _sys
_sys.path.insert(0, _os.path.abspath(_os.path.join(_os.path.dirname(__file__), '..', '..')))

import numpy as np

from heongpu_tpu.models import tfhe, tfhe_int
from heongpu_tpu.utils import rng

ctx = tfhe.make_context()
sk = tfhe.keygen_secret(rng.new_key())
bk = tfhe.keygen_boot(ctx, rng.new_key(), sk)

R = np.random.default_rng(1)
b1 = R.integers(0, 2, 8)
b2 = R.integers(0, 2, 8)
c1 = tfhe.encrypt(ctx, sk, b1, rng.new_key())
c2 = tfhe.encrypt(ctx, sk, b2, rng.new_key())

for name, fn, want in [
    ("NAND", tfhe.NAND, ~(b1 & b2) & 1), ("AND", tfhe.AND, b1 & b2),
    ("OR", tfhe.OR, b1 | b2), ("XOR", tfhe.XOR, b1 ^ b2),
]:
    got = tfhe.decrypt(ctx, sk, fn(ctx, bk, c1, c2)).astype(int)
    assert np.array_equal(got, want), name
    print(name, "ok")

sel = tfhe.encrypt(ctx, sk, np.ones(8, int), rng.new_key())
mux = tfhe.decrypt(ctx, sk, tfhe.MUX(ctx, bk, sel, c1, c2)).astype(int)
assert np.array_equal(mux, b1)
print("MUX ok")

x, y = 170, 95
hx = tfhe_int.encrypt_huint(ctx, sk, x, 8, rng.new_key())
hy = tfhe_int.encrypt_huint(ctx, sk, y, 8, rng.new_key())
hs, _ = tfhe_int.add(ctx, bk, hx, hy)
print(f"huint8: {x} + {y} = {tfhe_int.decrypt_huint(ctx, sk, hs)[0]} "
      f"(expect {(x + y) % 256})")
