"""Signed homomorphic integers (hint8..hint256) and the 2-bit key-unrolled
bootstrap: two's-complement encode/decode, negate/abs, signed compare, and
arithmetic shift over encrypted values.

The reference advertises the huint family (README feature table); the signed
family plus key unrolling (BootKey2: TGSW triples, n/2-step CMux chain) are
TPU-native extensions — see models/tfhe_int.py and ops/tfhe_kernel._chain2.
"""

import os as _os, sys as _sys
_sys.path.insert(0, _os.path.abspath(_os.path.join(_os.path.dirname(__file__), '..', '..')))

import numpy as np

from heongpu_tpu.models import tfhe, tfhe_int
from heongpu_tpu.utils import rng

ctx = tfhe.make_context()
sk = tfhe.keygen_secret(rng.new_key())
# key-unrolled bootstrapping key: 1.5x key material, half the sequential
# chain; gates and huint/hint circuits accept it wherever a BootKey goes
bk = tfhe.keygen_boot_unrolled(ctx, rng.new_key(1), sk)

xs = np.array([-100, 7, -1], object)
ys = np.array([27, -120, 1], object)
hx = tfhe_int.encrypt_hint(ctx, sk, xs, 8, rng.new_key(2))
hy = tfhe_int.encrypt_hint(ctx, sk, ys, 8, rng.new_key(3))

hs, _ = tfhe_int.add(ctx, bk, hx, hy)          # wraps mod 2^8, signed view
print("x + y =", tfhe_int.decrypt_hint(ctx, sk, hs))

hn = tfhe_int.neg(ctx, bk, hx)
print("-x    =", tfhe_int.decrypt_hint(ctx, sk, hn))

ha = tfhe_int.abs_(ctx, bk, hx)
print("|x|   =", tfhe_int.decrypt_hint(ctx, sk, ha))

geb = tfhe.decrypt(ctx, sk, tfhe_int.ge_signed(ctx, bk, hx, hy))
print("x>=y  =", geb)

hr = tfhe_int.shift_right_arith(ctx, hx, 2)    # free: bit positions move
print("x>>2  =", tfhe_int.decrypt_hint(ctx, sk, hr))

want = [((int(a) + int(b) + 128) % 256) - 128 for a, b in zip(xs, ys)]
assert list(tfhe_int.decrypt_hint(ctx, sk, hs)) == want
print("signed-int example ok")
