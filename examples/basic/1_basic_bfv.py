"""Basic BFV: encode -> encrypt -> add/multiply(+relin)/rotate -> decrypt.
Mirrors reference example/basic/1_basic_bfv.cpp."""

import os as _os, sys as _sys
_sys.path.insert(0, _os.path.abspath(_os.path.join(_os.path.dirname(__file__), '..', '..')))

import numpy as np

from heongpu_tpu.models import bfv
from heongpu_tpu.utils import params, rng

N = 4096
t = params.plain_modulus_for(N, 20)
ctx = bfv.make_context(N, t, q_bits=[29, 29, 29, 29], sec_level="none")

sk = bfv.keygen_secret(ctx, rng.new_key())
pk = bfv.keygen_public(ctx, rng.new_key(), sk)
rk = bfv.keygen_relin(ctx, rng.new_key(), sk)
gk = bfv.keygen_galois(ctx, rng.new_key(), sk)

msg1 = np.arange(N, dtype=np.uint64) % 7
msg2 = np.arange(N, dtype=np.uint64) % 5
c1 = bfv.encrypt(ctx, pk, bfv.encode(ctx, msg1), rng.new_key())
c2 = bfv.encrypt(ctx, pk, bfv.encode(ctx, msg2), rng.new_key())

c_add = bfv.add(ctx, c1, c2)
c_mul = bfv.relinearize(ctx, bfv.multiply(ctx, c1, c2), rk)
c_rot = bfv.rotate_rows(ctx, c1, gk, 3)

print("noise budget:", bfv.noise_budget(ctx, sk, c_mul), "bits")
assert np.array_equal(bfv.decode(ctx, bfv.decrypt(ctx, sk, c_add)),
                      (msg1 + msg2) % t)
assert np.array_equal(bfv.decode(ctx, bfv.decrypt(ctx, sk, c_mul)),
                      (msg1 * msg2) % t)
got = bfv.decode(ctx, bfv.decrypt(ctx, sk, c_rot))
assert np.array_equal(got[: N // 2], np.roll(msg1[: N // 2], -3))
print("basic bfv ok")
