"""BFV keyswitching methods I (per-prime digits) vs II (hybrid grouped
digits).  Mirrors reference example/basic/4_switchkey_methods_bfv.cpp."""

import os as _os, sys as _sys
_sys.path.insert(0, _os.path.abspath(_os.path.join(_os.path.dirname(__file__), '..', '..')))

import numpy as np

from heongpu_tpu.models import bfv
from heongpu_tpu.utils import params, rng

N = 4096
t = params.plain_modulus_for(N, 20)
msg1 = np.arange(N, dtype=np.uint64) % 7
msg2 = np.arange(N, dtype=np.uint64) % 5

for ks_type, alpha in (("I", 1), ("II", 2)):
    ctx = bfv.make_context(N, t, q_bits=[29] * 4, sec_level="none",
                           ks_type=ks_type, alpha=alpha)
    sk = bfv.keygen_secret(ctx, rng.new_key())
    pk = bfv.keygen_public(ctx, rng.new_key(), sk)
    rk = bfv.keygen_relin(ctx, rng.new_key(), sk)
    c1 = bfv.encrypt(ctx, pk, bfv.encode(ctx, msg1), rng.new_key())
    c2 = bfv.encrypt(ctx, pk, bfv.encode(ctx, msg2), rng.new_key())
    c = bfv.relinearize(ctx, bfv.multiply(ctx, c1, c2), rk)
    got = bfv.decode(ctx, bfv.decrypt(ctx, sk, c))
    assert np.array_equal(got, (msg1 * msg2) % t)
    print(f"METHOD_{ks_type} (alpha={alpha}): multiply+relinearize ok, "
          f"relin key digits: {rk.k0.shape[0]}")
