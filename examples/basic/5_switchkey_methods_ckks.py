"""CKKS leveled keyswitching with methods I and II.
Mirrors reference example/basic/5_switchkey_methods_ckks.cpp."""

import os as _os, sys as _sys
_sys.path.insert(0, _os.path.abspath(_os.path.join(_os.path.dirname(__file__), '..', '..')))

import numpy as np

from heongpu_tpu.models import ckks
from heongpu_tpu.utils import rng

z = None
for ks_type, alpha in (("I", 1), ("II", 2)):
    ctx = ckks.make_context(2048, [29, 28, 28, 28], scale_bits=28,
                            sec_level="none", ks_type=ks_type, alpha=alpha)
    if z is None:
        z = np.linspace(-1, 1, ctx.n // 2)
    sk = ckks.keygen_secret(ctx, rng.new_key())
    pk = ckks.keygen_public(ctx, rng.new_key(), sk)
    rk = ckks.keygen_relin(ctx, rng.new_key(), sk)
    c = ckks.encrypt(ctx, pk, ckks.encode(ctx, z), rng.new_key())
    sq = ckks.rescale(ctx, ckks.relinearize(ctx, ckks.multiply(ctx, c, c), rk))
    # keyswitching stays valid after dropping a level
    sq2 = ckks.rescale(ctx, ckks.relinearize(ctx, ckks.multiply(ctx, sq, sq), rk))
    got = ckks.decode(ctx, ckks.decrypt(ctx, sk, sq2)).real
    assert np.allclose(got, z ** 4, atol=1e-2)
    print(f"METHOD_{ks_type} (alpha={alpha}): leveled relinearize ok at "
          f"levels 0 and 1")
