"""N-out-of-N multiparty CKKS: collective pk, compute, threshold decrypt.
Mirrors reference example/mpc/2_multiparty_computation_ckks.cpp."""

import os as _os, sys as _sys
_sys.path.insert(0, _os.path.abspath(_os.path.join(_os.path.dirname(__file__), '..', '..')))

import numpy as np

from heongpu_tpu.models import ckks, mpc, ringkit
from heongpu_tpu.utils import rng

PARTIES, CRS_SEED = 3, 4321
ctx = ckks.make_context(1024, [29, 25, 25, 25], sec_level="none")
ring = ckks._ring(ctx)
sks = [ringkit.keygen_secret(ring, rng.new_key()) for _ in range(PARTIES)]

a = mpc.crs_uniform(ring, CRS_SEED, (ctx.n,))
pk = mpc.pk_assemble(ring, [mpc.pk_share(ring, sk, a, rng.new_key())
                            for sk in sks], a)

z1 = np.linspace(-1, 1, ctx.n // 2)
z2 = np.linspace(0, 2, ctx.n // 2)
c1 = ckks.encrypt(ctx, pk, ckks.encode(ctx, z1), rng.new_key())
c2 = ckks.encrypt(ctx, pk, ckks.encode(ctx, z2), rng.new_key())
s = ckks.add(ctx, c1, c2)

partials = [mpc.ckks_decrypt_partial(ctx, sk, s, rng.new_key()) for sk in sks]
got = ckks.decode(ctx, mpc.ckks_decrypt_fuse(ctx, s, partials))
assert np.allclose(got.real, z1 + z2, atol=5e-2)
print(f"{PARTIES}-party CKKS add + threshold decrypt ok")
