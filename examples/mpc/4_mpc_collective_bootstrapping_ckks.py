"""Single-round collective CKKS bootstrapping: refresh an exhausted-level
ciphertext back to level 0 via party shares.
Mirrors reference example/mpc/4_mpc_collective_bootstrapping_ckks.cpp."""

import os as _os, sys as _sys
_sys.path.insert(0, _os.path.abspath(_os.path.join(_os.path.dirname(__file__), '..', '..')))

import numpy as np

from heongpu_tpu.models import ckks, mpc, ringkit
from heongpu_tpu.utils import rng

PARTIES, CRS_SEED = 3, 555
ctx = ckks.make_context(1024, [29, 25, 25, 25], sec_level="none")
ring = ckks._ring(ctx)
sks = [ringkit.keygen_secret(ring, rng.new_key()) for _ in range(PARTIES)]
a = mpc.crs_uniform(ring, CRS_SEED, (ctx.n,))
pk = mpc.pk_assemble(ring, [mpc.pk_share(ring, sk, a, rng.new_key())
                            for sk in sks], a)

z = np.random.default_rng(0).uniform(-1, 1, ctx.n // 2)
ct = ckks.encrypt(ctx, pk, ckks.encode(ctx, z), rng.new_key())
ct = ckks.mod_drop(ctx, ct, 2)
print(f"before: level {ct.level} ({ctx.active(ct.level)} limbs)")

shares = [mpc.ckks_colboot_participant(ctx, sk, ct, CRS_SEED + 1, rng.new_key())
          for sk in sks]
fresh = mpc.ckks_colboot_coordinator(ctx, ct, shares, CRS_SEED + 1)
print(f"after: level {fresh.level} ({ctx.active(fresh.level)} limbs)")

partials = [mpc.ckks_decrypt_partial(ctx, sk, fresh, rng.new_key())
            for sk in sks]
got = ckks.decode(ctx, mpc.ckks_decrypt_fuse(ctx, fresh, partials))
assert np.allclose(got.real, z, atol=5e-2)
print("collective CKKS bootstrapping ok")
