"""Single-round collective (interactive) BFV bootstrapping: every party
publishes a masked decryption share, the coordinator re-encrypts under the
common key — noise resets without evaluation keys.
Mirrors reference example/mpc/3_mpc_collective_bootstrapping_bfv.cpp."""

import os as _os, sys as _sys
_sys.path.insert(0, _os.path.abspath(_os.path.join(_os.path.dirname(__file__), '..', '..')))

import numpy as np

from heongpu_tpu.models import bfv, mpc, ringkit
from heongpu_tpu.utils import params, rng

PARTIES, CRS_SEED = 3, 999
N = 1024
ctx = bfv.make_context(N, params.plain_modulus_for(N, 20),
                       q_bits=[29, 29, 29], sec_level="none")
ring = bfv._ring(ctx)
sks = [ringkit.keygen_secret(ring, rng.new_key()) for _ in range(PARTIES)]
a = mpc.crs_uniform(ring, CRS_SEED, (ctx.n,))
pk = mpc.pk_assemble(ring, [mpc.pk_share(ring, sk, a, rng.new_key())
                            for sk in sks], a)
rk = None  # not needed for collective bootstrap

m = np.arange(N, dtype=np.int64) % 31
ct = bfv.encrypt(ctx, pk, bfv.encode(ctx, m), rng.new_key())
for _ in range(3):  # burn noise with additions
    ct = bfv.add(ctx, ct, ct)
    m = (2 * m) % ctx.t

shares = [mpc.bfv_colboot_participant(ctx, sk, ct, CRS_SEED + 1, rng.new_key())
          for sk in sks]
fresh = mpc.bfv_colboot_coordinator(ctx, ct, shares, CRS_SEED + 1)

partials = [mpc.bfv_decrypt_partial(ctx, sk, fresh, rng.new_key())
            for sk in sks]
got = bfv.decode(ctx, mpc.bfv_decrypt_fuse(ctx, fresh, partials))
assert np.array_equal(got, m.astype(np.uint32))
print("collective BFV bootstrapping ok (1 round, no eval keys)")
