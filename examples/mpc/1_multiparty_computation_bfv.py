"""N-out-of-N multiparty BFV: collective public key, 2-round collective
relinearization key, compute, threshold decrypt.  All parties simulated
in-process (reference example/mpc/1_multiparty_computation_bfv.cpp pattern)."""

import os as _os, sys as _sys
_sys.path.insert(0, _os.path.abspath(_os.path.join(_os.path.dirname(__file__), '..', '..')))

import numpy as np

from heongpu_tpu.models import bfv, mpc, ringkit
from heongpu_tpu.ops import modmath as mm
from heongpu_tpu.utils import params, rng

PARTIES = 3
CRS_SEED = 1234
N = 1024

ctx = bfv.make_context(N, params.plain_modulus_for(N, 20),
                       q_bits=[29, 29, 29], sec_level="none")
ring = bfv._ring(ctx)
sks = [ringkit.keygen_secret(ring, rng.new_key()) for _ in range(PARTIES)]

# --- collective public key from a common reference string
a = mpc.crs_uniform(ring, CRS_SEED, (ctx.n,))
pk = mpc.pk_assemble(ring, [mpc.pk_share(ring, sk, a, rng.new_key())
                            for sk in sks], a)

# --- 2-round collective relinearization key
a_d = mpc.relin_crs(ring, CRS_SEED + 1)
r1, ephs = zip(*[mpc.relin_round1(ring, sk, a_d, rng.new_key()) for sk in sks])
p = ring.base_qp.bview()[0]
d0, d1 = r1[0]
for s in r1[1:]:
    d0, d1 = mm.add_mod(d0, s[0], p), mm.add_mod(d1, s[1], p)
r2 = [mpc.relin_round2(ring, sk, eph, d0, d1, rng.new_key())
      for sk, eph in zip(sks, ephs)]
rk = mpc.relin_assemble(ring, list(r1), r2)

# --- server-side compute with the assembled keys
m1 = np.arange(N, dtype=np.int64) % 7
m2 = np.arange(N, dtype=np.int64) % 5
c1 = bfv.encrypt(ctx, pk, bfv.encode(ctx, m1), rng.new_key())
c2 = bfv.encrypt(ctx, pk, bfv.encode(ctx, m2), rng.new_key())
prod = bfv.relinearize(ctx, bfv.multiply(ctx, c1, c2), rk)

# --- threshold decryption (every party contributes a partial)
partials = [mpc.bfv_decrypt_partial(ctx, sk, prod, rng.new_key())
            for sk in sks]
got = bfv.decode(ctx, mpc.bfv_decrypt_fuse(ctx, prod, partials))
assert np.array_equal(got, (m1 * m2 % ctx.t).astype(np.uint32))
print(f"{PARTIES}-party BFV multiply + threshold decrypt ok")
