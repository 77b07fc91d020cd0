"""Task parallelism way 2 — round-robin async dispatch from a single host
thread (reference example/basic/10_multi_stream_usage_way2.cpp): distinct
jitted programs interleave on the device queue without host synchronization
between launches."""

import os as _os, sys as _sys
_sys.path.insert(0, _os.path.abspath(_os.path.join(_os.path.dirname(__file__), '..', '..')))

import numpy as np
import jax

from heongpu_tpu.models import bfv, ckks
from heongpu_tpu.utils import params, rng

bctx = bfv.make_context(2048, params.plain_modulus_for(2048, 17),
                        q_bits=[29, 29, 29], sec_level="none")
cctx = ckks.make_context(2048, [29, 28, 28], scale_bits=28, sec_level="none")

bsk = bfv.keygen_secret(bctx, rng.new_key())
bpk = bfv.keygen_public(bctx, rng.new_key(), bsk)
csk = ckks.keygen_secret(cctx, rng.new_key())
cpk = ckks.keygen_public(cctx, rng.new_key(), csk)

m = np.arange(2048, dtype=np.uint64) % 11
z = np.linspace(0, 1, 1024)
bc = bfv.encrypt(bctx, bpk, bfv.encode(bctx, m), rng.new_key())
cc = ckks.encrypt(cctx, cpk, ckks.encode(cctx, z), rng.new_key())

badd = jax.jit(lambda c: bfv.add(bctx, c, c).c)
cadd = jax.jit(lambda c: ckks.add(cctx, c, c).c)

# interleaved launches; the queue overlaps them like multiple streams
results = []
for _ in range(4):
    results.append(badd(bc))
    results.append(cadd(cc))
jax.block_until_ready(results)

import dataclasses
got_b = bfv.decode(bctx, bfv.decrypt(
    bctx, bsk, dataclasses.replace(bc, c=results[-2])))
assert np.array_equal(got_b, (2 * m) % bctx.t)
print("round-robin async dispatch over two scheme programs ok")
