"""Limb/dp-sharded CKKS pipeline over a device mesh (GSPMD inserts the
collectives).  No reference counterpart — the TPU-native scale-out layer
(SURVEY §2.6).  Run on CPU with 8 virtual devices:

XLA_FLAGS=--xla_force_host_platform_device_count=8 JAX_PLATFORMS=cpu \
  python examples/parallel/1_limb_sharded_pipeline.py
"""

import os as _os, sys as _sys
_sys.path.insert(0, _os.path.abspath(_os.path.join(_os.path.dirname(__file__), '..', '..')))

import numpy as np
import jax
from jax.sharding import NamedSharding, PartitionSpec as P

from heongpu_tpu.models import ckks
from heongpu_tpu.parallel import mesh as meshlib
from heongpu_tpu.utils import rng

nd = len(jax.devices())
m = meshlib.make_mesh(nd, limb_shards=min(4, nd))
print("mesh:", dict(m.shape))

ctx = ckks.make_context(1024, [29, 25, 25, 25], sec_level="none")
sk = ckks.keygen_secret(ctx, rng.new_key(1))
pk = ckks.keygen_public(ctx, rng.new_key(2), sk)
rk = ckks.keygen_relin(ctx, rng.new_key(3), sk)
z = np.linspace(-1, 1, ctx.n // 2)
ct = ckks.encrypt(ctx, pk, ckks.encode(ctx, z), rng.new_key(4))


def step(c):
    a = ckks.Ciphertext(c, 2, 0, ctx.default_scale)
    return ckks.relinearize(ctx, ckks.multiply(ctx, a, a), rk).c


c_sh = jax.device_put(ct.c, NamedSharding(m, P(None, "limb", None)))
with m:
    out = jax.jit(step)(c_sh)
out.block_until_ready()
print("limb-sharded mult+relin ok; output sharding:", out.sharding.spec)
ref = jax.jit(step)(ct.c)
assert bool(jax.numpy.all(out == ref))
print("matches single-device bit-for-bit")
