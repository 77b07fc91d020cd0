"""Digit-sharded Method-II keyswitch with the evaluation keys SPLIT over
the mesh (parallel/keyswitch_sharded.py) — the HBM-wall answer: an N=2^16
bootstrap key set is ~10 GiB on one chip; sharding keys over the digit
axis cuts per-chip key HBM 1/k with ONE butterfly modular all-reduce per
keyswitch.  No reference counterpart (the reference is single-GPU,
SURVEY §2.6).  Run on CPU with 8 virtual devices:

XLA_FLAGS=--xla_force_host_platform_device_count=8 JAX_PLATFORMS=cpu \
  python examples/parallel/4_digit_sharded_keyswitch.py
"""

import os as _os, sys as _sys
_sys.path.insert(0, _os.path.abspath(_os.path.join(_os.path.dirname(__file__), '..', '..')))

import numpy as np
import jax
jax.config.update("jax_platforms", "cpu")   # multi-device demo: CPU mesh
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from heongpu_tpu.models import ckks
from heongpu_tpu.ops import keyswitch2 as ks2m
from heongpu_tpu.parallel import keyswitch_sharded as kss
from heongpu_tpu.utils import rng

k = min(4, len(jax.devices()))
mesh = Mesh(np.array(jax.devices()[:k]).reshape(1, k), ("dp", "limb"))
print(f"mesh: limb={k}")

# 16 Q limbs, alpha=4 -> 4 digits; each device owns 4/k digit groups
ctx = ckks.make_context(1024, [29] + [25] * 15, sec_level="none",
                        ks_type="II", alpha=4, p_count=4)
sk = ckks.keygen_secret(ctx, rng.new_key(1))
rk = ckks.keygen_relin(ctx, rng.new_key(2), sk)
ks2 = ctx.ks2[0]
sc = kss.stack_convs(ks2)

R = np.random.default_rng(0)
poly = np.stack([R.integers(0, p, ctx.n).astype(np.uint32)
                 for p in ctx.q_primes])

# keys sharded 1/k per device over the DIGIT axis; ciphertext limbs
# sharded group-aligned
k0 = jax.device_put(rk.k0, NamedSharding(mesh, P("limb", None, None)))
k1 = jax.device_put(rk.k1, NamedSharding(mesh, P("limb", None, None)))
pq = jax.device_put(jnp.asarray(poly), NamedSharding(mesh, P("limb", None)))
print("key bytes per device:", rk.k0.nbytes // k)

with mesh:
    d0, d1 = jax.jit(lambda a, b, c: kss.keyswitch2_sharded(
        mesh, a, b, c, ks2, sc, ctx.ntt_qp_at(0), ctx.base_qp_at(0),
        ctx.ntt_q(0)))(pq, k0, k1)

ref0, ref1 = ks2m.keyswitch2(
    jnp.asarray(poly), rk.k0, rk.k1, ks2, ctx.ntt_qp_at(0),
    ctx.base_qp_at(0), in_ntt=False, out_ntt=True, ntt_q_level=ctx.ntt_q(0))
print("bit-identical to the single-device keyswitch:",
      bool(jnp.all(d0 == ref0) and jnp.all(d1 == ref1)))
