"""Coefficient-sharded four-step NTT: the transpose between the two butterfly
phases is ONE all_to_all over the mesh (ICI on real pods).

XLA_FLAGS=--xla_force_host_platform_device_count=8 JAX_PLATFORMS=cpu \
  python examples/parallel/2_coef_sharded_ntt.py
"""

import os as _os, sys as _sys
_sys.path.insert(0, _os.path.abspath(_os.path.join(_os.path.dirname(__file__), '..', '..')))

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from heongpu_tpu.ops import ntt as nttm
from heongpu_tpu.parallel import ntt_sharded
from heongpu_tpu.utils import nt

n, L = 8192, 3
primes = nt.generate_ntt_primes(29, L, n)
tb = nttm.build_ntt_tables(primes, n, use_mxu=False)
nd = len(jax.devices())
mesh = Mesh(np.array(jax.devices()).reshape(nd), ("coef",))
fwd, inv = ntt_sharded.make_sharded_ntt(mesh, tb)

R = np.random.default_rng(0)
x = np.stack([R.integers(0, p, size=n, dtype=np.uint32) for p in primes])
x4 = jax.device_put(ntt_sharded.to_four_step(jnp.asarray(x), tb),
                    NamedSharding(mesh, P(None, None, "coef")))
y4 = fwd(x4)
assert bool(jnp.all(ntt_sharded.from_four_step_ntt(y4)
                    == nttm.ntt_fwd(jnp.asarray(x), tb)))
assert bool(jnp.all(inv(y4).reshape(x.shape) == jnp.asarray(x)))
print(f"coef-sharded NTT over {nd} devices: bit-exact roundtrip, "
      f"one all_to_all per transform")
