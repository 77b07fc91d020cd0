"""Task parallelism way 1 — one batched program instead of one CUDA stream
per thread (reference example/basic/9_multi_stream_usage_way1.cpp): the TPU
analog of N streams over N independent ciphertext jobs is vmap — all jobs
fuse into one grid-saturating program."""

import os as _os, sys as _sys
_sys.path.insert(0, _os.path.abspath(_os.path.join(_os.path.dirname(__file__), '..', '..')))

import numpy as np
import jax
import jax.numpy as jnp

from heongpu_tpu.models import ckks
from heongpu_tpu.utils import rng

ctx = ckks.make_context(2048, [29, 28, 28], scale_bits=28, sec_level="none")
sk = ckks.keygen_secret(ctx, rng.new_key())
pk = ckks.keygen_public(ctx, rng.new_key(), sk)
rk = ckks.keygen_relin(ctx, rng.new_key(), sk)

JOBS = 8
z = np.linspace(0, 1, ctx.n // 2)
cts = jnp.stack([ckks.encrypt(ctx, pk, ckks.encode(ctx, z * (j + 1)),
                              rng.new_key()).c for j in range(JOBS)])


def square_one(c):
    a = ckks.Ciphertext(c, 2, 0, ctx.default_scale)
    return ckks.rescale(ctx, ckks.relinearize(ctx, ckks.multiply(ctx, a, a), rk)).c


outs = jax.jit(jax.vmap(square_one))(cts)
for j in range(JOBS):
    got = ckks.decode(ctx, ckks.decrypt(
        ctx, sk, ckks.Ciphertext(outs[j], 2, 1,
                                 ctx.default_scale ** 2 / ctx.q_primes[2])))
    assert np.allclose(got.real, (z * (j + 1)) ** 2, atol=3e-2)
print(f"vmap over {JOBS} independent jobs ok (one fused program)")
