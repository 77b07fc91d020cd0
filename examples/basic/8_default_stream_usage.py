"""Default "stream" usage: JAX's async dispatch queue is the TPU analog of
the reference's default CUDA stream (example/basic/8_default_stream_usage.cpp)
— every op call enqueues on the device and returns immediately; results are
fetched lazily (block_until_ready / host reads synchronize)."""

import os as _os, sys as _sys
_sys.path.insert(0, _os.path.abspath(_os.path.join(_os.path.dirname(__file__), '..', '..')))

import time

import numpy as np
import jax

from heongpu_tpu.models import ckks
from heongpu_tpu.utils import rng

ctx = ckks.make_context(4096, [29, 28, 28], scale_bits=28, sec_level="none")
sk = ckks.keygen_secret(ctx, rng.new_key())
pk = ckks.keygen_public(ctx, rng.new_key(), sk)
rk = ckks.keygen_relin(ctx, rng.new_key(), sk)
z = np.linspace(0, 1, ctx.n // 2)
ct = ckks.encrypt(ctx, pk, ckks.encode(ctx, z), rng.new_key())


@jax.jit
def square(c):
    a = ckks.Ciphertext(c, 2, 0, ctx.default_scale)
    return ckks.rescale(ctx, ckks.relinearize(ctx, ckks.multiply(ctx, a, a), rk)).c


out = square(ct.c)          # warm-up compile
out.block_until_ready()

t0 = time.perf_counter()
outs = [square(ct.c) for _ in range(8)]   # all enqueued asynchronously
t_enqueue = time.perf_counter() - t0
jax.block_until_ready(outs)
t_total = time.perf_counter() - t0
print(f"enqueue of 8 ops: {t_enqueue*1e3:.2f} ms; completion: {t_total*1e3:.2f} ms")
print("async dispatch = default-stream semantics ok")
