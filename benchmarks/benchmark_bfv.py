"""Per-op BFV timing table (reference benchmark/benchmark_bfv.cpp)."""

import os as _os, sys as _sys
_sys.path.insert(0, _os.path.abspath(_os.path.join(_os.path.dirname(__file__), '..')))

import argparse
import time

import numpy as np
import jax

from heongpu_tpu.utils.cache import enable_compile_cache
enable_compile_cache()
from heongpu_tpu.models import bfv
from heongpu_tpu.utils import params, rng


def bench_fn(f, *args, iters=10):
    o = f(*args)
    jax.block_until_ready(o)
    t0 = time.perf_counter()
    for _ in range(iters):
        o = f(*args)
    jax.block_until_ready(o)
    return (time.perf_counter() - t0) / iters * 1e3


def run(n, nq, ks_type="II", alpha=2, iters=10):
    if ks_type == "I":
        alpha = 1
    t = params.plain_modulus_for(n, 20)
    ctx = bfv.make_context(n, t, q_bits=[29] * nq, sec_level="none",
                           ks_type=ks_type, alpha=alpha)
    sk = bfv.keygen_secret(ctx, rng.new_key())
    pk = bfv.keygen_public(ctx, rng.new_key(), sk)
    rk = bfv.keygen_relin(ctx, rng.new_key(), sk)
    gk = bfv.keygen_galois(ctx, rng.new_key(), sk, steps=[1])
    m = np.arange(n, dtype=np.uint64) % t
    pt = bfv.encode(ctx, m)
    ct1 = bfv.encrypt(ctx, pk, pt, rng.new_key())
    ct2 = bfv.encrypt(ctx, pk, pt, rng.new_key())
    import dataclasses
    wrap = lambda c: dataclasses.replace(ct1, c=c)
    g1 = list(gk.keys.values())[0]

    rows = {
        "encrypt": bench_fn(jax.jit(lambda p, k: bfv.encrypt(ctx, pk, p, k).c),
                            pt, rng.new_key(), iters=iters),
        "add": bench_fn(jax.jit(lambda a, b: bfv.add(ctx, wrap(a), wrap(b)).c),
                        ct1.c, ct2.c, iters=iters),
        "multiply": bench_fn(jax.jit(lambda a, b: bfv.multiply(
            ctx, wrap(a), wrap(b)).c), ct1.c, ct2.c, iters=iters),
        "mult+relin": bench_fn(jax.jit(lambda a, b: bfv.relinearize(
            ctx, bfv.multiply(ctx, wrap(a), wrap(b)), rk).c),
            ct1.c, ct2.c, iters=iters),
        "rotate": bench_fn(jax.jit(lambda a: bfv.apply_galois(
            ctx, wrap(a), g1).c), ct1.c, iters=iters),
        "decrypt": bench_fn(jax.jit(lambda a: bfv.decrypt(ctx, sk, wrap(a))),
                            ct1.c, iters=iters),
    }
    print(f"\nBFV N={n}, {nq} limbs, METHOD_{ks_type} alpha={alpha}")
    for k, v in rows.items():
        print(f"  {k:12s} {v:9.3f} ms")


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--sizes", default="4096,16384,32768")
    ap.add_argument("--ks", default="II")
    args = ap.parse_args()
    for n in [int(s) for s in args.sizes.split(",")]:
        nq = {4096: 3, 8192: 4, 16384: 6, 32768: 8, 65536: 10}.get(n, 3)
        run(n, nq, ks_type=args.ks)
