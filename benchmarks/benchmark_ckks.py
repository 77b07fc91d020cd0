"""Per-op CKKS timing table (reference benchmark/benchmark_ckks.cpp:16-33:
encode/encrypt/add/multiply/relinearize/rescale/rotate/decrypt at
N in {4096..65536})."""

import os as _os, sys as _sys
_sys.path.insert(0, _os.path.abspath(_os.path.join(_os.path.dirname(__file__), '..')))

import argparse
import time

import numpy as np
import jax

from heongpu_tpu.utils.cache import enable_compile_cache
enable_compile_cache()
from heongpu_tpu.models import ckks
from heongpu_tpu.utils import rng


def bench_fn(f, *args, iters=10):
    o = f(*args)
    jax.block_until_ready(o)
    t0 = time.perf_counter()
    for _ in range(iters):
        o = f(*args)
    jax.block_until_ready(o)
    return (time.perf_counter() - t0) / iters * 1e3


def run(n, nq, ks_type="II", alpha=4, iters=10):
    if ks_type == "I":
        alpha = 1
    ctx = ckks.make_context(n, [29] * nq, sec_level="none", ks_type=ks_type,
                            alpha=alpha)
    sk = ckks.keygen_secret(ctx, rng.new_key())
    pk = ckks.keygen_public(ctx, rng.new_key(), sk)
    rk = ckks.keygen_relin(ctx, rng.new_key(), sk)
    gk = ckks.keygen_galois(ctx, rng.new_key(), sk, steps=[1])
    z = np.linspace(-1, 1, n // 2)

    pt = ckks.encode(ctx, z)          # first call compiles the device NTT
    t_enc = time.perf_counter()
    pt = ckks.encode(ctx, z)
    t_enc = (time.perf_counter() - t_enc) * 1e3
    ct1 = ckks.encrypt(ctx, pk, pt, rng.new_key())
    ct2 = ckks.encrypt(ctx, pk, pt, rng.new_key())
    g1 = list(gk.keys.values())[0]

    encrypt = jax.jit(lambda m, k: ckks.encrypt(ctx, pk, ckks.Plaintext(m, 0,
                      ctx.default_scale), k).c)
    add = jax.jit(lambda a, b: ckks.add(ctx, ct1, ckks.Ciphertext(b, 2, 0,
                  ct1.scale)).c)
    mult = jax.jit(lambda a, b: ckks.multiply(
        ctx, ckks.Ciphertext(a, 2, 0, ct1.scale),
        ckks.Ciphertext(b, 2, 0, ct1.scale)).c)
    mult_relin = jax.jit(lambda a, b: ckks.relinearize(ctx, ckks.multiply(
        ctx, ckks.Ciphertext(a, 2, 0, ct1.scale),
        ckks.Ciphertext(b, 2, 0, ct1.scale)), rk).c)
    resc = jax.jit(lambda a: ckks.rescale(ctx, ckks.Ciphertext(
        a, 2, 0, ct1.scale)).c)
    rot = jax.jit(lambda a: ckks.apply_galois(ctx, ckks.Ciphertext(
        a, 2, 0, ct1.scale), g1).c)
    dec = jax.jit(lambda a: ckks.decrypt(ctx, sk, ckks.Ciphertext(
        a, 2, 0, ct1.scale)).m)

    K = 20  # chain length for composed rows

    def bench_chain(step, x0, *rest, r1=1, r2=5):
        """Per-op device time with K ops composed inside ONE jitted program
        (lax.fori_loop) — the dispatch-free number production pipelines see
        (reference per-op tables time raw kernels the same way).

        Trusted-sync delta protocol (the tunnel's block_until_ready can ack
        before execution finishes): reps serialize by feeding each output
        into the next call, the only sync is a host readback, and fixed
        costs cancel in the delta between short and long runs."""
        f = jax.jit(lambda x, *r: jax.lax.fori_loop(
            0, K, lambda i, c: step(c, *r), x))

        def run(reps):
            o = x0
            for _ in range(reps):
                o = f(o, *rest)
            np.asarray(jax.device_get(
                o[(0,) * (o.ndim - 1) + (slice(0, 8),)]))

        run(r1)  # compile + warm (incl. the readback path)
        t0 = time.perf_counter()
        run(r1)
        t_short = time.perf_counter() - t0
        t0 = time.perf_counter()
        run(r2)
        t_long = time.perf_counter() - t0
        return (t_long - t_short) / ((r2 - r1) * K) * 1e3

    rows = {
        "encrypt": bench_fn(encrypt, pt.m, rng.new_key(), iters=iters),
        "add": bench_fn(add, ct1.c, ct2.c, iters=iters),
        "multiply": bench_fn(mult, ct1.c, ct2.c, iters=iters),
        "mult+relin": bench_fn(mult_relin, ct1.c, ct2.c, iters=iters),
        "rescale": bench_fn(resc, ct1.c, iters=iters),
        "rotate": bench_fn(rot, ct1.c, iters=iters),
        "decrypt": bench_fn(dec, ct1.c, iters=iters),
        "add (composed)": bench_chain(
            lambda c, b: add(c, b), ct1.c, ct2.c),
        "mult+relin (composed)": bench_chain(
            lambda c, b: mult_relin(c, b), ct1.c, ct2.c),
        "rotate (composed)": bench_chain(lambda c: rot(c), ct1.c),
    }
    print(f"\nCKKS N={n}, {nq} limbs, METHOD_{ks_type} alpha={alpha} "
          f"(encode device: {t_enc:.2f} ms)")
    for k, v in rows.items():
        print(f"  {k:22s} {v:9.3f} ms")
    print("  note: single-op rows include ~2-3 ms per-call dispatch; the"
          " (composed) rows are lax.fori_loop chains inside one jit")


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--sizes", default="4096,16384,65536")
    ap.add_argument("--ks", default="II")
    args = ap.parse_args()
    for n in [int(s) for s in args.sizes.split(",")]:
        nq = {4096: 3, 8192: 5, 16384: 8, 32768: 10, 65536: 12}.get(n, 4)
        run(n, nq, ks_type=args.ks)
