"""TFHE gate + huint benchmark (reference benchmark/benchmark_tfhe.cpp:29-70
per-gate averages; README.md:55-67 huint add table)."""

import os as _os, sys as _sys
_sys.path.insert(0, _os.path.abspath(_os.path.join(_os.path.dirname(__file__), '..')))

import argparse
import time

import numpy as np
import jax

from heongpu_tpu.utils.cache import enable_compile_cache
enable_compile_cache()
from heongpu_tpu.models import tfhe, tfhe_int
from heongpu_tpu.utils import rng


def run_impl(ctx, sk, key, label, widths, batch, reps):
    """One table for a bootstrap backend; `key` is a BootKey (raw per the
    module switch) or a tfhe.FusedKey (fused chain, end-to-end jit)."""
    R = np.random.default_rng(0)
    b1 = R.integers(0, 2, batch)
    b2 = R.integers(0, 2, batch)
    c1 = tfhe.encrypt(ctx, sk, b1, rng.new_key())
    c2 = tfhe.encrypt(ctx, sk, b2, rng.new_key())
    print(f"TFHE STD128 [{label}], gate batch B={batch}")
    for name, fn in [("NAND", tfhe.NAND), ("AND", tfhe.AND), ("OR", tfhe.OR),
                     ("XOR", tfhe.XOR)]:
        g = jax.jit(lambda a, b, fn=fn: fn(ctx, key, a, b))
        o = g(c1, c2)
        jax.block_until_ready(o.b)
        t0 = time.perf_counter()
        for _ in range(reps):
            o = g(c1, c2)
        jax.block_until_ready(o.b)
        dt = (time.perf_counter() - t0) / reps
        print(f"  {name:5s} {dt*1e3:8.1f} ms  ({dt/batch*1e6:8.1f} us/gate amortized)")

    jadd = jax.jit(tfhe_int.add)
    for w in widths:
        xs = R.integers(0, 1 << min(w, 62), 1, dtype=np.int64)
        ys = R.integers(0, 1 << min(w, 62), 1, dtype=np.int64)
        hx = tfhe_int.encrypt_huint(ctx, sk, xs, w, rng.new_key())
        hy = tfhe_int.encrypt_huint(ctx, sk, ys, w, rng.new_key())
        hs, _ = jadd(ctx, key, hx, hy)
        jax.block_until_ready(hs.bits.b)
        t0 = time.perf_counter()
        hs, _ = jadd(ctx, key, hx, hy)
        jax.block_until_ready(hs.bits.b)
        dt = time.perf_counter() - t0
        print(f"  huint{w:<3d} add {dt*1e3:8.1f} ms  "
              f"({tfhe_int.bootstrap_rounds(w)} batched blind-rotation rounds)")


def main(widths, batch, reps, impls):
    ctx = tfhe.make_context()
    sk = tfhe.keygen_secret(rng.new_key())
    bk = bk2 = None
    if {"raw", "fused"} & set(impls):
        bk = tfhe.keygen_boot(ctx, rng.new_key(), sk)
    if "unrolled" in impls:
        bk2 = tfhe.keygen_boot_unrolled(ctx, rng.new_key(7), sk)
    for impl in impls:
        if impl == "raw":
            tfhe.set_bootstrap_impl(impl)
            run_impl(ctx, sk, bk, impl, widths, batch, reps)
        elif impl == "fused":
            run_impl(ctx, sk, tfhe.compile_key(ctx, bk), impl, widths,
                     batch, reps)
        else:
            run_impl(ctx, sk, tfhe.compile_key(ctx, bk2), "unrolled", widths,
                     batch, reps)
    tfhe.set_bootstrap_impl("auto")


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--widths", default="8,16,32,64,128,256")
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--reps", type=int, default=5)
    ap.add_argument("--impls", default="fused,unrolled,raw")
    args = ap.parse_args()
    main([int(w) for w in args.widths.split(",")], args.batch, args.reps,
         args.impls.split(","))
