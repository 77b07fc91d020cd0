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

    # The tunnel's block_until_ready can return before device execution
    # finishes, so: serialize reps by feeding each output back as an input
    # (data dependency), sync via a host readback, and report the delta
    # between a 1-rep and an R-rep run (cancels dispatch + readback RTT).
    def timed_chain(step, seed_args, reps):
        def run(r):
            a = seed_args
            for _ in range(r):
                a = step(*a)
            np.asarray(jax.device_get(a[0].b[:4]))
            return a
        run(2)   # warm both jit signatures (fresh-input and chained-input
                 # variance metadata differ -> two compiles)
        t0 = time.perf_counter()
        run(1)
        t1 = time.perf_counter()
        run(1 + reps)
        t2 = time.perf_counter()
        return ((t2 - t1) - (t1 - t0)) / reps

    for name, fn in [("NAND", tfhe.NAND), ("AND", tfhe.AND), ("OR", tfhe.OR),
                     ("XOR", tfhe.XOR)]:
        g = jax.jit(lambda a, b, fn=fn: fn(ctx, key, a, b))
        dt = timed_chain(lambda a, b: (g(a, b), b), (c1, c2), reps)
        print(f"  {name:5s} {dt*1e3:8.1f} ms  ({dt/batch*1e6:8.1f} us/gate amortized)")

    # MUX: 2 bootstraps batched into one 2B blind-rotation chain +
    # pre-keyswitch combine + ONE keyswitch (reference operator.cuh:688-812)
    sel = tfhe.encrypt(ctx, sk, R.integers(0, 2, batch), rng.new_key())
    gmux = jax.jit(lambda s, a, b: tfhe.MUX(ctx, key, s, a, b))
    dt = timed_chain(lambda s, a, b: (gmux(s, a, b), a, b), (sel, c1, c2),
                     reps)
    print(f"  MUX   {dt*1e3:8.1f} ms  ({dt/batch*1e6:8.1f} us/gate amortized)")

    jadd = jax.jit(tfhe_int.add)
    for w in widths:
        xs = R.integers(0, 1 << min(w, 62), 1, dtype=np.int64)
        ys = R.integers(0, 1 << min(w, 62), 1, dtype=np.int64)
        hx = tfhe_int.encrypt_huint(ctx, sk, xs, w, rng.new_key())
        hy = tfhe_int.encrypt_huint(ctx, sk, ys, w, rng.new_key())

        def stepw(a, b):
            s, _ = jadd(ctx, key, a, b)
            return s, b

        def syncw(h):
            np.asarray(jax.device_get(h.bits.b[:4]))

        h = stepw(stepw(hx, hy)[0], hy)[0]   # warm both jit signatures
        syncw(h)
        t0 = time.perf_counter()
        syncw(stepw(hx, hy)[0])
        t1 = time.perf_counter()
        h = hx
        for _ in range(3):
            h = stepw(h, hy)[0]
        syncw(h)
        t2 = time.perf_counter()
        dt = ((t2 - t1) - (t1 - t0)) / 2
        print(f"  huint{w:<3d} add {dt*1e3:8.1f} ms  "
              f"({tfhe_int.bootstrap_rounds(w)} batched blind-rotation rounds)")

    # huint mux / signed abs: the integer circuits built on the 2-bootstrap
    # MUX (reference huint MUX table, README.md:66)
    w = widths[0]
    xs = R.integers(0, 1 << min(w, 62), 1, dtype=np.int64)
    ys = R.integers(0, 1 << min(w, 62), 1, dtype=np.int64)
    hx = tfhe_int.encrypt_huint(ctx, sk, xs, w, rng.new_key())
    hy = tfhe_int.encrypt_huint(ctx, sk, ys, w, rng.new_key())
    sel1 = tfhe.encrypt(ctx, sk, np.array([1]), rng.new_key())
    jmux = jax.jit(tfhe_int.mux)
    jabs = jax.jit(tfhe_int.abs_)

    def timed_hchain(step, seed, reps=2):
        h = step(step(seed))
        np.asarray(jax.device_get(h.bits.b[:4]))
        t0 = time.perf_counter()
        np.asarray(jax.device_get(step(seed).bits.b[:4]))
        t1 = time.perf_counter()
        h = seed
        for _ in range(1 + reps):
            h = step(h)
        np.asarray(jax.device_get(h.bits.b[:4]))
        t2 = time.perf_counter()
        return ((t2 - t1) - (t1 - t0)) / reps

    dt = timed_hchain(lambda h: jmux(ctx, key, sel1, h, hy), hx)
    print(f"  huint{w:<3d} mux {dt*1e3:8.1f} ms")
    hs = tfhe_int.encrypt_hint(ctx, sk, -xs, w, rng.new_key())
    dt = timed_hchain(lambda h: jabs(ctx, key, h), hs)
    print(f"  hint{w:<4d} abs {dt*1e3:8.1f} ms")


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
