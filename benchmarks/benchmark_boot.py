"""Large-N CKKS bootstrapping latency on the real TPU chip.

Mirrors the reference's headline bootstrapping benchmarks
(/root/reference/README.md:97-123: regular < 170 ms at N=2^16 on an RTX
4090; slim/bit/gate tables).  The whole pipeline is one jitted program with
the key bundle passed as a pytree argument; XLA's persistent compilation
cache amortizes the (large) first compile across runs.

Usage:
  python benchmarks/benchmark_boot.py [--n 65536] [--variant regular]
         [--depth 20] [--reps 3]
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.abspath(os.path.join(os.path.dirname(__file__), "..")))

import jax
import jax.numpy as jnp
import numpy as np

CACHE = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                     ".jax_cache")
jax.config.update("jax_compilation_cache_dir", CACHE)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from heongpu_tpu.models import ckks, ckks_boot, ckks_boot_ext  # noqa: E402
from heongpu_tpu.utils import rng  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=65536)
    ap.add_argument("--depth", type=int, default=20)
    ap.add_argument("--variant", default="regular",
                    choices=["regular", "slim", "bit", "gate"])
    ap.add_argument("--pieces", type=int, default=3)
    ap.add_argument("--stoc-pieces", type=int, default=None, dest="stoc_pieces",
                    help="StoC piece count (default: same as --pieces); "
                    "ctos=3/stoc=2 balances table HBM vs chain depth at "
                    "N=2^16")
    ap.add_argument("--taylor", type=int, default=7)
    ap.add_argument("--squarings", type=int, default=4)
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--hw", type=int, default=64)
    ap.add_argument("--alpha", type=int, default=4)
    ap.add_argument("--p-count", type=int, default=None, dest="p_count")
    ap.add_argument("--base-count", type=int, default=1, dest="base_count",
                    help="primes in the boot base Q0 (2 = composite-q0 "
                    "precision mode)")
    ap.add_argument("--arcsin", type=int, default=0,
                    help="arcsine correction order (composite-q0 precision)")
    ap.add_argument("--piece-depth", type=int, default=1, dest="piece_depth",
                    help="levels per CtoS/StoC piece (=base_count for the "
                    "composite-scale precision mode)")
    ap.add_argument("--compress-keys", action="store_true",
                    dest="compress_keys",
                    help="seed-expanded Galois/relin keys (k1 regenerated "
                    "on device per use; halves key-set HBM)")
    ap.add_argument("--inv-keys", action="store_true", dest="inv_keys",
                    help="inverse-form Galois keys: hoisted rotations MAC "
                    "unpermuted digits and permute only the 2-poly result "
                    "((d̃+1)->2 gather polys per rotation)")
    ap.add_argument("--debug", action="store_true",
                    help="decrypt between phases (regular only)")
    ap.add_argument("--phased", action="store_true",
                    help="jit CtoS / EvalMod / StoC as separate programs "
                    "(much faster first compile; prints per-phase ms)")
    ap.add_argument("--cpu", action="store_true",
                    help="run on CPU (config validation at small N)")
    ap.add_argument("--roofline", action="store_true",
                    help="print per-phase XLA flops/bytes vs the measured "
                    "phase latency (phased regular only)")
    args = ap.parse_args()
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    N, DEPTH = args.n, args.depth
    t0 = time.time()
    ctx = ckks.make_context(
        N, [29] * args.base_count + [28] * (DEPTH - args.base_count),
        scale_bits=28, sec_level="none", ks_type="II", alpha=args.alpha,
        p_count=args.p_count)
    print(f"context: {time.time()-t0:.1f} s "
          f"(N={N}, {DEPTH} limbs, METHOD_II alpha={args.alpha})", flush=True)

    t0 = time.time()
    # sparse secret: the regular Taylor EvalMod needs a small mod-raise
    # overflow bound ||I|| (reference uses sparse keys / sparse-secret
    # switching for bootstrapping; dense keys blow the sin(x) interval)
    sk = ckks.keygen_secret(ctx, rng.new_key(61), hamming_weight=args.hw)
    pk = ckks.keygen_public(ctx, rng.new_key(62), sk)
    print(f"sk/pk: {time.time()-t0:.1f} s", flush=True)

    t0 = time.time()
    from heongpu_tpu.utils import serializer
    cache_dir = os.path.join(os.path.dirname(CACHE), ".bootcache")
    os.makedirs(cache_dir, exist_ok=True)
    # context fingerprint: cached keys are RNS arrays whose limb ROWS are
    # bound to the context's prime ORDER — a context change (e.g. the
    # round-4 complementary scale-prime pairing reordered q_primes) must
    # invalidate the cache, or stale keys silently decrypt garbage
    import hashlib
    fp = hashlib.md5(repr((tuple(int(q) for q in ctx.q_primes),
                           tuple(int(p) for p in ctx.p_primes),
                           float(ctx.default_scale))).encode()).hexdigest()[:8]
    tag = (f"{args.variant}_n{N}_d{DEPTH}_c{fp}_p{args.pieces}"
           + (f"x{args.stoc_pieces}" if args.stoc_pieces else "")
           + f"_t{args.taylor}"
           f"_s{args.squarings}_hw{args.hw}_a{args.alpha}"
           f"_pc{args.p_count}_bc{args.base_count}"
           + (f"_as{args.arcsin}" if args.arcsin else "")
           + (f"_pd{args.piece_depth}" if args.piece_depth > 1 else "")
           + ("_ck" if args.compress_keys else "")
           + ("_ik" if args.inv_keys else ""))
    cache_file = os.path.join(cache_dir, tag + ".bin")
    if args.variant == "regular":
        entry = ckks_boot.regular_bootstrap
        drop_to = ctx.k - args.base_count
    elif args.variant == "slim":
        entry = ckks_boot_ext.slim_bootstrap
    if os.path.exists(cache_file):
        keys = serializer.load_from_file(cache_file)
        print(f"boot keys loaded from cache: {time.time()-t0:.1f} s",
              flush=True)
    else:
        if args.variant == "regular":
            cfg = ckks_boot.BootConfig(taylor_degree=args.taylor,
                                       exp_squarings=args.squarings,
                                       ctos_pieces=args.pieces,
                                       stoc_pieces=args.stoc_pieces or args.pieces,
                                       base_count=args.base_count,
                                       arcsin_order=args.arcsin,
                                       piece_depth=args.piece_depth)
            keys = ckks_boot.generate_bootstrap_keys(
                ctx, rng.new_key(63), sk, cfg,
                compress_keys=args.compress_keys, inv_form=args.inv_keys)
        else:
            cfg = ckks_boot_ext.BootConfigV2(cos_degree=24, double_angles=5,
                                             K=12, ctos_pieces=args.pieces,
                                             stoc_pieces=args.pieces)
            keys = ckks_boot_ext.generate_bootstrap_keys_v2(
                ctx, rng.new_key(63), sk, cfg, variant=args.variant,
                msg_scale=2.0 ** 22 if args.variant == "slim" else None,
                compress_keys=args.compress_keys, inv_form=args.inv_keys)
        print(f"boot keys: {time.time()-t0:.1f} s", flush=True)
        t0 = time.time()
        serializer.save_to_file(keys, cache_file, level=1)
        print(f"boot keys cached: {time.time()-t0:.1f} s", flush=True)
    nbytes = sum(x.nbytes for x in jax.tree_util.tree_leaves(keys)
                 if hasattr(x, "nbytes"))
    print(f"boot key set resident: {nbytes / 2**30:.2f} GiB"
          + (" (seed-expanded)" if args.compress_keys else ""), flush=True)

    if args.variant != "regular":
        drop_to = keys.stoc_pieces[0].level

    rnd = np.random.default_rng(0)
    if args.variant in ("bit", "gate"):
        # bit/gate payloads: slots hold bits at the ePrint 2024/767 scales
        z = rnd.integers(0, 2, N // 2).astype(np.float64)
        b2 = rnd.integers(0, 2, N // 2).astype(np.float64)
        ct = ckks.encrypt(ctx, pk, ckks.encode(ctx, z, scale=keys.msg_scale),
                          rng.new_key(64))
        ct = ckks.mod_drop(ctx, ct, drop_to)
        if args.variant == "bit":
            entry = ckks_boot_ext.bit_bootstrap
        else:
            ct2 = ckks.encrypt(ctx, pk,
                               ckks.encode(ctx, b2, scale=keys.msg_scale),
                               rng.new_key(65))
            ct2 = ckks.mod_drop(ctx, ct2, drop_to)
            entry = lambda c, c1, k: ckks_boot_ext.gate_bootstrap(
                c, c1, ct2, "AND", k)
            z = np.logical_and(z.astype(bool), b2.astype(bool)).astype(float)
    else:
        z = rnd.uniform(-0.5, 0.5, N // 2)
        # regular with base_count>1 carries the composite scale (2^56-ish)
        # through the whole pipeline; slim uses its own reduced msg scale
        ct = ckks.encrypt(ctx, pk, ckks.encode(ctx, z, scale=keys.msg_scale),
                          rng.new_key(64))
        ct = ckks.mod_drop(ctx, ct, drop_to)

    if args.debug and args.variant == "regular":
        import math
        q0 = 1
        for qj in ctx.q_primes[:args.base_count]:
            q0 *= int(qj)
        raised = ckks_boot.mod_raise(ctx, ct, args.base_count)
        pt = ckks.decrypt(ctx, sk, raised)
        coeffs = ckks.decode_coeff(
            ctx, ckks.Plaintext(pt.m, pt.level, 1.0))
        print(f"[dbg] mod_raise: |I|max ~ {np.max(np.abs(coeffs))/q0:.2f} q0",
              flush=True)
        t0v, t1v = jax.jit(ckks_boot.coeff_to_slot)(ctx, raised, keys)
        g0 = ckks.decode(ctx, ckks.decrypt(ctx, sk, t0v))
        # expected: theta0 of the low coeffs = c_in * coeff (incl. q0*I)
        cfgv = keys.cfg
        c_in = 2 * math.pi * keys.msg_scale / ((1 << cfgv.exp_squarings) * q0)
        want0 = c_in * coeffs[: ctx.n // 2] / keys.msg_scale
        print(f"[dbg] CtoS t0: max|got-want| = "
              f"{np.max(np.abs(g0.real - want0)):.3e}, "
              f"|theta0|max = {np.max(np.abs(want0)):.3f}", flush=True)
        s0v = jax.jit(ckks_boot.eval_exp_sin)(ctx, t0v, keys)
        gs = ckks.decode(ctx, ckks.decrypt(ctx, sk, s0v))
        want_s = 2j * np.sin((1 << cfgv.exp_squarings) * want0)
        print(f"[dbg] exp_sin: max|got-want| = "
              f"{np.max(np.abs(gs - want_s)):.3e}", flush=True)

    # --- trusted timing helpers (see heongpu memory: the tunnel acks
    # enqueue; only host readback syncs, and reps must be serialized by a
    # data dependency) ---
    zdep = jax.jit(lambda c_, d_: c_ + (jnp.ravel(d_)[0] & jnp.uint32(0)))

    def _dep_of(o):
        return o[0].c if isinstance(o, tuple) else o.c

    def _zdep_warm(src_c):
        np.asarray(jax.device_get(jnp.ravel(zdep(src_c, src_c))[:1]))

    def _chain_time(dispatch, src_c, reps):
        t0_ = time.time()
        out_ = dispatch(src_c)
        for _ in range(reps - 1):
            out_ = dispatch(zdep(src_c, _dep_of(out_)))
        np.asarray(jax.device_get(jnp.ravel(_dep_of(out_))[:8]))
        return time.time() - t0_, out_

    if args.phased and args.variant == "regular":
        # piece-level programs: XLA compile time is superlinear in program
        # size and the tunnel's compile helper drops oversized requests
        # ("response body closed" at the 3-piece N=2^16 CtoS monolith), so
        # every matvec piece / EvalMod / glue step compiles separately; the
        # inter-program HBM round-trip is noise at these latencies
        f_raise = jax.jit(lambda c_: ckks_boot.mod_raise(
            ctx, c_, args.base_count))

        def _piece_fn(kind, i):
            def g(c_, k_):
                pieces = k_.ctos_pieces if kind == "c" else k_.stoc_pieces
                return ckks_boot.matvec_piece(ctx, c_, pieces[i], k_.gk)
            return jax.jit(g)

        f_cp = [_piece_fn("c", i) for i in range(len(keys.ctos_pieces))]
        f_sp = [_piece_fn("s", i) for i in range(len(keys.stoc_pieces))]
        f_cfin = jax.jit(lambda w_, k_: ckks_boot.ctos_finish(ctx, w_, k_))
        f_mod = jax.jit(lambda t_, k_: ckks_boot.eval_exp_sin(ctx, t_, k_))
        f_sent = jax.jit(lambda s0_, s1_, k_: ckks_boot.stoc_entry(
            ctx, s0_, s1_, k_))
        phase_ms = {}

        def f_ctos(c_, k_):
            w = f_raise(c_)
            for g in f_cp:
                w = g(w, k_)
            return f_cfin(w, k_)

        def f_stoc(s0_, s1_, k_):
            m = f_sent(s0_, s1_, k_)
            for g in f_sp:
                m = g(m, k_)
            return m

        def f(_ctx, c_, k_):
            t0_, t1_ = f_ctos(c_, k_)
            s0_ = f_mod(t0_, k_)
            s1_ = f_mod(t1_, k_)
            return f_stoc(s0_, s1_, k_)

        t0 = time.time()
        t0v_, t1v_ = jax.block_until_ready(f_ctos(ct, keys))
        print(f"phase CtoS compile+run: {time.time()-t0:.1f} s "
              f"({len(f_cp)} piece programs)", flush=True)
        t0 = time.time()
        s0v_ = jax.block_until_ready(f_mod(t0v_, keys))
        s1v_ = f_mod(t1v_, keys)
        print(f"phase EvalMod compile+run: {time.time()-t0:.1f} s", flush=True)
        t0 = time.time()
        out = f_stoc(s0v_, s1v_, keys)
        jax.block_until_ready(out.c)
        print(f"phase StoC compile+run: {time.time()-t0:.1f} s", flush=True)
        # Per-phase steady-state latencies, chained-DELTA protocol.  The
        # tunnel acks enqueue (not completion) and a single-shot readback
        # carries per-program dispatch overhead that inflates small-N phases
        # (round 4's N=2^13 phase sum exceeded the end-to-end total 5.7x
        # with the old null-baseline protocol).  Here k runs are serialized
        # by a data-dependent zero and the reported time is
        # (T(3 runs) - T(1 run)) / 2: constant dispatch + RTT cancels.
        for name, dispatch, src in (
                ("ctos", lambda c_: f_ctos(
                    ckks.Ciphertext(c_, ct.size, ct.level, ct.scale), keys),
                 ct.c),
                ("evalmod", lambda c_: f_mod(
                    ckks.Ciphertext(c_, t0v_.size, t0v_.level, t0v_.scale),
                    keys), t0v_.c),
                ("stoc", lambda c_: f_stoc(
                    ckks.Ciphertext(c_, s0v_.size, s0v_.level, s0v_.scale),
                    s1v_, keys), s0v_.c)):
            _zdep_warm(src)
            t1, _ = _chain_time(dispatch, src, 1)
            t3, _ = _chain_time(dispatch, src, 3)
            phase_ms[name] = round(1e3 * (t3 - t1) / 2, 1)
        print(f"phase latencies (ms, chained delta): {phase_ms}", flush=True)

        if args.roofline:
            # XLA cost model per phase (reference counterpart: the cudaEvent
            # tables in benchmark/benchmark_ckks.cpp): flops/bytes summed
            # over each phase's compiled programs, rated by the measured
            # chained-delta phase latency
            def _cost(jfn, *a):
                ca = jfn.lower(*a).compile().cost_analysis()
                ca = ca[0] if isinstance(ca, (list, tuple)) else ca
                return (float(ca.get("flops", 0.0)),
                        float(ca.get("bytes accessed", 0.0)))

            costs = {"ctos": [_cost(f_raise, ct)],
                     "evalmod": [_cost(f_mod, t0v_, keys)],
                     "stoc": [_cost(f_sent, s0v_, s1v_, keys)]}
            w_ = f_raise(ct)
            for g in f_cp:
                costs["ctos"].append(_cost(g, w_, keys))
                w_ = g(w_, keys)
            costs["ctos"].append(_cost(f_cfin, w_, keys))
            m_ = f_sent(s0v_, s1v_, keys)
            for g in f_sp:
                costs["stoc"].append(_cost(g, m_, keys))
                m_ = g(m_, keys)
            for name in ("ctos", "evalmod", "stoc"):
                fl = sum(c[0] for c in costs[name])
                by = sum(c[1] for c in costs[name])
                dt = phase_ms[name] / 1e3
                print(json.dumps({
                    "metric": f"roofline_{args.variant}_n{N}_{name}",
                    "xla_gflops": round(fl / 1e9, 2),
                    "hbm_gbytes": round(by / 2**30, 2),
                    "achieved_gflops_s": round(fl / dt / 1e9, 1),
                    "achieved_gbytes_s": round(by / dt / 2**30, 1),
                    "arith_intensity": round(fl / max(by, 1), 3),
                }), flush=True)
    else:
        f = jax.jit(entry)
        t0 = time.time()
        out = f(ctx, ct, keys)
        jax.block_until_ready(out.c)
        print(f"first call (compile+run): {time.time()-t0:.1f} s", flush=True)

    # end-to-end latency: single-shot reps (includes ~30-50 ms tunnel RTT)
    # plus the chained-delta number, which is the headline
    times = []
    for _ in range(args.reps):
        t0 = time.time()
        o_ = f(ctx, ct, keys)
        np.asarray(jax.device_get(o_.c[0, 0, :8]))   # trusted sync
        times.append(time.time() - t0)
    _zdep_warm(ct.c)
    t1, _ = _chain_time(lambda c_: f(
        ctx, ckks.Ciphertext(c_, ct.size, ct.level, ct.scale), keys), ct.c, 1)
    t3, out = _chain_time(lambda c_: f(
        ctx, ckks.Ciphertext(c_, ct.size, ct.level, ct.scale), keys), ct.c, 3)
    lat_ms = 1e3 * (t3 - t1) / 2

    got = ckks.decode(ctx, ckks.decrypt(ctx, sk, out))
    errs = np.abs(got.real - z)
    err = float(errs.max())
    print(f"err percentiles: p50={np.percentile(errs,50):.2e} "
          f"p99={np.percentile(errs,99):.2e} p99.9={np.percentile(errs,99.9):.2e} "
          f"max={err:.2e} bad_slots(>10*p99)={int((errs > 10*np.percentile(errs,99)).sum())}",
          flush=True)
    slots = N // 2
    result = {
        "metric": f"ckks_n{N}_{args.variant}_bootstrap_ms",
        "value": round(lat_ms, 2),
        "unit": "ms",
        "amortized_us_per_slot": round(lat_ms * 1e3 / slots, 3),
        "max_err": err,
        "levels_left": ctx.active(out.level),
        "times_ms": [round(1e3 * t, 1) for t in times],
    }
    if args.phased and args.variant == "regular":
        result["phase_ms"] = phase_ms
    print(json.dumps(result), flush=True)


if __name__ == "__main__":
    main()
