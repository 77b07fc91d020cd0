"""North-star benchmark: CKKS N=2^16 ct-ct multiply + relinearize ops/s/chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Measured as a chain of ops inside one jitted program (lax.fori_loop), the way
production pipelines compose — per-call Python pytree-flattening overhead is
excluded, device execution is what's timed.

Baseline note: HEonGPU publishes no direct mult+relin ops/s table; its
benchmark binaries print local timings.  We anchor vs_baseline to an
RTX-4090-class estimate of 500 ops/s (2 ms per N=2^16 multiply+relinearize,
consistent with the reference's published bootstrapping throughput in
README.md:97-123, where one slim bootstrap ≈ dozens of such ops in ~100 ms).
"""

import json
import sys
import time

import numpy as np

BASELINE_OPS_S = 500.0


def main():
    small = "--small" in sys.argv
    import jax
    from heongpu_tpu.utils.cache import enable_compile_cache
    enable_compile_cache()
    from heongpu_tpu.models import ckks
    from heongpu_tpu.utils import rng

    n = 4096 if small else 65536
    nq = 4 if small else 12
    q_bits = [29] * nq

    alpha = 4
    for a in sys.argv:
        if a.startswith("--alpha="):
            alpha = int(a.split("=")[1])
    ctx = ckks.make_context(n, q_bits, sec_level="none", ks_type="II",
                            alpha=alpha)
    sk = ckks.keygen_secret(ctx, rng.new_key(1))
    pk = ckks.keygen_public(ctx, rng.new_key(2), sk)
    rk = ckks.keygen_relin(ctx, rng.new_key(3), sk)
    half = ctx.n // 2
    z = np.linspace(-1.0, 1.0, half)
    ct1 = ckks.encrypt(ctx, pk, ckks.encode(ctx, z), rng.new_key(4))
    ct2 = ckks.encrypt(ctx, pk, ckks.encode(ctx, z[::-1].copy()), rng.new_key(5))

    K = 4 if small else 10

    @jax.jit
    def chain(c1, c2, k0, k1):
        def body(i, c):
            a = ckks.Ciphertext(c, 2, 0, ctx.default_scale)
            b = ckks.Ciphertext(c2, 2, 0, ctx.default_scale)
            return ckks.relinearize(ctx, ckks.multiply(ctx, a, b),
                                    ckks.KSKey(k0, k1)).c
        return jax.lax.fori_loop(0, K, body, c1)

    # warmup/compile
    out = chain(ct1.c, ct2.c, rk.k0, rk.k1)
    out.block_until_ready()

    # Timing protocol: the tunnel's block_until_ready can return before
    # device execution finishes (measured: a 10-pass 327 MB chain "timed"
    # at an impossible 118 TB/s), so (a) each rep feeds its output back as
    # the next input — reps serialize on the device by data dependency —
    # and (b) the only trusted sync is a host readback of a few lanes.
    # The fixed costs (dispatch, readback RTT ~30 ms) cancel in the delta
    # between a short and a long run of the same compiled chain.
    def run(reps):
        out = ct1.c
        for _ in range(reps):
            out = chain(out, ct2.c, rk.k0, rk.k1)
        np.asarray(jax.device_get(out[0, 0, :8]))

    r1, r2 = (1, 3) if small else (2, 10)
    run(r1)  # second warmup incl. the readback path
    t0 = time.perf_counter()
    run(r1)
    t_short = time.perf_counter() - t0
    t0 = time.perf_counter()
    run(r2)
    t_long = time.perf_counter() - t0
    dt = (t_long - t_short) / ((r2 - r1) * K)
    ops_s = 1.0 / dt

    if "--roofline" in sys.argv:
        # XLA's own cost model for the compiled chain: achieved int-op and
        # HBM-byte rates vs peak say which wall we are on (VPU vs bandwidth)
        comp = chain.lower(ct1.c, ct2.c, rk.k0, rk.k1).compile()
        ca = comp.cost_analysis()
        ca = ca[0] if isinstance(ca, (list, tuple)) else ca
        flops = float(ca.get("flops", 0.0)) / K
        byt = float(ca.get("bytes accessed", 0.0)) / K
        print(json.dumps({
            "metric": "roofline_per_op", "xla_flops": flops,
            "hbm_bytes": byt,
            "achieved_gflops": round(flops * ops_s / 1e9, 2),
            "achieved_gbps": round(byt * ops_s / 1e9, 2),
            "arith_intensity_flops_per_byte": round(flops / max(byt, 1), 3),
        }))

    print(json.dumps({
        "metric": f"ckks_n{n}_mult_relin_ops_per_s_per_chip",
        "value": round(ops_s, 3),
        "unit": "ops/s",
        "vs_baseline": round(ops_s / BASELINE_OPS_S, 4),
    }))


if __name__ == "__main__":
    main()
