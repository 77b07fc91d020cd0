"""Batched-throughput variant of the flagship chain: vmap over independent
ciphertext pairs.  If the serial chain is latency-bound (low VPU + low HBM
utilisation), throughput should scale near-linearly with batch — the
per-chip ops/s a production server would see."""

import os as _os, sys as _sys
_sys.path.insert(0, _os.path.abspath(
    _os.path.join(_os.path.dirname(__file__), '..')))

import json
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp


def main():
    from heongpu_tpu.utils.cache import enable_compile_cache
    enable_compile_cache()
    from heongpu_tpu.models import ckks
    from heongpu_tpu.utils import rng

    small = "--small" in sys.argv
    n = 4096 if small else 65536
    nq = 4 if small else 12
    ctx = ckks.make_context(n, [29] * nq, sec_level="none", ks_type="II",
                            alpha=4)
    sk = ckks.keygen_secret(ctx, rng.new_key(1))
    pk = ckks.keygen_public(ctx, rng.new_key(2), sk)
    rk = ckks.keygen_relin(ctx, rng.new_key(3), sk)
    z = np.linspace(-1.0, 1.0, ctx.n // 2)
    ct1 = ckks.encrypt(ctx, pk, ckks.encode(ctx, z), rng.new_key(4))
    ct2 = ckks.encrypt(ctx, pk, ckks.encode(ctx, z[::-1].copy()),
                       rng.new_key(5))
    K = 4 if small else 10

    def step(c, c2, k0, k1):
        a = ckks.Ciphertext(c, 2, 0, ctx.default_scale)
        b = ckks.Ciphertext(c2, 2, 0, ctx.default_scale)
        return ckks.relinearize(ctx, ckks.multiply(ctx, a, b),
                                ckks.KSKey(k0, k1)).c

    for B in (1, 2, 4, 8):
        vstep = jax.vmap(step, in_axes=(0, 0, None, None))

        @jax.jit
        def chain(c1, c2, k0, k1):
            return jax.lax.fori_loop(
                0, K, lambda i, c: vstep(c, c2, k0, k1), c1)

        c1b = jnp.broadcast_to(ct1.c[None], (B,) + ct1.c.shape)
        c2b = jnp.broadcast_to(ct2.c[None], (B,) + ct2.c.shape)
        out = chain(c1b, c2b, rk.k0, rk.k1)
        jax.block_until_ready(out)
        reps = 2 if small else 4
        t0 = time.perf_counter()
        for _ in range(reps):
            out = chain(c1b, c2b, rk.k0, rk.k1)
        jax.block_until_ready(out)
        dt = (time.perf_counter() - t0) / (reps * K)
        print(json.dumps({
            "metric": "ckks_mult_relin_batched", "n": n, "batch": B,
            "ms_per_step": round(dt * 1e3, 4),
            "ops_per_s": round(B / dt, 1),
        }))


if __name__ == "__main__":
    main()
