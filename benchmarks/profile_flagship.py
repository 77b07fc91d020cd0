"""Sub-op timing breakdown of the flagship chain (CKKS N=2^16 mult+relin).

Times each phase as its own fori_loop chain on the device, so per-op
dispatch is excluded, exactly like bench.py.  Prints one JSON line per row.
"""

import os as _os, sys as _sys
_sys.path.insert(0, _os.path.abspath(
    _os.path.join(_os.path.dirname(__file__), '..')))

import json
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp


def timeit(fn, *args, reps=3, K=10):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / (reps * K) * 1e3


def main():
    from heongpu_tpu.utils.cache import enable_compile_cache
    enable_compile_cache()
    from heongpu_tpu.models import ckks
    from heongpu_tpu.ops import ntt as nttm
    from heongpu_tpu.utils import rng

    n = 4096 if "--small" in sys.argv else 65536
    nq = 4 if "--small" in sys.argv else 12
    ctx = ckks.make_context(n, [29] * nq, sec_level="none", ks_type="II",
                            alpha=4)
    sk = ckks.keygen_secret(ctx, rng.new_key(1))
    pk = ckks.keygen_public(ctx, rng.new_key(2), sk)
    rk = ckks.keygen_relin(ctx, rng.new_key(3), sk)
    z = np.linspace(-1.0, 1.0, ctx.n // 2)
    ct1 = ckks.encrypt(ctx, pk, ckks.encode(ctx, z), rng.new_key(4))
    ct2 = ckks.encrypt(ctx, pk, ckks.encode(ctx, z[::-1].copy()),
                       rng.new_key(5))
    K = 10

    def loop(body):
        @jax.jit
        def run(c1, c2, k0, k1):
            return jax.lax.fori_loop(0, K, lambda i, c: body(c, c2, k0, k1),
                                     c1)
        return run

    def mk(c):
        return ckks.Ciphertext(c, 2, 0, ctx.default_scale)

    full = loop(lambda c, c2, k0, k1: ckks.relinearize(
        ctx, ckks.multiply(ctx, mk(c), ckks.Ciphertext(c2, 2, 0,
                                                       ctx.default_scale)),
        ckks.KSKey(k0, k1)).c)
    mult_only = loop(lambda c, c2, k0, k1: ckks.multiply(
        ctx, mk(c), ckks.Ciphertext(c2, 2, 0, ctx.default_scale)).c[:2])

    tb = ctx.ntt_q(0)
    x = ct1.c[0]

    @jax.jit
    def ntt_chain(x0):
        def body(i, x):
            y = nttm.ntt_fwd(x, tb)
            return nttm.ntt_inv(y, tb)
        return jax.lax.fori_loop(0, K, body, x0)

    rows = {
        "full_mult_relin_ms": timeit(full, ct1.c, ct2.c, rk.k0, rk.k1),
        "mult_only_ms": timeit(mult_only, ct1.c, ct2.c, rk.k0, rk.k1),
        "ntt_fwd_inv_pair_ms": timeit(lambda: ntt_chain(x)),
    }
    rows["relin_only_ms"] = rows["full_mult_relin_ms"] - rows["mult_only_ms"]
    print(json.dumps({"metric": "flagship_profile", "n": n, "limbs": nq,
                      **{k: round(v, 4) for k, v in rows.items()}}))


if __name__ == "__main__":
    main()
