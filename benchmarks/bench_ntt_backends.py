"""Isolated NTT backend A/B on the current device: stages vs pallas vs MXU.

Times a fori_loop chain of fwd+inv pairs at the flagship shape so per-call
dispatch is excluded.  Prints one JSON line per backend."""

import os as _os, sys as _sys
_sys.path.insert(0, _os.path.abspath(
    _os.path.join(_os.path.dirname(__file__), '..')))

import json
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

from heongpu_tpu.ops import ntt as nttm
from heongpu_tpu.utils import nt


def main():
    small = "--small" in sys.argv
    n = 4096 if small else 65536
    L = 4 if small else 12
    rows = 2
    K = 8
    primes = nt.generate_ntt_primes(29, L, n)
    R = np.random.default_rng(0)
    x = np.stack([np.stack([R.integers(0, p, size=n, dtype=np.uint32)
                            for p in primes]) for _ in range(rows)])
    xj = jnp.asarray(x)

    tb_plain = nttm.build_ntt_tables(primes, n)
    tb_mxu = nttm.build_ntt_tables(primes, n, use_mxu=True)

    def run(tb, backend, name):
        if backend:
            nttm.set_backend(backend)

        @jax.jit
        def chain(x0):
            def body(i, x):
                return nttm.ntt_inv(nttm.ntt_fwd(x, tb), tb)
            return jax.lax.fori_loop(0, K, body, x0)

        out = chain(xj)
        jax.block_until_ready(out)
        np.testing.assert_array_equal(np.asarray(out), x)  # exactness
        t0 = time.perf_counter()
        for _ in range(5):
            out = chain(xj)
        jax.block_until_ready(out)
        dt = (time.perf_counter() - t0) / (5 * K)
        print(json.dumps({"metric": "ntt_fwd_inv_pair_ms", "backend": name,
                          "n": n, "limbs": L, "rows": rows,
                          "ms": round(dt * 1e3, 4)}))

    run(tb_plain, "stages", "stages")
    run(tb_plain, "pallas", "pallas")
    run(tb_mxu, None, "mxu")


if __name__ == "__main__":
    main()
