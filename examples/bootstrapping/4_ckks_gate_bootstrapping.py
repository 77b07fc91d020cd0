"""CKKS gate bootstrapping: AND/OR/XOR/... with built-in refresh on q0/3-scaled
bits (ePrint 2024/767).  Mirrors example/bootstrapping/4_ckks_gate_bootstrapping.cpp."""

import os as _os, sys as _sys
_sys.path.insert(0, _os.path.abspath(_os.path.join(_os.path.dirname(__file__), '..', '..')))

import numpy as np

from heongpu_tpu.models import ckks, ckks_boot_ext
from heongpu_tpu.utils import rng

N, DEPTH = 256, 19
ctx = ckks.make_context(N, [29] + [28] * (DEPTH - 1), scale_bits=28,
                        sec_level="none")
sk = ckks.keygen_secret(ctx, rng.new_key(), hamming_weight=16)
pk = ckks.keygen_public(ctx, rng.new_key(), sk)
keys = ckks_boot_ext.generate_bootstrap_keys_v2(
    ctx, rng.new_key(), sk,
    ckks_boot_ext.BootConfigV2(cos_degree=24, double_angles=5, K=12),
    variant="gate")

q0 = int(ctx.q_primes[0])
R = np.random.default_rng(0)
b1 = R.integers(0, 2, N // 2)
b2 = R.integers(0, 2, N // 2)
enc = lambda b: ckks.mod_drop(
    ctx, ckks.encrypt(ctx, pk, ckks.encode(ctx, b.astype(float), scale=q0 / 3),
                      rng.new_key()), keys.stoc_pieces[0].level)
c1, c2 = enc(b1), enc(b2)

for gate, fn in [("AND", np.logical_and), ("OR", np.logical_or),
                 ("XOR", np.logical_xor)]:
    out = ckks_boot_ext.gate_bootstrap(ctx, c1, c2, gate, keys)
    got = ckks.decode(ctx, ckks.decrypt(ctx, sk, out)).real
    want = fn(b1 > 0, b2 > 0).astype(float)
    err = np.max(np.abs(got - want))
    print(f"{gate}: amortized over {N//2} slots, max error {err:.4f}")
    assert err < 0.2
