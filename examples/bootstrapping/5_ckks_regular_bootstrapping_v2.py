"""CKKS regular bootstrapping v2 (Chebyshev-cosine EvalMod, log-depth).
Mirrors reference example/bootstrapping/5_ckks_regular_bootstrapping_v2.cpp
(ePrint 2020/1203 style eval_mod)."""

import os as _os, sys as _sys
_sys.path.insert(0, _os.path.abspath(_os.path.join(_os.path.dirname(__file__), '..', '..')))

import numpy as np

from heongpu_tpu.models import ckks, ckks_boot_ext
from heongpu_tpu.utils import precision, rng

N, DEPTH = 256, 19
ctx = ckks.make_context(N, [29] + [28] * (DEPTH - 1), scale_bits=28,
                        sec_level="none")
sk = ckks.keygen_secret(ctx, rng.new_key(), hamming_weight=16)
pk = ckks.keygen_public(ctx, rng.new_key(), sk)
keys = ckks_boot_ext.generate_bootstrap_keys_v2(
    ctx, rng.new_key(), sk,
    ckks_boot_ext.BootConfigV2(cos_degree=24, double_angles=5, K=12),
    variant="regular")

z = np.random.default_rng(0).uniform(-0.5, 0.5, N // 2)
ct = ckks.encrypt(ctx, pk, ckks.encode(ctx, z), rng.new_key())
ct = ckks.mod_drop(ctx, ct, ctx.k - 1)
fresh = ckks_boot_ext.regular_bootstrap_v2(ctx, ct, keys)
print(f"v2 bootstrap: {ctx.active(fresh.level)} active limbs left")
got = ckks.decode(ctx, ckks.decrypt(ctx, sk, fresh))
print(precision.precision_stats(z, got.real))
