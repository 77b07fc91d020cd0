"""CKKS regular bootstrapping (Taylor-exp EvalMod) with precision report.
Mirrors reference example/bootstrapping/1_ckks_regular_bootstrapping.cpp."""

import os as _os, sys as _sys
_sys.path.insert(0, _os.path.abspath(_os.path.join(_os.path.dirname(__file__), '..', '..')))

import numpy as np

from heongpu_tpu.models import ckks, ckks_boot
from heongpu_tpu.utils import precision, rng

N, DEPTH = 256, 19
ctx = ckks.make_context(N, [29] + [28] * (DEPTH - 1), scale_bits=28,
                        sec_level="none")
sk = ckks.keygen_secret(ctx, rng.new_key(), hamming_weight=16)
pk = ckks.keygen_public(ctx, rng.new_key(), sk)
keys = ckks_boot.generate_bootstrap_keys(
    ctx, rng.new_key(), sk,
    ckks_boot.BootConfig(taylor_degree=7, exp_squarings=4))

z = np.random.default_rng(0).uniform(-0.5, 0.5, N // 2)
ct = ckks.encrypt(ctx, pk, ckks.encode(ctx, z), rng.new_key())
ct = ckks.mod_drop(ctx, ct, ctx.k - 1)          # exhaust the chain
print("before bootstrap: 1 active limb")

fresh = ckks_boot.regular_bootstrap(ctx, ct, keys)
print(f"after bootstrap: {ctx.active(fresh.level)} active limbs")

got = ckks.decode(ctx, ckks.decrypt(ctx, sk, fresh))
print(precision.precision_stats(z, got.real))
