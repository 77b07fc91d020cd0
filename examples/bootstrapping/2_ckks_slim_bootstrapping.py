"""CKKS slim bootstrapping (StoC-first ordering, slot payload).
Mirrors reference example/bootstrapping/2_ckks_slim_bootstrapping.cpp."""

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
msg_scale = 2.0 ** 22      # must sit well below q0 (see slim docstring)
keys = ckks_boot_ext.generate_bootstrap_keys_v2(
    ctx, rng.new_key(), sk,
    ckks_boot_ext.BootConfigV2(cos_degree=24, double_angles=5, K=12),
    variant="slim", msg_scale=msg_scale)

z = np.random.default_rng(0).uniform(-0.5, 0.5, N // 2)
ct = ckks.encrypt(ctx, pk, ckks.encode(ctx, z, scale=msg_scale), rng.new_key())
ct = ckks.mod_drop(ctx, ct, keys.stoc_pieces[0].level)

fresh = ckks_boot_ext.slim_bootstrap(ctx, ct, keys)
print(f"refreshed to {ctx.active(fresh.level)} active limbs")
got = ckks.decode(ctx, ckks.decrypt(ctx, sk, fresh))
print(precision.precision_stats(z, got.real))
