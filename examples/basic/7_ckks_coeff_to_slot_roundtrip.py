"""Homomorphic CoeffToSlot -> SlotToCoeff roundtrip.
Mirrors reference example/basic/7_ckks_coeff_to_slot_roundtrip.cpp."""

import os as _os, sys as _sys
_sys.path.insert(0, _os.path.abspath(_os.path.join(_os.path.dirname(__file__), '..', '..')))

import numpy as np

from heongpu_tpu.models import ckks, ckks_boot
from heongpu_tpu.utils import rng

N, DEPTH = 256, 19
ctx = ckks.make_context(N, [29] + [28] * (DEPTH - 1), scale_bits=28,
                        sec_level="none")
sk = ckks.keygen_secret(ctx, rng.new_key(), hamming_weight=16)
pk = ckks.keygen_public(ctx, rng.new_key(), sk)
keys = ckks_boot.generate_bootstrap_keys(
    ctx, rng.new_key(), sk, ckks_boot.BootConfig(taylor_degree=7,
                                                 exp_squarings=4))

z = np.random.default_rng(0).uniform(-0.5, 0.5, N // 2)
ct = ckks.encrypt(ctx, pk, ckks.encode(ctx, z), rng.new_key())
t0, t1 = ckks_boot.coeff_to_slot(ctx, ct, keys)
back = ckks_boot.slot_to_coeff(ctx, t0, t1, keys)
got = ckks.decode(ctx, ckks.decrypt(ctx, sk, back))
c = 2 / (1 << keys.cfg.exp_squarings) * (-0.5j)  # folded constants compose
assert np.allclose(got, z * c, atol=2e-2)
print("CtoS/StoC roundtrip ok (folded constant", c, ")")
