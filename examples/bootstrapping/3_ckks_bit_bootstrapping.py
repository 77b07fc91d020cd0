"""CKKS bit bootstrapping: refresh {0,1} payloads encoded at scale q0/2
(ePrint 2024/767).  Mirrors example/bootstrapping/3_ckks_bit_bootstrapping.cpp."""

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
    variant="bit")

q0 = int(ctx.q_primes[0])
bits = np.random.default_rng(0).integers(0, 2, N // 2)
ct = ckks.encrypt(ctx, pk, ckks.encode(ctx, bits.astype(float), scale=q0 / 2),
                  rng.new_key())
ct = ckks.mod_drop(ctx, ct, keys.stoc_pieces[0].level)
fresh = ckks_boot_ext.bit_bootstrap(ctx, ct, keys)
got = ckks.decode(ctx, ckks.decrypt(ctx, sk, fresh)).real
err = np.max(np.abs(got - bits))
print(f"bit bootstrap: max error {err:.4f} over {N//2} bits "
      f"(output at {ctx.active(fresh.level)} limbs)")
assert err < 0.2
