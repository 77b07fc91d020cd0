"""t-out-of-N threshold decryption: a dealer splits the secret key into 5
Shamir shares; any 3 parties jointly decrypt, fewer cannot.

The reference marks t-out-of-N as future work (example/mpc/README.md:72) —
this framework ships it: Shamir sharing works per RNS limb over Z_q and the
NTT/Montgomery maps are linear, so shares live in the key's stored domain."""

import os as _os, sys as _sys
_sys.path.insert(0, _os.path.abspath(_os.path.join(_os.path.dirname(__file__), '..', '..')))

import numpy as np

from heongpu_tpu.models import bfv, mpc
from heongpu_tpu.utils import rng, params

t = params.plain_modulus_for(4096, 20)
ctx = bfv.make_context(4096, t, q_bits=[29, 29, 29], sec_level="none")
sk = bfv.keygen_secret(ctx, rng.new_key())
pk = bfv.keygen_public(ctx, rng.new_key(), sk)

# dealer: split sk into 5 shares with threshold 3, then DISCARD sk
shares = mpc.shamir_share_secret(ctx, rng.new_key(), sk,
                                 n_parties=5, threshold=3)

m = np.arange(ctx.n) % t
ct = bfv.encrypt(ctx, pk, bfv.encode(ctx, m), rng.new_key())

# parties 2, 4, 5 come online and decrypt together
group = (2, 4, 5)
partials = [mpc.bfv_decrypt_partial_threshold(ctx, shares[i - 1], ct,
                                              group, rng.new_key())
            for i in group]
got = bfv.decode(ctx, mpc.bfv_decrypt_fuse(ctx, ct, partials))
assert (np.asarray(got) == m).all()
print("3-of-5 threshold decryption ok (parties 2, 4, 5)")

# two parties alone are rejected
try:
    mpc.bfv_decrypt_partial_threshold(ctx, shares[0], ct, (1, 2),
                                      rng.new_key())
except AssertionError as e:
    print("2-of-5 correctly rejected:", e)
