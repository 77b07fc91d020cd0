"""CKKS object serialization roundtrip.
Mirrors reference example/basic/14_ckks_serialization.cpp."""

import os as _os, sys as _sys
_sys.path.insert(0, _os.path.abspath(_os.path.join(_os.path.dirname(__file__), '..', '..')))

import numpy as np

from heongpu_tpu.models import ckks
from heongpu_tpu.utils import rng, serializer

ctx = ckks.make_context(2048, [29, 28, 28], scale_bits=28, sec_level="none")
sk = ckks.keygen_secret(ctx, rng.new_key())
pk = ckks.keygen_public(ctx, rng.new_key(), sk)
rk = ckks.keygen_relin(ctx, rng.new_key(), sk)
z = np.linspace(-1, 1, ctx.n // 2)
ct = ckks.encrypt(ctx, pk, ckks.encode(ctx, z), rng.new_key())

for name, obj in [("secret key", sk), ("public key", pk),
                  ("relin key", rk), ("ciphertext", ct)]:
    blob = serializer.serialize(obj)
    obj2 = serializer.deserialize(blob)
    print(f"{name}: {len(blob)} bytes")

ct2 = serializer.deserialize(serializer.serialize(ct))
got = ckks.decode(ctx, ckks.decrypt(ctx, sk, ct2))
assert np.allclose(got.real, z, atol=1e-3)
print("ckks serialization roundtrip ok")
