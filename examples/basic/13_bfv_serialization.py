"""BFV object serialization: keys and ciphertexts to zlib-compressed bytes /
files and back.  Mirrors reference example/basic/13_bfv_serialization.cpp."""

import os as _os, sys as _sys
_sys.path.insert(0, _os.path.abspath(_os.path.join(_os.path.dirname(__file__), '..', '..')))

import os
import tempfile

import numpy as np

from heongpu_tpu.models import bfv
from heongpu_tpu.utils import params, rng, serializer

N = 2048
ctx = bfv.make_context(N, params.plain_modulus_for(N, 17),
                       q_bits=[29, 29, 29], sec_level="none")
sk = bfv.keygen_secret(ctx, rng.new_key())
pk = bfv.keygen_public(ctx, rng.new_key(), sk)
m = np.arange(N, dtype=np.uint64) % 13
ct = bfv.encrypt(ctx, pk, bfv.encode(ctx, m), rng.new_key())

blob_ct = serializer.serialize(ct)
blob_pk = serializer.serialize(pk)
raw = ct.c.size * 4
print(f"ciphertext: {raw} raw bytes -> {len(blob_ct)} compressed "
      f"({100 * (1 - len(blob_ct)/raw):.0f}% smaller)")

ct2 = serializer.deserialize(blob_ct)
assert np.array_equal(bfv.decode(ctx, bfv.decrypt(ctx, sk, ct2)), m)

with tempfile.TemporaryDirectory() as d:
    path = os.path.join(d, "ct.bin")
    serializer.save_to_file(ct, path)
    ct3 = serializer.load_from_file(path)
    assert np.array_equal(bfv.decode(ctx, bfv.decrypt(ctx, sk, ct3)), m)
print("bfv serialization roundtrip ok")
