"""Basic BGV: encode -> encrypt -> add/multiply(+relin)/mod-switch/rotate ->
decrypt.  BGV is marked 'Very Soon' in the reference (README.md:24); this
framework ships it (models/bgv.py: lsb-noise keys + t-exact divisions)."""

import os as _os, sys as _sys
_sys.path.insert(0, _os.path.abspath(_os.path.join(_os.path.dirname(__file__), '..', '..')))

import numpy as np

from heongpu_tpu.models import bgv
from heongpu_tpu.utils import params, rng

N = 4096
t = params.plain_modulus_for(N, 20)
ctx = bgv.make_context(N, t, q_bits=[29, 29, 29, 29], sec_level="none")
bgv.print_parameters(ctx)

sk = bgv.keygen_secret(ctx, rng.new_key())
pk = bgv.keygen_public(ctx, rng.new_key(), sk)
rk = bgv.keygen_relin(ctx, rng.new_key(), sk)
gk = bgv.keygen_galois(ctx, rng.new_key(), sk)

msg1 = np.arange(N, dtype=np.uint64) % 7
msg2 = np.arange(N, dtype=np.uint64) % 5
c1 = bgv.encrypt(ctx, pk, bgv.encode(ctx, msg1), rng.new_key())
c2 = bgv.encrypt(ctx, pk, bgv.encode(ctx, msg2), rng.new_key())

c_add = bgv.add(ctx, c1, c2)
c_mul = bgv.mod_switch(ctx, bgv.relinearize(ctx, bgv.multiply(ctx, c1, c2), rk))
c_rot = bgv.rotate_rows(ctx, c1, gk, 3)

got = bgv.decode(ctx, bgv.decrypt(ctx, sk, c_mul))
assert (got == (msg1 * msg2) % ctx.t).all()
print("mult+relin+modswitch exact:", True)
print("noise budget after multiply:", bgv.noise_budget(ctx, sk, c_mul), "bits")
