import numpy as np, jax, time
from heongpu_tpu.models import tfhe
from heongpu_tpu.utils import rng
ctx = tfhe.make_context()
sk = tfhe.keygen_secret(rng.new_key(1))
bk = tfhe.keygen_boot(ctx, rng.new_key(2), sk)
R = np.random.default_rng(0)
b1 = R.integers(0, 2, 64); b2 = R.integers(0, 2, 64)
c1 = tfhe.encrypt(ctx, sk, b1, rng.new_key(3))
c2 = tfhe.encrypt(ctx, sk, b2, rng.new_key(4))
g = jax.jit(lambda a, b: tfhe.NAND(ctx, bk, a, b))
o = g(c1, c2); jax.block_until_ready(o.b)
t0 = time.perf_counter()
for _ in range(5): o = g(c1, c2)
jax.block_until_ready(o.b)
dt = (time.perf_counter() - t0) / 5
got = np.asarray(tfhe.decrypt(ctx, sk, o))
want = 1 - (b1 & b2)
print("NAND ok:", bool((got == want).all()), f"batch64 {dt*1e3:.1f} ms, {dt/64*1e6:.0f} us/gate")
