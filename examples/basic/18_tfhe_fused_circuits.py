"""TFHE circuits compiled end-to-end with a FusedKey.

tfhe.compile_key() pre-expands the bootstrapping key into the fused Pallas
chain's HBM stream and packs the kernel tables; the resulting FusedKey is a
pytree, so WHOLE circuits jit with the key as an argument — one XLA program
per circuit, no per-gate dispatch.  (Reference analog: HEonGPU executes one
CUDA kernel chain per gate, src/lib/host/tfhe/operator.cu:200-294; here the
whole adder is one compiled program.)

Run on TPU for compiled Pallas; on CPU this uses the (slow) interpreter.
"""

import time

import numpy as np
import jax

from heongpu_tpu.models import tfhe, tfhe_int
from heongpu_tpu.utils import rng


def main():
    ctx = tfhe.make_context()
    sk = tfhe.keygen_secret(rng.new_key(1))
    bk = tfhe.keygen_boot(ctx, rng.new_key(2), sk)
    fk = tfhe.compile_key(ctx, bk, tile=16)   # tile=8 for tiny batches

    # a jitted one-bit full adder: (s, c_out) from (a, b, c_in)
    @jax.jit
    def full_adder(a, b, cin):
        s1 = tfhe.XOR(ctx, fk, a, b)
        c1 = tfhe.AND(ctx, fk, a, b)
        s = tfhe.XOR(ctx, fk, s1, cin)
        c2 = tfhe.AND(ctx, fk, s1, cin)
        return s, tfhe.OR(ctx, fk, c1, c2)

    bits = lambda v: np.array(v, np.int32)
    a = tfhe.encrypt(ctx, sk, bits([0, 0, 1, 1]), rng.new_key(3))
    b = tfhe.encrypt(ctx, sk, bits([0, 1, 0, 1]), rng.new_key(4))
    cin = tfhe.encrypt(ctx, sk, bits([1, 1, 1, 1]), rng.new_key(5))
    s, cout = full_adder(a, b, cin)
    print("sum  :", tfhe.decrypt(ctx, sk, s).astype(int))    # a^b^cin
    print("carry:", tfhe.decrypt(ctx, sk, cout).astype(int))

    # whole 16-bit adders as ONE compiled program
    jadd = jax.jit(tfhe_int.add)
    x, y = 51234, 29876
    hx = tfhe_int.encrypt_huint(ctx, sk, [x], 16, rng.new_key(6))
    hy = tfhe_int.encrypt_huint(ctx, sk, [y], 16, rng.new_key(7))
    hs, _ = jadd(ctx, fk, hx, hy)
    jax.block_until_ready(hs.bits.b)
    t0 = time.perf_counter()
    hs, _ = jadd(ctx, fk, hx, hy)
    jax.block_until_ready(hs.bits.b)
    print(f"huint16 add: {int(tfhe_int.decrypt_huint(ctx, sk, hs)[0])} "
          f"(expect {(x + y) % (1 << 16)}) in "
          f"{(time.perf_counter() - t0) * 1e3:.1f} ms")


if __name__ == "__main__":
    main()
