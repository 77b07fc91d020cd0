"""Device memory pool observability + configuration pointers.
Mirrors reference example/basic/3_basic_memorypool_config.cpp — in the TPU
framework XLA's allocator plays RMM's role; pool sizing is configured via
XLA_PYTHON_CLIENT_MEM_FRACTION / XLA_PYTHON_CLIENT_PREALLOCATE before
process start, and live statistics come from utils.memory."""

import os as _os, sys as _sys
_sys.path.insert(0, _os.path.abspath(_os.path.join(_os.path.dirname(__file__), '..', '..')))

import numpy as np
import jax.numpy as jnp

from heongpu_tpu.utils import memory

print("before allocation:")
memory.print_memory_pool_status()

big = jnp.zeros((64, 1 << 20), jnp.uint32)  # 256 MB
big.block_until_ready()

print("after a 256 MB allocation:")
memory.print_memory_pool_status()
used = memory.get_current_device_pool_memory_usage()
print("current usage:", None if used is None else f"{used/2**20:.1f} MiB")
del big
