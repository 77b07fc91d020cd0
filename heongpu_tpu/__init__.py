"""heongpu_tpu — a TPU-native FHE framework (BFV / CKKS / TFHE over RNS rings).

Built from scratch in JAX/XLA/Pallas with the capabilities of the CUDA
reference library HEonGPU (see SURVEY.md for the structural map).  Device
arithmetic is uint32 RNS (primes < 2**30); contexts are JAX pytrees of
precomputed tables; every scheme operation is a jittable pure function with
thin object-oriented wrappers mirroring the reference API.
"""

__version__ = "0.1.0"

from .utils import nt  # noqa: F401
from .ops import modmath, ntt  # noqa: F401
