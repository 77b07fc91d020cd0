"""ctypes bridge to the native C++ parameter engine (native/paramgen.cpp).

The shared library is built on demand with the system g++ into
heongpu_tpu/native/_build/ and cached by source mtime; every entry point has
a pure-Python fallback in utils/nt.py, so the framework works without a
toolchain (`available()` reports which path is active).
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

_DIR = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                    "native")
_SRC = os.path.join(_DIR, "paramgen.cpp")
_BUILD = os.path.join(_DIR, "_build")
_SO = os.path.join(_BUILD, "libparamgen.so")

_lock = threading.Lock()
_lib = None
_tried = False


def _build() -> bool:
    os.makedirs(_BUILD, exist_ok=True)
    cmd = ["g++", "-O2", "-shared", "-fPIC", "-o", _SO, _SRC]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=120)
        return True
    except Exception:
        return False


def _load():
    global _lib, _tried
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        try:
            fresh = (os.path.exists(_SO)
                     and os.path.getmtime(_SO) >= os.path.getmtime(_SRC))
            if not fresh and not _build():
                return None
            lib = ctypes.CDLL(_SO)
        except Exception:
            return None
        u64, u32 = ctypes.c_uint64, ctypes.c_uint32
        p64 = np.ctypeslib.ndpointer(np.uint64, flags="C_CONTIGUOUS")
        p32 = np.ctypeslib.ndpointer(np.uint32, flags="C_CONTIGUOUS")
        lib.pg_is_prime.argtypes = [u64]
        lib.pg_is_prime.restype = ctypes.c_int
        lib.pg_generate_ntt_primes.argtypes = [u32, u32, u64, p64, u32, p64]
        lib.pg_generate_ntt_primes.restype = ctypes.c_int
        lib.pg_minimal_primitive_root_2n.argtypes = [u64, u64]
        lib.pg_minimal_primitive_root_2n.restype = u64
        lib.pg_pow_series.argtypes = [u64, u64, u64, p32]
        lib.pg_pow_series.restype = None
        lib.pg_shoup.argtypes = [p32, u64, u64, p32]
        lib.pg_shoup.restype = None
        lib.pg_psi_tables.argtypes = [u64, u64, u64, p32, p32, p32, p32]
        lib.pg_psi_tables.restype = None
        _lib = lib
        return _lib


def available() -> bool:
    return _load() is not None


def is_prime(n: int):
    lib = _load()
    if lib is None or n >= (1 << 63):
        return None
    return bool(lib.pg_is_prime(n))


def generate_ntt_primes(bit_size: int, count: int, n: int, exclude=None):
    lib = _load()
    if lib is None:
        return None
    ex = np.asarray(sorted(exclude) if exclude else [], np.uint64)
    out = np.zeros(count, np.uint64)
    got = lib.pg_generate_ntt_primes(bit_size, count, n, ex, len(ex), out)
    if got < count:
        raise ValueError(
            f"not enough {bit_size}-bit NTT primes for n={n} (found {got}/{count})")
    return [int(v) for v in out]


def minimal_primitive_root_2n(n2: int, p: int):
    lib = _load()
    if lib is None:
        return None
    return int(lib.pg_minimal_primitive_root_2n(n2, p))


def pow_series(base: int, n: int, p: int):
    lib = _load()
    if lib is None:
        return None
    out = np.empty(n, np.uint32)
    lib.pg_pow_series(base % p, n, p, out)
    return out


def psi_tables(psi: int, n: int, p: int):
    """(psi_pows, psi_sh, ipsi_n, ipsi_n_sh) uint32 arrays, or None."""
    lib = _load()
    if lib is None:
        return None
    a = np.empty(n, np.uint32)
    b = np.empty(n, np.uint32)
    c = np.empty(n, np.uint32)
    d = np.empty(n, np.uint32)
    lib.pg_psi_tables(psi, n, p, a, b, c, d)
    return a, b, c, d
