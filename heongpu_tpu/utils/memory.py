"""Device memory observability — the TPU analog of the reference's
MemoryPool status API (util/memorypool.cuh:88-93: print_memory_pool_status,
get_current_device_pool_memory_usage, get_free_device_pool_memory).

JAX owns the device allocator (XLA's BFC pool plays RMM's role), so unlike
the reference there is nothing to configure at runtime — the knobs are the
standard XLA env vars, surfaced here for discoverability:

  XLA_PYTHON_CLIENT_MEM_FRACTION=0.9   (reference initial_device_memorypool_size)
  XLA_PYTHON_CLIENT_PREALLOCATE=true   (pool preallocation on/off)

This module provides the observability half with live statistics.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax


@dataclasses.dataclass(frozen=True)
class MemoryPoolStatus:
    device: str
    bytes_in_use: Optional[int]
    peak_bytes_in_use: Optional[int]
    bytes_limit: Optional[int]
    num_allocs: Optional[int]

    @property
    def free_bytes(self) -> Optional[int]:
        if self.bytes_limit is None or self.bytes_in_use is None:
            return None
        return self.bytes_limit - self.bytes_in_use

    def __str__(self):
        gb = lambda b: f"{b / 2**30:.3f} GiB" if b is not None else "n/a"
        return (f"[{self.device}] in_use={gb(self.bytes_in_use)} "
                f"peak={gb(self.peak_bytes_in_use)} "
                f"limit={gb(self.bytes_limit)} free={gb(self.free_bytes)}")


def device_pool_status(device=None) -> MemoryPoolStatus:
    """Live allocator statistics for one device (reference
    get_current_device_pool_memory_usage analog)."""
    dev = device or jax.devices()[0]
    try:
        s = dev.memory_stats() or {}
    except Exception:
        s = {}
    return MemoryPoolStatus(
        device=str(dev),
        bytes_in_use=s.get("bytes_in_use"),
        peak_bytes_in_use=s.get("peak_bytes_in_use"),
        bytes_limit=s.get("bytes_limit"),
        num_allocs=s.get("num_allocs"),
    )


def print_memory_pool_status():
    """Reference print_memory_pool_status analog, all devices."""
    for d in jax.devices():
        print(device_pool_status(d))


def get_free_device_pool_memory(device=None) -> Optional[int]:
    return device_pool_status(device).free_bytes


def get_current_device_pool_memory_usage(device=None) -> Optional[int]:
    return device_pool_status(device).bytes_in_use
