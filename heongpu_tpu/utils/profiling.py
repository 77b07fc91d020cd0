"""Profiling helpers — the reference benchmarks with raw cudaEvent timing
(benchmark/benchmark_ckks.cpp:81-120); on TPU the equivalents are the JAX
profiler (trace files viewable in TensorBoard/Perfetto) and simple
block-until-ready wall timers.
"""

from __future__ import annotations

import contextlib
import time

import jax


@contextlib.contextmanager
def trace(logdir: str):
    """Capture a device trace: with profiling.trace('/tmp/trace'): run()."""
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def time_op(fn, *args, iters: int = 10, warmup: int = 1) -> float:
    """Median-free simple timer: mean seconds per call, device-synchronized
    (the cudaEventElapsedTime analog)."""
    o = None
    for _ in range(max(warmup, 1)):
        o = fn(*args)
    jax.block_until_ready(o)
    t0 = time.perf_counter()
    for _ in range(iters):
        o = fn(*args)
    jax.block_until_ready(o)
    return (time.perf_counter() - t0) / iters


def device_memory_profile(path: str):
    """Dump an allocator snapshot (pprof format)."""
    jax.profiler.save_device_memory_profile(path)
