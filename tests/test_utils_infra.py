"""Infra utilities: storage manager, memory stats, profiling timer
(reference ExecutionOptions / MemoryPool-status / cudaEvent analogs)."""

import numpy as np
import jax.numpy as jnp

from heongpu_tpu.utils import memory, profiling, storage


def test_storage_roundtrip():
    tree = {"a": jnp.arange(8, dtype=jnp.uint32), "meta": 7,
            "b": [jnp.zeros((2, 2))]}
    h = storage.to_host(tree)
    assert storage.storage_of(h) == storage.HOST
    assert isinstance(h["a"], np.ndarray)
    d = storage.to_device(h)
    assert storage.storage_of(d) == storage.DEVICE
    out = storage.run_with_storage(
        lambda t: {"c": t["a"] + 1}, [h],
        storage.ExecutionOptions(storage=storage.HOST))
    assert isinstance(out["c"], np.ndarray)
    np.testing.assert_array_equal(out["c"], np.arange(8) + 1)


def test_memory_status_api():
    st = memory.device_pool_status()
    assert "in_use" in str(st)
    memory.print_memory_pool_status()
    # getters may be None on backends without stats; type contract only
    memory.get_free_device_pool_memory()
    memory.get_current_device_pool_memory_usage()


def test_profiling_timer():
    f = lambda x: x * 2
    dt = profiling.time_op(f, jnp.ones((4,)), iters=3)
    assert dt >= 0.0
