"""Persistent XLA compilation cache helper.

Large-N programs (bootstrapping pipelines, deep keyswitch chains) take
minutes to compile on the TPU; XLA's persistent cache amortizes that across
process runs.  Call enable_compile_cache() once before the first jit
execution (benchmarks and examples do this; library users opt in).
"""

from __future__ import annotations

import os


def enable_compile_cache(path: str | None = None,
                         min_compile_secs: float = 1.0) -> str:
    """Point JAX's persistent compilation cache at `path` (default:
    .jax_cache next to the repo root, or $HEONGPU_CACHE).  Returns the path."""
    import jax

    if path is None:
        path = os.environ.get(
            "HEONGPU_CACHE",
            os.path.join(os.path.dirname(os.path.dirname(
                os.path.dirname(os.path.abspath(__file__)))), ".jax_cache"))
    os.makedirs(path, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", path)
    jax.config.update("jax_persistent_cache_min_compile_time_secs",
                      min_compile_secs)
    return path
