"""Host/device residency management — the TPU analog of the reference's
ExecutionOptions + input/output storage managers (util/storagemanager.cuh:
ExecutionOptions{stream_, storage_, keep_initial_condition_},
input_storage_manager / output_storage_manager; behavior table
README.md:320-366).

JAX arrays already carry their placement, so the manager reduces to
declarative movement of whole pytrees (ciphertexts, keys, contexts):

    opts = ExecutionOptions(storage="device")
    ct = to_storage(ct, opts)            # move before an op
    big_keys = to_host(galois_keys)      # spill cold keys to host RAM

The reference's "stream" member maps to JAX's implicit async dispatch queue
(see examples/basic/8..10); `device`/`sharding` selects placement on a mesh.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Optional

import jax
import numpy as np


HOST = "host"
DEVICE = "device"


@dataclasses.dataclass(frozen=True)
class ExecutionOptions:
    """Reference ExecutionOptions analog: where results should live and
    whether inputs should be restored to their original residency."""
    storage: str = DEVICE                 # HOST | DEVICE
    keep_initial_condition: bool = True   # restore inputs' residency after use
    device: Optional[Any] = None          # target jax.Device or Sharding


def _is_array(x):
    return isinstance(x, (jax.Array, np.ndarray))


def to_host(tree: Any) -> Any:
    """Move every array of a pytree to host RAM (np.ndarray leaves)."""
    return jax.tree_util.tree_map(
        lambda x: np.asarray(x) if isinstance(x, jax.Array) else x, tree)


def to_device(tree: Any, device=None) -> Any:
    """Move every array leaf onto the device (or Sharding) given."""
    def place(x):
        if _is_array(x):
            return jax.device_put(x, device) if device is not None \
                else jax.device_put(x)
        return x
    return jax.tree_util.tree_map(place, tree)


def to_storage(tree: Any, opts: ExecutionOptions) -> Any:
    return to_host(tree) if opts.storage == HOST else to_device(tree, opts.device)


def storage_of(tree: Any) -> str:
    """HOST if every array leaf is a numpy array, DEVICE otherwise."""
    leaves = [x for x in jax.tree_util.tree_leaves(tree) if _is_array(x)]
    return HOST if all(isinstance(x, np.ndarray) for x in leaves) else DEVICE


def run_with_storage(fn, inputs, opts: ExecutionOptions = ExecutionOptions()):
    """input/output_storage_manager analog: move inputs to device, run, place
    the output per `opts`.  JAX arrays are immutable, so the caller's
    originals keep their residency automatically — the reference's
    keep_initial_condition=True behavior is inherent (False-style in-place
    conversion has no analog; drop your host copy instead)."""
    if not opts.keep_initial_condition:
        raise ValueError(
            "keep_initial_condition=False has no JAX analog: arrays are "
            "immutable, so inputs are never converted in place.  Drop your "
            "host copy after the call instead.")
    dev_inputs = [to_device(t, opts.device) for t in inputs]
    out = fn(*dev_inputs)
    return to_storage(out, opts)
