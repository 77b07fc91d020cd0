"""Device-mesh sharding layer for FHE workloads.

The reference is single-GPU (SURVEY §2.6: no NCCL/MPI anywhere); this layer
is the TPU-native scale-out story with no reference counterpart.  The natural
FHE sharding axes on a TPU mesh are:

  * ``limb``  — RNS limbs (the tensor-parallel analog): NTTs and pointwise
    ops are fully independent per limb; base conversion / keyswitch MACs
    contract over the limb axis, which GSPMD turns into ICI collectives.
  * ``dp``    — ciphertext batch (data parallel): embarrassingly parallel.

We annotate shardings with NamedSharding under jit and let XLA/GSPMD insert
the collectives (all-gather on the digit axis at the keyswitch contraction,
nothing elsewhere) — the scaling-book recipe: pick a mesh, annotate, let the
compiler place the collectives on ICI.
"""

from __future__ import annotations

from typing import Optional

import numpy as np
import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices: Optional[int] = None, limb_shards: Optional[int] = None,
              devices=None) -> Mesh:
    """Mesh with axes ('dp', 'limb').  limb_shards defaults to n_devices."""
    if devices is None:
        devices = jax.devices()[: n_devices or len(jax.devices())]
    n = len(devices)
    if limb_shards is None:
        limb_shards = n
    dp = n // limb_shards
    assert dp * limb_shards == n, "n_devices must factor into dp*limb"
    dev = np.array(devices).reshape(dp, limb_shards)
    return Mesh(dev, ("dp", "limb"))


def ct_sharding(mesh: Mesh, batched: bool = False) -> NamedSharding:
    """Ciphertext (size, L, N) — shard the limb axis; batched adds a dp axis."""
    if batched:
        return NamedSharding(mesh, P("dp", None, "limb", None))
    return NamedSharding(mesh, P(None, "limb", None))


def key_sharding(mesh: Mesh) -> NamedSharding:
    """Keyswitch keys (d, L, N): shard the output-limb axis; the digit axis d
    stays local so the MAC contraction reduces over it without resharding."""
    return NamedSharding(mesh, P(None, "limb", None))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_array_limb_axis(x, mesh: Mesh, limb_axis: int = -2):
    """Place one array: shard limb_axis if its length divides the mesh 'limb'
    size, else replicate.  A bootstrap chain moves through levels whose limb
    counts don't all divide the mesh (e.g. the last level has 1 limb) — those
    stay replicated rather than failing placement."""
    nl = mesh.shape["limb"]
    if hasattr(x, "ndim") and x.ndim >= 2 and x.shape[limb_axis] % nl == 0:
        spec = [None] * x.ndim
        spec[limb_axis % x.ndim] = "limb"
        return jax.device_put(x, NamedSharding(mesh, P(*spec)))
    return jax.device_put(x, replicated(mesh))


def shard_pytree_limb_axis(tree, mesh: Mesh, limb_axis: int = -2):
    """Best-effort placement: arrays whose limb_axis length is divisible by the
    mesh 'limb' size get sharded there; everything else is replicated."""
    return jax.tree_util.tree_map(
        lambda x: shard_array_limb_axis(x, mesh, limb_axis), tree)
