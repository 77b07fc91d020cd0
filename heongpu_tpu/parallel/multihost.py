"""Multi-host (DCN) layer: process initialization, global meshes, and the
cross-host collectives used by MPC share aggregation.

The reference is strictly single-process/single-GPU; MPC traffic is
"serialize and ship out of band" (SURVEY §2.6/§3.6).  The TPU-native
framework adds two first-class transports:

  * jax.distributed global meshes — every host contributes its local chips,
    shardings span hosts, and XLA places intra-host collectives on ICI and
    cross-host ones on DCN (the scaling-book recipe at multi-host scale).
  * the serializer path — byte-exact share exchange over any medium
    (files/sockets), matching the reference's protocol examples
    (example/mpc/1_multiparty_computation_bfv.cpp), demonstrated across
    OS processes in examples/mpc/5_multihost_share_exchange.py.
"""

from __future__ import annotations

import os
from typing import Optional, Sequence

import numpy as np
import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def init_process(coordinator: str, process_id: int, num_processes: int,
                 local_device_count: Optional[int] = None) -> None:
    """Join the multi-process runtime (idempotent).  For CPU testing set
    XLA_FLAGS=--xla_force_host_platform_device_count=<k> per process before
    importing jax; on real pods the TPU runtime supplies local devices."""
    if local_device_count is not None:
        flags = os.environ.get("XLA_FLAGS", "")
        want = f"--xla_force_host_platform_device_count={local_device_count}"
        if want not in flags:
            os.environ["XLA_FLAGS"] = (flags + " " + want).strip()
    jax.distributed.initialize(coordinator_address=coordinator,
                               num_processes=num_processes,
                               process_id=process_id)


def global_mesh(limb_shards: Optional[int] = None) -> Mesh:
    """('dp', 'limb') mesh over ALL processes' devices, laid out so the limb
    axis stays within a host where possible (limb traffic rides ICI; the dp
    axis spans hosts and only sees DCN at batch boundaries)."""
    devs = sorted(jax.devices(), key=lambda d: (d.process_index, d.id))
    n = len(devs)
    per_host = len([d for d in devs if d.process_index == devs[0].process_index])
    if limb_shards is None:
        limb_shards = per_host
    while n % limb_shards:
        limb_shards //= 2
    dp = n // limb_shards
    return Mesh(np.array(devs).reshape(dp, limb_shards), ("dp", "limb"))


def party_mesh() -> Mesh:
    """One mesh axis across all devices: axis 'party' for N-out-of-N share
    aggregation (each party's share lives on its own devices; the sum is one
    psum over DCN)."""
    devs = sorted(jax.devices(), key=lambda d: (d.process_index, d.id))
    return Mesh(np.array(devs), ("party",))


def allreduce_shares(local_share, mesh: Mesh):
    """Sum per-party shares across the 'party' mesh axis (uint32 modular sums
    must be taken by the caller afterwards — this is the raw Σ over DCN).

    local_share: (parties_on_axis, ...) array sharded along 'party'."""
    from jax import shard_map

    spec = P("party", *([None] * (local_share.ndim - 1)))

    @jax.jit
    def _sum(x):
        def body(s):
            return jax.lax.psum(s, "party")
        return shard_map(body, mesh=mesh, in_specs=spec,
                         out_specs=spec)(x)

    return _sum(local_share)


def weak_scaling_efficiency(op, make_args, sizes: Sequence[int],
                            mesh_builder=None, reps: int = 3) -> dict:
    """Measure weak-scaling efficiency of `op` over growing meshes:
    per-device work is constant (make_args(n_devices) scales the batch), so
    efficiency_n = t_1 / t_n.  Returns {n: (seconds, efficiency)}."""
    import time

    out = {}
    t1 = None
    for n in sizes:
        mesh = mesh_builder(n) if mesh_builder else None
        args = make_args(n, mesh)
        f = jax.jit(op)
        r = f(*args)
        jax.block_until_ready(r)
        best = min(_timed(f, args) for _ in range(reps))
        if t1 is None:
            t1 = best
        out[n] = (best, t1 / best)
    return out


def _timed(f, args):
    import time
    t0 = time.time()
    jax.block_until_ready(f(*args))
    return time.time() - t0
