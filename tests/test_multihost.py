"""Multi-host layer: two-process jax.distributed mesh over DCN (CPU
transport) and cross-process MPC share exchange via the serializer.

These spawn real OS subprocesses — the single-host stand-in for the
multi-host deployment shape (SURVEY §2.6 distributed backend rows)."""

import os
import socket
import subprocess
import sys
import tempfile

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

pytestmark = pytest.mark.slow


def _free_port():
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def test_two_process_dcn_dryrun():
    script = os.path.join(REPO, "examples", "parallel",
                          "3_multihost_dcn_dryrun.py")
    coord = f"127.0.0.1:{_free_port()}"
    env = dict(os.environ)
    procs = [subprocess.Popen([sys.executable, script, str(i), "2", coord],
                              stdout=subprocess.PIPE,
                              stderr=subprocess.STDOUT, env=env, text=True)
             for i in range(2)]
    outs = [p.communicate(timeout=900)[0] for p in procs]
    for i, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"process {i} failed:\n{out[-3000:]}"
        assert "MULTIHOST_DRYRUN_OK" in out
        assert "DCN share all-reduce ok" in out


def test_cross_process_share_exchange():
    """3 party processes + coordinator, byte-exchange through files;
    small-N inline version of examples/mpc/5_multihost_share_exchange.py."""
    workdir = tempfile.mkdtemp(prefix="mpc_x_")
    code = r'''
import sys, os
sys.path.insert(0, %r)
import jax; jax.config.update("jax_platforms", "cpu")
import numpy as np
from heongpu_tpu.models import bfv, mpc, ringkit
from heongpu_tpu.utils import params, rng, serializer

N = 256
SEED = 4242
t = params.plain_modulus_for(N, 20)
ctx = bfv.make_context(N, t, q_bits=[29, 29, 29], sec_level="none")
ring = bfv._ring(ctx)
role, i, wd = sys.argv[1], int(sys.argv[2]), sys.argv[3]
if role == "party":
    sk = ringkit.keygen_secret(ring, rng.new_key(700 + i))
    serializer.save_to_file(sk, f"{wd}/sk_{i}.bin")
    a = mpc.crs_uniform(ring, SEED, (ctx.n,))
    serializer.save_to_file(mpc.pk_share(ring, sk, a, rng.new_key(710 + i)),
                            f"{wd}/pk_{i}.bin")
else:
    sk = serializer.load_from_file(f"{wd}/sk_{i}.bin")
    ct = serializer.load_from_file(f"{wd}/ct.bin")
    serializer.save_to_file(
        mpc.bfv_decrypt_partial(ctx, sk, ct, rng.new_key(720 + i)),
        f"{wd}/dec_{i}.bin")
'''
    env = dict(os.environ)

    def run_stage(stage):
        procs = [subprocess.Popen(
            [sys.executable, "-c", code % REPO, stage, str(i), workdir],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, env=env,
            text=True) for i in range(3)]
        outs = [p.communicate(timeout=900)[0] for p in procs]
        for i, (p, o) in enumerate(zip(procs, outs)):
            assert p.returncode == 0, f"{stage} {i} failed:\n{o[-2000:]}"

    from heongpu_tpu.models import bfv, mpc
    from heongpu_tpu.utils import params, rng, serializer

    run_stage("party")
    t = params.plain_modulus_for(256, 20)
    # 3 limbs: Delta = Q/t ~ 2^67 must exceed the 2^40 smudging noise
    ctx = bfv.make_context(256, t, q_bits=[29, 29, 29], sec_level="none")
    ring = bfv._ring(ctx)
    a = mpc.crs_uniform(ring, 4242, (ctx.n,))
    shares = [serializer.load_from_file(f"{workdir}/pk_{i}.bin")
              for i in range(3)]
    pk = mpc.pk_assemble(ring, shares, a)

    m = np.arange(ctx.n) % ctx.t
    ct = bfv.encrypt(ctx, pk, bfv.encode(ctx, m), rng.new_key(730))
    serializer.save_to_file(ct, f"{workdir}/ct.bin")

    run_stage("decrypt")
    partials = [serializer.load_from_file(f"{workdir}/dec_{i}.bin")
                for i in range(3)]
    got = bfv.decode(ctx, mpc.bfv_decrypt_fuse(ctx, ct, partials))
    np.testing.assert_array_equal(got, m.astype(np.uint32))
