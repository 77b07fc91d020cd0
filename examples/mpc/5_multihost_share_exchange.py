"""MPC with parties in SEPARATE OS PROCESSES, exchanging serialized shares
through the serializer (file transport — any byte channel works the same).

The reference simulates all parties in one process and notes that real
deployments serialize objects and ship them out of band
(example/mpc/1_multiparty_computation_bfv.cpp, SURVEY §3.6).  This demo is
that deployment shape: each party process generates its public-key share and
a decryption share against the collective ciphertext; the coordinator
process assembles without ever seeing a secret key.

Run:  python 5_multihost_share_exchange.py            (spawns the parties)
      python 5_multihost_share_exchange.py party <i> <dir>   (internal)
"""

import os
import subprocess
import sys
import tempfile

sys.path.insert(0, os.path.abspath(os.path.join(os.path.dirname(__file__),
                                                "..", "..")))

import numpy as np  # noqa: E402

N_PARTIES = 3
SEED_CRS = 20240817
N = 1024


def _setup():
    from heongpu_tpu.models import bfv
    from heongpu_tpu.utils import params

    t = params.plain_modulus_for(N, 20)
    return bfv.make_context(N, t, q_bits=[29, 29, 29], sec_level="none")


def party(i: int, workdir: str):
    """One party process: keygen, pk share; later a partial decryption."""
    from heongpu_tpu.models import bfv, mpc, ringkit
    from heongpu_tpu.utils import rng, serializer

    ctx = _setup()
    ring = bfv._ring(ctx)
    sk = ringkit.keygen_secret(ring, rng.new_key(500 + i))
    serializer.save_to_file(sk, f"{workdir}/sk_{i}.bin")  # party-private

    a = mpc.crs_uniform(ring, SEED_CRS, (ctx.n,))
    share = mpc.pk_share(ring, sk, a, rng.new_key(510 + i))
    serializer.save_to_file(share, f"{workdir}/pkshare_{i}.bin")
    print(f"[party {i}] pk share written", flush=True)


def party_decrypt(i: int, workdir: str):
    from heongpu_tpu.models import bfv, mpc
    from heongpu_tpu.utils import rng, serializer

    ctx = _setup()
    sk = serializer.load_from_file(f"{workdir}/sk_{i}.bin")
    ct = serializer.load_from_file(f"{workdir}/ct.bin")
    partial = mpc.bfv_decrypt_partial(ctx, sk, ct, rng.new_key(520 + i))
    serializer.save_to_file(partial, f"{workdir}/dec_{i}.bin")
    print(f"[party {i}] decryption share written", flush=True)


def coordinator():
    from heongpu_tpu.models import bfv, mpc
    from heongpu_tpu.utils import rng, serializer

    workdir = tempfile.mkdtemp(prefix="mpc_exchange_")
    me = os.path.abspath(__file__)

    def run_all(stage):
        procs = [subprocess.Popen([sys.executable, me, stage, str(i), workdir])
                 for i in range(N_PARTIES)]
        assert all(p.wait() == 0 for p in procs), f"a party failed in {stage}"

    # round 1: collect pk shares from party processes
    run_all("party")
    ctx = _setup()
    ring = bfv._ring(ctx)
    a = mpc.crs_uniform(ring, SEED_CRS, (ctx.n,))
    shares = [serializer.load_from_file(f"{workdir}/pkshare_{i}.bin")
              for i in range(N_PARTIES)]
    pk = mpc.pk_assemble(ring, shares, a)
    print("[coord] collective pk assembled", flush=True)

    # encrypt under the collective key, publish the ciphertext
    m = np.arange(ctx.n) % ctx.t
    ct = bfv.encrypt(ctx, pk, bfv.encode(ctx, m), rng.new_key(600))
    serializer.save_to_file(ct, f"{workdir}/ct.bin")

    # round 2: threshold decryption shares from the party processes
    run_all("party_decrypt")
    partials = [serializer.load_from_file(f"{workdir}/dec_{i}.bin")
                for i in range(N_PARTIES)]
    got = bfv.decode(ctx, mpc.bfv_decrypt_fuse(ctx, ct, partials))
    assert (got == (m % ctx.t).astype(np.uint32)).all()
    print("[coord] threshold decryption across processes: OK", flush=True)
    print("MPC_EXCHANGE_OK", flush=True)


if __name__ == "__main__":
    if len(sys.argv) == 1:
        coordinator()
    elif sys.argv[1] == "party":
        party(int(sys.argv[2]), sys.argv[3])
    elif sys.argv[1] == "party_decrypt":
        party_decrypt(int(sys.argv[2]), sys.argv[3])
