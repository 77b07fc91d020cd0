"""Limb-sharded CKKS bootstrapping pieces over a device mesh.

The bootstrap key set is the HBM wall at large N (ROADMAP: the N=2^16
precision config's Galois set); sharding keys + the CtoS matvec over the
mesh 'limb' axis splits that wall across chips.  GSPMD propagates the
NamedSharding placements through matvec_piece (NTTs and MACs are
limb-local; base conversion contracts over limbs into ICI collectives).

No reference counterpart (HEonGPU is single-GPU, SURVEY §2.6); validated
here on the virtual CPU mesh for bit-equality against the single-device
path and for genuine key-shard placement.
"""

import numpy as np
import pytest
import jax

from heongpu_tpu.models import ckks, ckks_boot
from heongpu_tpu.parallel import mesh as meshlib
from heongpu_tpu.utils import rng


@pytest.fixture(scope="module")
def boot_setup():
    if len(jax.devices()) < 4:
        pytest.skip("needs >= 4 devices (CPU mesh)")
    ctx = ckks.make_context(256, [29] * 16, scale_bits=28, sec_level="none",
                            ks_type="II", alpha=2, p_count=4)
    sk = ckks.keygen_secret(ctx, rng.new_key(61), hamming_weight=16)
    pk = ckks.keygen_public(ctx, rng.new_key(62), sk)
    cfg = ckks_boot.BootConfig(taylor_degree=3, exp_squarings=1,
                               ctos_pieces=2, stoc_pieces=2)
    keys = ckks_boot.generate_bootstrap_keys(ctx, rng.new_key(63), sk, cfg,
                                             limb_align=4)
    z = np.random.default_rng(0).uniform(-0.5, 0.5, 128)
    ct = ckks.encrypt(ctx, pk, ckks.encode(ctx, z, scale=keys.msg_scale),
                      rng.new_key(64))
    ct = ckks.mod_drop(ctx, ct, ctx.k - 1)
    return ctx, keys, ct


def test_limb_sharded_ctos_matches_single_device(boot_setup):
    ctx, keys, ct = boot_setup
    raised = ckks_boot.mod_raise(ctx, ct, 1)

    f = jax.jit(lambda c_, k_: ckks_boot.coeff_to_slot(ctx, c_, k_))
    t0_ref, t1_ref = f(raised, keys)

    m = meshlib.make_mesh(4, limb_shards=4)
    keys_sh = meshlib.shard_pytree_limb_axis(keys, m)
    raised_sh = jax.device_put(raised.c, meshlib.ct_sharding(m))
    raised_sh = ckks.Ciphertext(raised_sh, raised.size, raised.level,
                                raised.scale)
    t0_sh, t1_sh = f(raised_sh, keys_sh)

    np.testing.assert_array_equal(np.asarray(t0_ref.c), np.asarray(t0_sh.c))
    np.testing.assert_array_equal(np.asarray(t1_ref.c), np.asarray(t1_sh.c))


def test_boot_keys_genuinely_sharded(boot_setup):
    ctx, keys, _ = boot_setup
    m = meshlib.make_mesh(4, limb_shards=4)
    keys_sh = meshlib.shard_pytree_limb_axis(keys, m)
    # keys are generated at their use level (mixed limb extents) but
    # limb_align=4 rounds each generation level so every limb extent
    # divides the mesh: ALL Galois keys must genuinely split 4-way
    checked = 0
    for g, kk in keys_sh.gk.keys.items():
        full_l = kk.k0.shape[1]
        shard_l = kk.k0.addressable_shards[0].data.shape[1]
        assert shard_l == full_l // 4, (g, full_l, shard_l)
        checked += 1
    assert checked >= 3
    # per-device bytes of the whole bundle ≈ total/4 for the sharded leaves
    tot = sum(x.nbytes for x in jax.tree_util.tree_leaves(keys_sh)
              if hasattr(x, "nbytes"))
    dev0 = sum(s.data.nbytes
               for x in jax.tree_util.tree_leaves(keys_sh)
               if hasattr(x, "addressable_shards")
               for s in x.addressable_shards if s.device == jax.devices()[0])
    assert dev0 < 0.45 * tot, (dev0, tot)


@pytest.mark.slow
def test_limb_sharded_full_bootstrap(boot_setup):
    ctx, keys, ct = boot_setup
    m = meshlib.make_mesh(4, limb_shards=4)
    keys_sh = meshlib.shard_pytree_limb_axis(keys, m)
    ct_sh = ckks.Ciphertext(meshlib.shard_array_limb_axis(ct.c, m),
                            ct.size, ct.level, ct.scale)
    f = jax.jit(lambda c_, k_: ckks_boot.regular_bootstrap(ctx, c_, k_))
    out_ref = f(ct, keys)
    out_sh = f(ct_sh, keys_sh)
    np.testing.assert_array_equal(np.asarray(out_ref.c), np.asarray(out_sh.c))
