"""Digit-parallel sharded Method-II keyswitch (explicit shard_map).

The HBM wall of large-N bootstrapping is the evaluation-key set (8.9 GiB at
N=2^16 depth 48 — benchmarks/RESULTS.md round 4); the natural multi-chip
answer is to shard the KEYS.  Naive GSPMD on the limb-sharded keyswitch
re-gathers operands around the digit contraction (measured 8.7x overhead on
the 8-way CPU-mesh proxy, __graft_entry__.dryrun_multichip), so this module
places the collective by hand — the scaling-book "row-parallel matmul"
recipe applied to the keyswitch MAC:

  * mesh axis 'limb' = DIGIT shards: device i owns d̃/k consecutive digit
    groups — its slice of the ciphertext Q limbs (group-aligned), its slice
    of the stacked FastBconv tables, and its (d̃/k, QP, n) slice of every
    key.  Key HBM per chip falls 1/k.
  * per device, LOCALLY: digit build (Shoup scale + lazy-MAC base conv to
    the full Q̃ basis), forward NTT over Q̃, and the key MAC over its own
    digits — a partial accumulator pair (2, QP, n).
  * ONE collective: a log2(k)-round XOR-butterfly all-reduce with modular
    adds (values stay < p < 2^30 in uint32 lanes; a raw psum of k partials
    would overflow 32 bits at k >= 4).  2·QP·n·4B·log2(k) bytes over ICI.
  * the tail (INTT over Q̃, ÷P stages, NTT over Q) is per-limb parallel and
    stays in GSPMD-land under an explicit output-sharding constraint.

Reference counterpart: the single-GPU keyswitch_multiply_accumulate
pipeline (kernel/switchkey.cu:61, contextpool.cpp KeySwitchParameter-
Generator) — the reference has no multi-device story (SURVEY §2.6).
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Tuple

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..ops import modmath as mm
from ..ops import ntt as nttm
from ..ops import rns
from ..ops.keyswitch2 import KS2Level


@partial(jax.tree_util.register_dataclass,
         data_fields=["qhat_inv", "qhat_inv_sh", "mat_mont", "gp"],
         meta_fields=["alpha", "d", "ka"])
@dataclasses.dataclass(frozen=True)
class StackedConv:
    """The per-group FastBconv tables of one KS2Level, stacked on a leading
    digit axis so a digit-sharded shard_map can slice them as data."""
    alpha: int
    d: int                      # number of digits
    ka: int                     # active Q limbs (= d * alpha, group-aligned)
    qhat_inv: jnp.ndarray       # (d, alpha)
    qhat_inv_sh: jnp.ndarray    # (d, alpha)
    mat_mont: jnp.ndarray       # (d, alpha, qp)
    gp: jnp.ndarray             # (d, alpha) group primes


def stack_convs(ks2: KS2Level) -> StackedConv:
    convs = ks2.convs
    alpha = len(ks2.groups[0])
    assert all(len(g) == alpha for g in ks2.groups), \
        "digit sharding needs alpha | ka (uniform groups)"
    return StackedConv(
        alpha=alpha, d=len(convs), ka=ks2.num_active,
        qhat_inv=jnp.stack([c.qhat_inv for c in convs]),
        qhat_inv_sh=jnp.stack([c.qhat_inv_sh for c in convs]),
        mat_mont=jnp.stack([c.mat_mont for c in convs]),
        gp=jnp.stack([c.ibase.p for c in convs]))


def _allreduce_mod(acc, p, axis_name: str, k: int):
    """XOR-butterfly all-reduce with per-round modular adds: after log2(k)
    rounds every shard holds Σ partials mod p, values never leave [0, p)."""
    step = 1
    while step < k:
        perm = [(i, i ^ step) for i in range(k)]
        other = jax.lax.ppermute(acc, axis_name, perm)
        acc = mm.add_mod(acc, other, p)
        step *= 2
    return acc


def keyswitch2_sharded(mesh: Mesh, poly_q, k0, k1, ks2: KS2Level,
                       sc: StackedConv, ntt_qp: nttm.NttTables,
                       base_qp: rns.Base, ntt_q: nttm.NttTables,
                       out_ntt: bool = True) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """poly_q: (ka, n) COEFF-domain, sharded P('limb', None) (group-aligned:
    ka/k must be a multiple of alpha).  k0/k1: (d̃, qp, n) NTT+Montgomery,
    sharded P('limb', None, None) — each chip holds 1/k of the key.
    Returns (d0, d1) over active Q, limb-sharded."""
    k = mesh.shape["limb"]
    assert sc.d % k == 0, f"digits {sc.d} must divide over limb={k}"
    assert sc.ka % (k * sc.alpha) == 0, "Q limbs must split group-aligned"
    p_qp = base_qp.bview()[0]

    def local(poly_loc, k0_loc, k1_loc, qi_loc, qish_loc, mat_loc, gp_loc):
        # poly_loc (ka/k, n): this shard's Q limbs = its digit groups
        D = k0_loc.shape[0]
        n = poly_loc.shape[-1]
        x = poly_loc.reshape(D, sc.alpha, n)
        z = mm.shoup_mul(x, qi_loc[:, :, None], qish_loc[:, :, None],
                         gp_loc[:, :, None])
        # FastBconv into full Q̃: lazy MAC over the alpha group limbs
        digits = rns.lazy_mac_mont(z[:, :, None, :], mat_loc[:, :, :, None],
                                   base_qp, axis=-3)      # (D, qp, n)
        d_ntt = nttm.ntt_fwd(digits, ntt_qp)
        acc0 = rns.lazy_mac_mont(d_ntt, k0_loc, base_qp, axis=-3)
        acc1 = rns.lazy_mac_mont(d_ntt, k1_loc, base_qp, axis=-3)
        acc = jnp.stack([acc0, acc1])                     # (2, qp, n) partial
        return _allreduce_mod(acc, p_qp, "limb", k)       # p_qp is (qp, 1)

    acc = jax.shard_map(
        local, mesh=mesh,
        in_specs=(P("limb", None), P("limb", None, None), P("limb", None, None),
                  P("limb", None), P("limb", None), P("limb", None, None),
                  P("limb", None)),
        out_specs=P(None, None, None),
        # the butterfly all-reduce leaves every shard with the same total;
        # JAX's varying-axis inference can't prove ppermute+add converges
        check_vma=False,
    )(poly_q, k0, k1, sc.qhat_inv, sc.qhat_inv_sh, sc.mat_mont, sc.gp)

    # tail: per-limb parallel — INTT over Q̃, exact ÷P stages, NTT over Q;
    # GSPMD shards it under the output constraint (no contractions left)
    acc = nttm.ntt_inv(acc, ntt_qp)
    for stage in ks2.div_stages:
        acc = stage(acc)
    d0, d1 = acc[0], acc[1]
    if out_ntt:
        d0 = nttm.ntt_fwd(d0, ntt_q)
        d1 = nttm.ntt_fwd(d1, ntt_q)
    spec = NamedSharding(mesh, P("limb", None))
    return (jax.lax.with_sharding_constraint(d0, spec),
            jax.lax.with_sharding_constraint(d1, spec))
