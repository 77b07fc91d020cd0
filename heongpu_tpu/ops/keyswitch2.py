"""Method-II (hybrid) keyswitching tables: grouped RNS digits + multi-prime P.

TPU analog of the reference's METHOD_II machinery
(kernel/contextpool.cpp KeySwitchParameterGenerator, kernel/switchkey.cu
base_conversion_DtoQtilde / multiply_accumulate_extended /
divide_round_lastq_extended — SURVEY §2.2, ePrint 2025/124):

  * the k Q-primes are split into d̃ = ceil(k/alpha) consecutive groups;
    each digit is the exact value [c]_{D_j} (D_j = product of group j),
    carried into the full Q·P basis by FastBconv;
  * P is a product of alpha ~30-bit special primes, so the ÷P noise
    reduction is ~2^(30·alpha) — this is what restores CKKS keyswitch
    precision with uint32 lanes (a single 30-bit special prime leaves the
    digit/P ratio near 1);
  * keys carry P·target on every limb of their group (the grouped gadget
    g_j ≡ P·δ_{i∈group j} in RNS), so one key object serves every level by
    prefix slicing, exactly like Method I.

Division by P happens one special prime at a time (alpha DivRoundLastq
stages), each an exact rounding division.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Sequence, Tuple

import numpy as np
import jax
import jax.numpy as jnp

from . import modmath as mm
from . import ntt as nttm
from . import rns


@partial(jax.tree_util.register_dataclass,
         data_fields=["convs", "div_stages"],
         meta_fields=["alpha", "groups", "num_active"])
@dataclasses.dataclass(frozen=True)
class KS2Level:
    """Method-II tables for one level (a fixed active-prime prefix)."""
    alpha: int
    groups: Tuple[Tuple[int, ...], ...]   # active prime indices per digit
    num_active: int
    convs: Tuple[rns.BaseConv, ...]       # group primes -> active Q + P basis
    div_stages: Tuple[rns.DivRoundLastq, ...]  # divide by each special prime


def build_ks2_level(q_primes: Sequence[int], p_primes: Sequence[int],
                    ka: int, alpha: int) -> KS2Level:
    """Tables for the level with active primes q_primes[:ka]."""
    active = [int(q) for q in q_primes[:ka]]
    specials = [int(q) for q in p_primes]
    groups = []
    for j in range(0, ka, alpha):
        groups.append(tuple(range(j, min(j + alpha, ka))))
    target_basis = active + specials
    convs = tuple(
        rns.BaseConv.build([active[i] for i in g], target_basis) for g in groups)
    stages = []
    remaining = list(target_basis)
    for sp in reversed(specials):
        remaining = remaining[:-1]
        stages.append(rns.DivRoundLastq.build(remaining, sp))
    return KS2Level(alpha=alpha, groups=tuple(groups), num_active=ka,
                    convs=convs, div_stages=tuple(stages))


import os

# Keyswitch core backend: "stages" (jnp, XLA-fused) or "fused" (single
# Pallas kernel: digit build + NTT + MAC + INTT all in VMEM, TPU only).
_BACKEND = os.environ.get("HEONGPU_KS", "stages")


def set_backend(name: str) -> None:
    assert name in ("stages", "fused"), name
    global _BACKEND
    _BACKEND = name


def keyswitch2(poly_q, k0, k1, ks2: KS2Level, ntt_qp_level: nttm.NttTables,
               base_qp_level: rns.Base, in_ntt: bool, out_ntt: bool,
               ntt_q_level: nttm.NttTables):
    """Method-II keyswitch of one poly over the level basis.

    poly_q: (ka, n); k0/k1: (d̃, ka+alpha, n) NTT+Montgomery (already sliced
    to the level).  Returns (d0, d1) over the active Q primes."""
    if (_BACKEND == "fused" and poly_q.ndim == 2
            and len(ks2.groups) <= 16 and ntt_qp_level.mxu is None):
        from . import keyswitch_pallas
        return keyswitch_pallas.keyswitch2_fused(
            poly_q, k0, k1, ks2, ntt_qp_level, base_qp_level,
            in_ntt, out_ntt, ntt_q_level)
    if in_ntt:
        poly_q = nttm.ntt_inv(poly_q, ntt_q_level)
    digs = []
    for j, g in enumerate(ks2.groups):
        part = poly_q[..., g[0]: g[-1] + 1, :]
        digs.append(ks2.convs[j](part))               # (ka+alpha, n)
    digits = jnp.stack(digs, axis=-3)                 # (d̃, ka+alpha, n)
    d_ntt = nttm.ntt_fwd(digits, ntt_qp_level)
    acc0 = rns.lazy_mac_mont(d_ntt, k0, base_qp_level)
    acc1 = rns.lazy_mac_mont(d_ntt, k1, base_qp_level)
    acc = nttm.ntt_inv(jnp.stack([acc0, acc1]), ntt_qp_level)
    for stage in ks2.div_stages:
        acc = stage(acc)
    d0, d1 = acc[0], acc[1]
    if out_ntt:
        d0 = nttm.ntt_fwd(d0, ntt_q_level)
        d1 = nttm.ntt_fwd(d1, ntt_q_level)
    return d0, d1
