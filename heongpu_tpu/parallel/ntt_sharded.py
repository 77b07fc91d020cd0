"""Coefficient-sharded NTT over a device mesh: the four-step structure maps
1:1 onto multi-chip execution — both butterfly phases are embarrassingly
parallel across the sharded axis and the single transpose between them is an
all-to-all over ICI.

This is the scale-out path SURVEY §2.6 calls for ("cross-chip butterfly
stages exchanged all-to-all over ICI when coefficients are sharded"): very
large rings (or many limbs) split the polynomial across chips, each chip
runs the local size-N1 transforms on its N2/D columns, one
jax.lax.all_to_all re-tiles for the size-N2 phase.

Data layout: global arrays carry the ring in 2D four-step form —
  forward  in:  (..., L, N1, N2)  sharded P(..., None, 'coef') on N2
  forward  out: (..., L, N2, N1)  sharded P(..., None, 'coef') on N1
(flattening the output recovers the framework's standard NTT storage order;
ops/ntt.py eval_order is unchanged).  Pointwise NTT-domain ops (key MACs,
ct×pt) act on either layout unchanged, sharded or not.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P
try:
    from jax import shard_map as _shard_map

    def shard_map(f, **kw):  # jax >= 0.8 renamed check_rep -> check_vma
        if "check_rep" in kw:
            kw["check_vma"] = kw.pop("check_rep")
        return _shard_map(f, **kw)
except ImportError:  # jax < 0.7
    from jax.experimental.shard_map import shard_map

from ..ops import modmath as mm
from ..ops import ntt as nttm


def _table_tree(tb: nttm.NttTables):
    """The table subset the sharded kernels need, in four-step 2D layouts."""
    L = tb.num_limbs
    n1, n2 = tb.n1, tb.n2
    r = lambda a: a.reshape(L, n1, n2)
    return {
        "p": tb.p,
        "twm": r(tb.tw_mat), "twm_sh": r(tb.tw_mat_sh),
        "itwm": r(tb.itw_mat), "itwm_sh": r(tb.itw_mat_sh),
        "tw1": tuple(tb.tw1), "tw1_sh": tuple(tb.tw1_sh),
        "itw1": tuple(tb.itw1), "itw1_sh": tuple(tb.itw1_sh),
        "tw2": tuple(tb.tw2), "tw2_sh": tuple(tb.tw2_sh),
        "itw2": tuple(tb.itw2), "itw2_sh": tuple(tb.itw2_sh),
    }


def _table_specs():
    sh = P(None, None, "coef")
    rep = P()
    return {
        "p": rep,
        "twm": sh, "twm_sh": sh,
        "itwm": sh, "itwm_sh": sh,
        "tw1": None, "tw1_sh": None, "itw1": None, "itw1_sh": None,
        "tw2": None, "tw2_sh": None, "itw2": None, "itw2_sh": None,
    }


def _expand_specs(t, specs):
    """Stage-twiddle tuples replicate; broadcast their None spec entries."""
    out = {}
    for k, v in t.items():
        s = specs[k]
        out[k] = tuple(P() for _ in v) if s is None else s
    return out


def _fwd_local(x, t):
    """Local block (..., L, N1, N2/D) -> (..., L, N2, N1/D)."""
    pb = t["p"][:, None, None]
    # merged-negacyclic CT stages absorb the psi pre-scale (ops/ntt.py)
    y = nttm._merged_ct_stages(x, t["tw1"], t["tw1_sh"], t["p"])
    y = mm.shoup_mul_lazy(y, t["twm"], t["twm_sh"], pb)
    # transpose phase: all-to-all over ICI re-tiles (N1, N2/D) -> (N1/D, N2)
    y = jax.lax.all_to_all(y, "coef", split_axis=y.ndim - 2,
                           concat_axis=y.ndim - 1, tiled=True)
    y = jnp.swapaxes(y, -1, -2)                       # (..., N2, N1/D)
    y = nttm._gs_stages(y, t["tw2"], t["tw2_sh"], t["p"])
    # single deferred reduction from the Harvey-lazy [0, 2p) stage range
    return mm.cond_sub(y, pb)


def _inv_local(x, t):
    """Local block (..., L, N2, N1/D) -> (..., L, N1, N2/D)."""
    pb = t["p"][:, None, None]
    y = nttm._ct_stages(x, t["itw2"], t["itw2_sh"], t["p"])
    y = jnp.swapaxes(y, -1, -2)                       # (..., N1/D, N2)
    y = jax.lax.all_to_all(y, "coef", split_axis=y.ndim - 1,
                           concat_axis=y.ndim - 2, tiled=True)
    y = mm.shoup_mul_lazy(y, t["itwm"], t["itwm_sh"], pb)  # (..., N1, N2/D)
    # merged GS stages absorb psi^{-r}; n^{-1} is folded into itwm
    y = nttm._merged_gs_stages(y, t["itw1"], t["itw1_sh"], t["p"])
    # single deferred reduction from the lazy [0, 2p) range
    return mm.cond_sub(y, pb)


def make_sharded_ntt(mesh: Mesh, tb: nttm.NttTables, lead_dims: int = 0):
    """Jitted (fwd, inv) over globals shaped lead + (L, N1, N2) /
    lead + (L, N2, N1), both sharded on the last axis of the ring.

    The mesh must have a 'coef' axis dividing N1 and N2."""
    tables = _table_tree(tb)
    tspecs = _expand_specs(tables, _table_specs())
    lead = (None,) * (lead_dims + 1)                  # lead + L axis
    xs = P(*lead, None, "coef")

    fwd = shard_map(_fwd_local, mesh=mesh, in_specs=(xs, tspecs),
                    out_specs=xs, check_rep=False)
    inv = shard_map(_inv_local, mesh=mesh, in_specs=(xs, tspecs),
                    out_specs=xs, check_rep=False)
    return (jax.jit(lambda x: fwd(x, tables)),
            jax.jit(lambda x: inv(x, tables)))


def to_four_step(x, tb: nttm.NttTables):
    """(..., L, N) coefficient-domain -> forward-input layout (..., L, N1, N2)."""
    return x.reshape(x.shape[:-1] + (tb.n1, tb.n2))


def from_four_step_ntt(y):
    """Forward-output layout (..., L, N2, N1) -> flat (..., L, N) NTT-domain
    array in the framework's standard storage order."""
    return y.reshape(y.shape[:-2] + (-1,))
