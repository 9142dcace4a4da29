"""Planned gather: table lookup with a fast, precomputed-transpose backward.

The ELBO gathers the posterior sample `z_f` by `refl_id` and the image scale
by `image_id` (reference: /root/reference/careless/models/merging/
variational.py:165-167). The reverse-mode transpose of those gathers is a
duplicate-index scatter-add of one contribution per OBSERVATION into the
table — XLA lowers that scatter to a serialized sort-based loop on TPU
(~1.4 ms for 100k obs -> 10k refl on v5e, measured), which dominates the
whole train step.

Because the index arrays are static for a given dataset, the scatter has a
closed form: presort the contributions by table id with a precomputed
permutation, then every table entry's gradient is a contiguous-segment sum,
computed as a difference of two cumulative-sum values at static boundaries.
On TPU this is one gather + one log-depth cumsum + two table-sized gathers
(~0.26 ms for the same shape — 5.5x faster than XLA's scatter).

Usage:
    plan = make_gather_plan(ids, table_size)     # host-side, once per dataset
    out  = plan_gather(table, ids, plan)         # inside jit; d(table) is fast
"""
from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

Array = jax.Array


class GatherPlan(NamedTuple):
    """Static transpose plan for gathering `table[ids]` (all int32)."""

    perm: Array    # (N,)  argsort of ids: ids[perm] is sorted
    starts: Array  # (T,)  first position of id t in the sorted order
    ends: Array    # (T,)  one past the last position of id t


def make_gather_plan(ids, table_size: int) -> GatherPlan:
    """Host-side plan construction (numpy; ids must be in [0, table_size))."""
    ids = np.asarray(ids).reshape(-1)
    perm = np.argsort(ids, kind="stable").astype(np.int32)
    sorted_ids = ids[perm]
    rng = np.arange(table_size)
    starts = np.searchsorted(sorted_ids, rng, side="left").astype(np.int32)
    ends = np.searchsorted(sorted_ids, rng, side="right").astype(np.int32)
    return GatherPlan(perm=perm, starts=starts, ends=ends)


_CHUNK = 512  # cumsum reset interval (see precision note below)


def segment_sum_by_plan(contrib: Array, plan: GatherPlan) -> Array:
    """sum of contrib over each id's segment: the scatter-add closed form.

    contrib may have leading batch axes; the segmented axis is the last one.

    Precision: a single global f32 cumsum grows to sum(|contrib|) magnitude,
    so boundary differences for short segments lose ~|cs|*eps absolute
    accuracy. The cumsum is therefore two-level: exact-cancelling local
    cumsums within _CHUNK-sized chunks plus a chunk-prefix term — for the
    (overwhelmingly common) segments contained in one chunk, the large
    chunk prefix cancels exactly and the error is bounded by the local
    chunk magnitude.
    """
    c_sorted = jnp.take(contrib, plan.perm, axis=-1)
    n = c_sorted.shape[-1]
    lead = c_sorted.shape[:-1]
    # pad with >= 1 zero so boundary position n indexes a real (zero) slot
    m = (n + _CHUNK) // _CHUNK
    pad = m * _CHUNK - n
    c_sorted = jnp.concatenate(
        [c_sorted, jnp.zeros(lead + (pad,), c_sorted.dtype)], axis=-1)
    rows = c_sorted.reshape(lead + (m, _CHUNK))
    local_cs = jnp.cumsum(rows, axis=-1)                      # inclusive
    chunk_prefix = jnp.cumsum(local_cs[..., -1], axis=-1)
    chunk_prefix = jnp.concatenate(
        [jnp.zeros(lead + (1,), c_sorted.dtype), chunk_prefix[..., :-1]],
        axis=-1)                                              # exclusive
    # exclusive flat cumsum: cs[k] = chunk_prefix[k // C] + local_excl[k]
    local_excl = jnp.concatenate(
        [jnp.zeros(lead + (m, 1), c_sorted.dtype), local_cs[..., :-1]],
        axis=-1).reshape(lead + (m * _CHUNK,))

    def at(pos):  # exclusive prefix sum at pos in [0, n]
        return (jnp.take(chunk_prefix, pos // _CHUNK, axis=-1)
                + jnp.take(local_excl, pos, axis=-1))

    return at(plan.ends) - at(plan.starts)


@jax.custom_vjp
def _plan_gather(table, ids, perm, starts, ends):
    return jnp.take(table, ids, axis=-1)


def _plan_gather_fwd(table, ids, perm, starts, ends):
    return jnp.take(table, ids, axis=-1), (perm, starts, ends)


def _plan_gather_bwd(res, ct):
    perm, starts, ends = res
    dtable = segment_sum_by_plan(ct, GatherPlan(perm, starts, ends))
    return dtable, None, None, None, None


_plan_gather.defvjp(_plan_gather_fwd, _plan_gather_bwd)


def plan_gather(table: Array, ids: Array,
                plan: Optional[GatherPlan]) -> Array:
    """`jnp.take(table, ids, axis=-1)` with the fast planned transpose.

    Falls back to a plain gather (XLA scatter transpose) when plan is None —
    e.g. on sharded inputs where the ids are not globally addressable.
    """
    if plan is None:
        return jnp.take(table, ids, axis=-1)
    return _plan_gather(table, ids, plan.perm, plan.starts, plan.ends)
