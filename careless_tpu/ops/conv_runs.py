"""Run-aligned harmonic convolution: the Laue scatter-add with NO gathers.

The reference convolves per-observation predictions into harmonic-group
buckets with a scatter-add (/root/reference/careless/models/likelihoods/
laue.py:17-25) and scores the bucket against the group's packed intensity.
The planned segment-sum version of that (ops/plan_gather.plan_convolve)
still pays one ~N-position boundary lookup, which XLA element-serializes
(~6.8 ms/M on v5e — benchmarks/laue_breakdown.py).

In the production layout harmonic groups are short CONTIGUOUS runs of rows
(1-8 observations), so the convolution has a gather-free closed form:

    conv_start[o] = sum_{k < run_len[o]} ipred[o + k]     (G shifted adds)

with the log-prob evaluated at each run's START row against the group's
intensity broadcast to that row, plus a static tail term reproducing the
group-layout's padding rows (conv == 0 at never-hit group ids — the
reference's "garbage-but-gradient-free" rows, which DO contribute a
param-gradient for Ev11 likelihoods, reproduced exactly).

Everything static is precomputed host-side into a ConvRunPlan; the runtime
cost is G N-sized multiply-adds forward (and their slice/pad transposes
backward) — ~0.1 ms/M instead of 6.8.
"""
from __future__ import annotations

from dataclasses import dataclass
from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

Array = jax.Array

# beyond this many observations per harmonic group the unrolled shifted-add
# loses to the segment-sum path; real Laue gcd expansions are <= ~6
MAX_RUN = 16


@partial(jax.tree_util.register_dataclass,
         data_fields=("start_ll_mask", "run_len", "iobs_row", "sig_row",
                      "tail_mask"),
         meta_fields=("max_run",))
@dataclass(frozen=True)
class ConvRunPlan:
    """Static run layout for the gather-free Laue convolution.

    start_ll_mask: (N,) f32 — 1 at the first row of each REAL group (groups
        whose group-table row is masked-in), 0 elsewhere
    run_len: (N,) int32 — group size at start rows, 0 elsewhere
    iobs_row/sig_row: (N,) f32 — the group's packed intensity/uncertainty
        broadcast to its observation rows
    tail_mask: (N,) f32 — group-table rows never hit by any group id (and
        not masked out): the reference's padding rows, scored at conv == 0
    max_run: static unrolled shift count (max group size)
    """

    start_ll_mask: Array
    run_len: Array
    iobs_row: Array
    sig_row: Array
    tail_mask: Array
    max_run: int


def make_conv_run_plan(harmonic_id, intensities, uncertainties,
                       mask=None) -> Optional[ConvRunPlan]:
    """Host-side plan construction. Returns None when the layout does not
    qualify (unsorted ids or a pathological max group size).

    mask, when given, is the GROUP-TABLE row mask of the sharded layout
    (parallel/shard.py): a group is real iff mask[group_id] == 1.
    """
    hid = np.asarray(harmonic_id).reshape(-1)
    n = len(hid)
    if n == 0 or not bool(np.all(hid[1:] >= hid[:-1])):
        return None
    iobs = np.asarray(intensities, np.float32).reshape(-1)
    sig = np.asarray(uncertainties, np.float32).reshape(-1)
    if iobs.shape[0] != n or sig.shape[0] != n:
        return None  # group table must be same-length (the packed ABI)

    is_start = np.ones(n, bool)
    is_start[1:] = hid[1:] != hid[:-1]
    starts = np.flatnonzero(is_start)
    run_len_at_start = np.diff(np.append(starts, n)).astype(np.int32)
    max_run = int(run_len_at_start.max())
    if max_run > MAX_RUN:
        return None

    run_len = np.zeros(n, np.int32)
    run_len[starts] = run_len_at_start

    group_mask = (np.ones(n, np.float32) if mask is None
                  else np.asarray(mask, np.float32).reshape(-1))
    start_ll_mask = np.zeros(n, np.float32)
    start_ll_mask[starts] = group_mask[hid[starts]]

    hit = np.zeros(n, bool)
    hit[hid] = True
    tail_mask = (group_mask * ~hit).astype(np.float32)

    return ConvRunPlan(
        start_ll_mask=start_ll_mask,
        run_len=run_len,
        iobs_row=iobs[hid],
        sig_row=sig[hid],
        tail_mask=tail_mask,
        max_run=max_run,
    )


def conv_start_sums(ipred: Array, plan: ConvRunPlan) -> Array:
    """Per-row convolved prediction at run-start rows (garbage elsewhere —
    consumers multiply by start_ll_mask). Works on (..., N)."""
    n = ipred.shape[-1]
    lead = ipred.shape[:-1]
    total = jnp.zeros_like(ipred)
    for k in range(plan.max_run):
        if k == 0:
            shifted = ipred
        else:
            shifted = jnp.concatenate(
                [ipred[..., k:], jnp.zeros(lead + (k,), ipred.dtype)],
                axis=-1)
        total = total + shifted * (k < plan.run_len)
    return total
