"""Harmonic-chain reflection renumbering: the layout that lets the Laue
refl gather use the windowed kernel.

The structural problem (rounds 2-4): the Laue training layout must keep
harmonic groups contiguous (for the run-aligned convolution,
ops/conv_runs.py), so rows cannot be globally sorted by refl_id — and an
unsorted refl gather pays the order-independent price (one-hot MXU forward
1.8 ms/M + sort backward permute 1.9 ms/M, ~4.05 of the 6.27 ms round-4
Laue step; benchmarks/PERF_NOTES.md).

The physical fact that dissolves the trade-off: every harmonic group's
reflections lie on ONE central ray — they are integer multiples n*h0 of a
single primitive Miller index (the reference expands harmonics exactly this
way, /root/reference/careless/utils/laue.py; our utils/laue.py matches).
So the reflection co-occurrence graph decomposes into tiny "chains" (the
connected components: reflections sharing a ray, linked across groups by
shared members). Renumber reflections so each chain's members get
CONSECUTIVE table ids, order groups by their minimum renumbered id, and
sort rows within each group by renumbered id. Then:

- every group's ids span at most one chain (<= ~8 consecutive ids), so
  per-tile gather windows are as tight as the mono refl-sorted layout;
- all observations of one chain (every group of every image observing that
  ray) are adjacent in row order, so the row sequence of renumbered ids is
  sorted up to a bounded local displacement (~= the chain's total
  observation count) — the backward permute to id order becomes a
  quasi-identity permutation applicable with the SAME windowed kernel
  instead of a full 1.9 ms/M sort.

The renumbering is internal to the gather plan (ops/plan_gather.py
ChainGatherPlan): Inputs.refl_id keeps the canonical ASU-collection ids and
the posterior/prior tables stay in canonical order; the plan carries the
permutation and permutes the (n_refl-sized, i.e. ~20x smaller than the obs
axis) sample table on the fly each step.

All functions here are host-side numpy, run once per dataset at plan time.
"""
from __future__ import annotations

from typing import Tuple

import numpy as np


def chain_labels(refl_id, harmonic_id, n_refl: int) -> np.ndarray:
    """Label every reflection with the minimum refl_id of its harmonic
    chain (= connected component of the group-co-occurrence graph).

    Vectorized label propagation with pointer jumping: chains are tiny
    (bounded by the harmonic count of one ray, <= ~8), so this converges
    in O(log chain length) passes over the edge list.
    """
    rid = np.asarray(refl_id, np.int64).reshape(-1)
    hid = np.asarray(harmonic_id, np.int64).reshape(-1)
    lab = np.arange(n_refl, dtype=np.int64)
    if len(rid) == 0:
        return lab
    order = np.lexsort((rid, hid))
    r, h = rid[order], hid[order]
    same = h[1:] == h[:-1]
    a, b = r[:-1][same], r[1:][same]  # co-occurrence edges (within groups)
    if len(a) == 0:
        return lab
    while True:
        m = np.minimum(lab[a], lab[b])
        new = lab.copy()
        np.minimum.at(new, a, m)
        np.minimum.at(new, b, m)
        new = np.minimum(new, new[new])  # pointer jump
        if np.array_equal(new, lab):
            return lab
        lab = new


def chain_permutation(refl_id, harmonic_id, n_refl: int
                      ) -> Tuple[np.ndarray, np.ndarray]:
    """(sigma, sigma_inv): sigma[new_id] = old_id orders reflections by
    (chain label, old id) — chain members get consecutive new ids, chains
    ordered by their minimum old id; unobserved reflections are singleton
    chains. sigma_inv is the inverse (old -> new).

    Deterministic in the DATA (row order of the inputs does not matter):
    the partition is a graph property and both sort keys are canonical.
    """
    lab = chain_labels(refl_id, harmonic_id, n_refl)
    sigma = np.lexsort((np.arange(n_refl), lab)).astype(np.int32)
    sigma_inv = np.empty(n_refl, np.int32)
    sigma_inv[sigma] = np.arange(n_refl, dtype=np.int32)
    return sigma, sigma_inv


def chain_row_order(refl_id, harmonic_id, n_refl: int) -> np.ndarray:
    """Row permutation for the chain training layout: groups stay
    contiguous, ordered by their minimum renumbered refl id (ties broken
    by group id, so distinct groups sharing a minimum stay separate), rows
    within a group ordered by renumbered id."""
    rid = np.asarray(refl_id).reshape(-1)
    hid = np.asarray(harmonic_id, np.int64).reshape(-1)
    _, sigma_inv = chain_permutation(rid, hid, n_refl)
    local = sigma_inv[rid]
    n_groups = int(hid.max()) + 1 if len(hid) else 0
    gmin = np.full(n_groups, np.iinfo(np.int64).max)
    np.minimum.at(gmin, hid, local.astype(np.int64))
    return np.lexsort((local, hid, gmin[hid]))
