"""Planned gather: table lookups with fast forward AND backward paths.

The ELBO gathers the posterior sample `z_f` by `refl_id` and the image scale
by `image_id` (reference: /root/reference/careless/models/merging/
variational.py:165-167). On TPU, XLA lowers BOTH directions badly:

- a generic N-element dynamic gather executes element-at-a-time
  (~6.7 ms for 1M observations on v5e — measured, vs ~0.01 ms of traffic);
- the reverse-mode transpose is a duplicate-index scatter-add, which XLA
  serializes the same way.

Because the index arrays are static for a given dataset, both directions
have fast closed forms, precomputed host-side into a GatherPlan:

forward (Pallas kernel, ops/table_gather.py): observations are tiled
  (rows, 128); each tile's ids fall in a precomputed window of table rows
  [base, base+window). The kernel slices the window out of the VMEM-resident
  table and resolves ids with one same-shape `take_along_axis` (Mosaic
  tpu.dynamic_gather) per 128-wide chunk — `window` chunks per tile instead
  of 8192 serialized element loads. Windows are tight when the ids are
  SORTED (the training path sorts observations by refl_id) and fall back to
  the whole table when it is small (the image table).

backward: presort the cotangent by table id with the plan's permutation,
  then every table entry's gradient is a contiguous-segment sum, computed
  as a difference of two cumulative-sum values at static boundaries. When
  the ids are already sorted the permute is skipped entirely.

Usage:
    plan = make_gather_plan(ids, table_size)     # host-side, once per dataset
    out  = plan_gather(table, ids, plan)         # inside jit
"""
from __future__ import annotations

import logging
from dataclasses import dataclass
from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

Array = jax.Array
logger = logging.getLogger(__name__)

LANES = 128
BLOCK_OBS = 8192            # observations per kernel grid step (64 x 128)
# give up on the kernel beyond a 10240-entry window: the per-tile chunk
# loop costs ~linearly in window, and even at 80 chunks it beats the
# ~6.7 ms/M element-serialized XLA take by ~7x (the chain layout's
# singleton-heavy regions put the harmonic-convolve windows at exactly 64
# chunks — the old 48 cap silently dropped that kernel, round-5 measured
# 13.5 ms/M on the output-time convolve)
MAX_WINDOW_CHUNKS = 80
MAX_TABLE_ROWS = 16384      # table must fit comfortably in VMEM (8 MB)
# one-hot histogram backward for unsorted ids into tables this small: with
# sqrt(T)-balanced factor widths the histogram beats sort+segment-sum up to
# ~T=40k (measured 1M obs on v5e: 0.49 vs 2.5 ms at T=2k, 1.36 at T=20k,
# 2.8 — losing — at T=50k). The crossover grows with N (the sort is
# ~N log N while the histogram is ~N sqrt(T)): at 10M obs the histogram
# still wins at T=50k (26.6 vs 35.3 ms, benchmarks/image_axis_probe.py),
# so the cap doubles at serial-crystallography scale — see _hist_table_cap
MAX_HIST_TABLE = 32768
MAX_HIST_TABLE_BIG_N = 65536
BIG_N_OBS = 4_000_000


def _hist_table_cap(n_obs: int) -> int:
    """Histogram-vs-sort dispatch cap as a function of the observation
    count (measured crossovers: ~35k images at 1M obs, ~75k at 10M —
    image_axis_probe.py; past the cap the sort's flat ~3.5 ms/10M-obs
    cost wins and the multi-chip shard axis is the scaling lever)."""
    return MAX_HIST_TABLE_BIG_N if n_obs >= BIG_N_OBS else MAX_HIST_TABLE
# one-hot MXU gather forward for windowless id layouts (the Laue
# group-contiguous refl gather): cost ~ N * table_rows MXU-issue rows, so it
# beats the ~6.7 ms/M element-serialized take up to ~1500 table rows
# (measured 1.8 ms/M at 391 rows, benchmarks/gather_probe.py); capped with
# margin
MAX_MXU_GATHER_ROWS = 1024
# apply backward permutations by a stable key sort instead of jnp.take:
# lax.sort_key_val moves 1M elements in 1.9 ms on v5e vs 6.9 ms for the
# element-serialized take (gather_probe.py). Only pays off on TPU at scale.
SORT_PERMUTE_MIN_N = 65536


@partial(jax.tree_util.register_dataclass,
         data_fields=("pos", "cp2d", "cp_bases"),
         meta_fields=("cp_window",))
@dataclass(frozen=True)
class BoundaryPlan:
    """Static plan for the segment-sum boundary lookups.

    The backward segment sum needs the exclusive prefix sum at the T+1
    positions p = [starts..., n]. ends[t] == starts[t+1] always (both are
    searchsorted counts), so ONE boundary vector suffices — half the
    gathers of the naive at(ends) - at(starts). The chunk-prefix half of
    the two-level cumsum is additionally resolved by the windowed Pallas
    kernel (positions are sorted, so windows are ~1 row wide); the
    local-cumsum half stays an XLA take of T+1 elements.

    pos:       (T+1,) int32 sorted boundary positions
    cp2d/...:  windowed-gather form of pos // _CHUNK over the (m,)-sized
               chunk-prefix table; cp_window == 0 -> XLA take fallback
    """

    pos: Array
    cp2d: Optional[Array] = None
    cp_bases: Optional[Array] = None
    cp_window: int = 0


@partial(jax.tree_util.register_dataclass,
         data_fields=("perm", "starts", "ends", "ids2d", "bases", "bnd",
                      "sort_keys", "perm_plan"),
         meta_fields=("window", "hist", "mxu", "stream", "block_rows"))
@dataclass(frozen=True)
class GatherPlan:
    """Static transpose/window plan for gathering `table[ids]`.

    perm:   argsort of ids (None when ids are already sorted — the permute
            in the backward pass is skipped)
    starts: (T,) first position of id t in sorted order
    ends:   (T,) one past the last position of id t
    ids2d:  (R, 128) ids padded/tiled for the forward kernel (None = no kernel)
    bases:  (R // rows_per_tile,) int32 window base row per tile
    bnd:    boundary plan for the segment-sum backward (None = legacy
            at(ends) - at(starts) with 4 XLA takes)
    sort_keys: (n,) int32 raw ids — backward permute runs as a stable
            lax.sort_key_val on these instead of the element-serialized
            take(perm) at TPU scale (see SORT_PERMUTE_MIN_N); only
            consulted when perm is not None
    perm_plan: windowed-kernel plan (ids2d/bases/window only) for APPLYING
            `perm` as a gather over the observation axis — set when the
            permutation is quasi-identity (the Laue chain layout), where
            the windowed kernel beats the sort ~4x; checked before
            sort_keys
    window: static window size in 128-entry chunks (0 = no windowed kernel)
    hist:   backward uses the one-hot-matmul histogram (small unsorted
            tables: MXU beats the permuted segment-sum ~3.5x, measured)
    mxu:    forward uses the one-hot MXU gather (windowless layouts with a
            VMEM-scale table, e.g. the Laue group-contiguous refl gather:
            2.6x faster than the element-serialized take, gather_probe.py)
    """

    perm: Optional[Array]
    starts: Array
    ends: Array
    ids2d: Optional[Array] = None
    bases: Optional[Array] = None
    bnd: Optional[BoundaryPlan] = None
    sort_keys: Optional[Array] = None
    perm_plan: Optional["GatherPlan"] = None
    window: int = 0
    hist: bool = False
    mxu: bool = False
    # windowed kernel streams its table window from HBM per tile
    # (table_gather.windowed_gather_stream) — set when the table exceeds
    # the VMEM cap but the windows are tight (chain perm at 10M obs)
    stream: bool = False
    # windowed-kernel tile height (rows of 128): quasi-identity
    # permutation layouts measure fastest at 16 (their window's
    # structural floor is the tile height itself: 0.384 vs 0.545 ms/M at
    # 64); windowed table gathers keep the default 64
    block_rows: int = 64


def make_boundary_plan(starts: np.ndarray, n: int) -> BoundaryPlan:
    """Precompute the segment-sum boundary lookups for a sorted-id plan."""
    pos = np.concatenate([np.asarray(starts, np.int64),
                          [n]]).astype(np.int32)
    m = (n + _CHUNK) // _CHUNK
    cp_ids = (pos // _CHUNK).astype(np.int32)
    cp2d, cp_bases, cp_window = _plan_windows(cp_ids, m, True, warn=False)
    return BoundaryPlan(pos=pos, cp2d=cp2d, cp_bases=cp_bases,
                        cp_window=cp_window)


def make_gather_plan(ids, table_size: int) -> GatherPlan:
    """Host-side plan construction (numpy; ids must be in [0, table_size))."""
    ids = np.asarray(ids).reshape(-1)
    n = len(ids)
    is_sorted = bool(np.all(ids[1:] >= ids[:-1])) if n > 1 else True
    if is_sorted:
        perm = None
        sorted_ids = ids
    else:
        perm = np.argsort(ids, kind="stable").astype(np.int32)
        sorted_ids = ids[perm]
    rng = np.arange(table_size)
    starts = np.searchsorted(sorted_ids, rng, side="left").astype(np.int32)
    ends = np.searchsorted(sorted_ids, rng, side="right").astype(np.int32)

    # suppress the fallback warning when the one-hot MXU forward will take
    # over anyway (windowless layouts over VMEM-scale tables)
    table_rows = -(-table_size // LANES)
    mxu_ok = table_rows <= MAX_MXU_GATHER_ROWS
    stream = False
    if table_rows > MAX_TABLE_ROWS:
        # table beyond the VMEM cap: try the STREAMING kernel (per-tile
        # window DMA from HBM) — tight windows still require (quasi-)
        # sorted ids, checked by the window computation itself
        ids2d, bases, window = _plan_windows(
            ids, table_size, is_sorted, warn=False,
            max_rows=MAX_STREAM_TABLE_ROWS)
        stream = window > 0
        if not stream and n > 0:
            logger.warning(
                "gather table too large for the windowed TPU kernel "
                "(%d rows, ~%.1fM entries) and ids do not window: forward "
                "falls back to the XLA dynamic gather. Consider sharding "
                "over more devices (--num-devices).",
                table_rows, table_size / 1e6)
    else:
        ids2d, bases, window = _plan_windows(ids, table_size, is_sorted,
                                             warn=not mxu_ok)
    mxu = False
    if ids2d is None and mxu_ok:
        # windowless layout (ids too spread) but the table is VMEM-scale:
        # forward via the one-hot MXU gather instead of the serialized take
        ids2d = _pad_ids2d(ids)
        mxu = True
    # forward (window/mxu) and backward (hist) choices are independent:
    # e.g. a mid-size image table takes the mxu one-hot forward AND the
    # histogram backward
    hist = (not is_sorted and ids2d is not None
            and table_size <= _hist_table_cap(n))
    return GatherPlan(
        perm=None if perm is None else perm,
        starts=starts, ends=ends,
        ids2d=ids2d, bases=bases, window=window, hist=hist, mxu=mxu,
        stream=stream,
        # dead weight when the permute is identity (sorted training rows):
        # _apply_perm never reads keys with perm None
        sort_keys=None if is_sorted else ids.astype(np.int32),
        bnd=make_boundary_plan(starts, n))


def _pad_ids2d(ids: np.ndarray) -> np.ndarray:
    """(n,) -> (R, 128) BLOCK_OBS-aligned id tiles (padding id 0)."""
    n = len(ids)
    rows = -(-n // LANES)
    rows_pad = -(-rows // (BLOCK_OBS // LANES)) * (BLOCK_OBS // LANES)
    flat = np.zeros(rows_pad * LANES, np.int32)
    flat[:n] = ids
    return flat.reshape(rows_pad, LANES)


def _plan_windows(ids, table_size: int, is_sorted: bool, warn: bool = True,
                  max_chunks: int = MAX_WINDOW_CHUNKS,
                  max_rows: int = MAX_TABLE_ROWS,
                  block_obs: int = BLOCK_OBS):
    """Per-tile window bases for the forward kernel (None triple when the
    kernel is not applicable). max_chunks overrides the default give-up
    width (quasi-identity permutation layouts legitimately need >= 64
    chunks: a tile of 8192 consecutive positions alone spans 64);
    max_rows > MAX_TABLE_ROWS plans for the STREAMING kernel variant
    (per-tile window DMA from HBM, table_gather.windowed_gather_stream)
    — callers must then set the plan's `stream` flag."""
    n = len(ids)
    table_rows = -(-table_size // LANES)
    if n == 0 or table_rows > max_rows:
        if n > 0 and warn:
            logger.warning(
                "gather table too large for the windowed TPU kernel "
                "(%d rows > %d, ~%.1fM entries): forward falls back to the "
                "XLA dynamic gather. Consider sharding over more devices "
                "(--num-devices) so per-shard tables fit in VMEM.",
                table_rows, MAX_TABLE_ROWS, table_size / 1e6)
        return None, None, 0
    rows = -(-n // LANES)
    rows_pad = -(-rows // (block_obs // LANES)) * (block_obs // LANES)
    # pad with the LAST id, never 0: on sorted/quasi-sorted layouts a
    # 0-pad makes the final tile span the whole table (its window covers
    # [0, max id]), silently disqualifying the kernel (round-5 chain-layout
    # regression); for truly unsorted ids the choice is indifferent
    pad_value = ids[-1]
    flat = np.full(rows_pad * LANES, pad_value, np.int32)
    flat[:n] = ids
    ids2d = flat.reshape(rows_pad, LANES)

    n_tiles = rows_pad * LANES // block_obs
    tiles = flat.reshape(n_tiles, block_obs)
    lo = tiles.min(axis=1) // LANES
    hi = tiles.max(axis=1) // LANES
    window = int((hi - lo).max()) + 1
    if window > max_chunks:
        if table_rows <= max_chunks:
            # small table: cover it whole from every tile
            lo = np.zeros(n_tiles, np.int64)
            window = table_rows
        elif not warn:
            return None, None, 0
        else:
            logger.warning(
                "gather ids too spread for the windowed TPU kernel "
                "(worst tile spans %d chunks > %d): forward falls back to "
                "the XLA dynamic gather. Sorting observations by id keeps "
                "windows tight.", window, MAX_WINDOW_CHUNKS)
            return None, None, 0
    # clamp so [base, base+window) stays inside the padded table
    bases = np.minimum(lo, max(table_rows - window, 0)).astype(np.int32)
    return ids2d, bases, int(window)


_CHUNK = 512  # cumsum reset interval (see precision note below)


def _onehot_histogram(ct: Array, ids2d: Array, table_size: int) -> Array:
    """Duplicate-index scatter-add as a two-level hi/lo MXU histogram.

    The naive one-hot matmul (ct (1,K) @ onehot (K,T)) is bound by GENERATING
    the K*T one-hot on the VPU (2G comparisons for 1M x 2048 — measured
    2x1.95 ms on v5e). Factor the id instead: id = hi*W + lo. Per
    observation tile,

        A[h, k] = ct[k] * [hi_k == h]     (t_rows x K, t_rows = ceil(T/W))
        B[k, l] = [lo_k == l]             (K x W)
        tile histogram = A @ B            ((t_rows, W) = the whole table)

    so the comparison count drops from K*T to K*(T/W + W) and the MXU
    contraction does the rest. Row h of A@B collects exactly the entries
    with hi==h into lanes lo — every (h, l) pair is one table id.

    Both factors materialize in HBM as dot operands, so the traffic is
    K*(T/W + W)*4 bytes — minimized at W ~ sqrt(T), NOT at the lane width:
    W=64 measures 0.49 ms/M at T=2000 vs 0.97 for W=128 (same 7e-8 error).

    Precision: operands stay f32 with HIGHEST matmul precision (the one-hot
    factors are exact in any dtype; ct keeps full mantissa). Measured on
    v5e: ~6x faster than the bf16-split one-hot it replaces AND ~1000x more
    accurate (see benchmarks/PERF_NOTES.md).
    """
    total = ids2d.size
    # balance the two factors' traffic: W = power of two at/above sqrt(T)
    # (ceil matches the measured-best W=64 at T=2000), clamped to the
    # measured-good range
    w = int(2 ** np.ceil(np.log2(max(np.sqrt(table_size), 1))))
    w = min(max(w, 16), 128)
    t_rows = -(-table_size // w)
    ct = jnp.concatenate([ct, jnp.zeros(total - ct.shape[0], ct.dtype)])
    v = ct.reshape(-1, BLOCK_OBS)
    ii = ids2d.reshape(-1, BLOCK_OBS)
    hi_iota = jnp.arange(t_rows, dtype=ids2d.dtype)
    lo_iota = jnp.arange(w, dtype=ids2d.dtype)

    def body(acc, args):
        vv, idx = args
        hi = idx // w
        lo = idx % w
        a = vv[None, :] * (hi[None, :] == hi_iota[:, None])  # (t_rows, K)
        b = (lo[:, None] == lo_iota[None, :]).astype(vv.dtype)  # (K, W)
        return acc + jnp.dot(a, b, preferred_element_type=jnp.float32,
                             precision=jax.lax.Precision.HIGHEST), ()

    # unroll: the per-tile body is ~30 us of VPU+MXU work; at 100+ tiles the
    # scan's per-iteration sequencing overhead is comparable, so let XLA
    # software-pipeline 8 tiles at a time
    out, _ = jax.lax.scan(
        body, jnp.zeros((t_rows, w), jnp.float32), (v, ii),
        unroll=min(8, v.shape[0]))
    return out.reshape(t_rows * w)[:table_size]


def _onehot_gather(table: Array, ids2d: Array, table_size: int) -> Array:
    """out[k] = table[ids[k]] as one MXU matmul per tile (order-independent).

    Factor the id: id = hi*128 + lo. Per BLOCK_OBS-tile,
        rows[k, :] = onehot(hi_k) @ table2d      ((K, t_rows) @ (t_rows, 128))
        out[k]     = sum_l rows[k, l] * [lo_k == l]   (VPU one-hot reduce)
    Measured on v5e at 1M ids / 391 table rows: 1.8 ms vs 6.9 ms for the
    element-serialized XLA take (gather_probe.py). HIGH matmul precision
    keeps table values to ~1.5e-5 relative (bf16x3 value split) — far below
    the ELBO's MC noise; HIGHEST would be exact but is 1.45x slower.
    """
    t_rows = -(-table_size // LANES)
    total = t_rows * LANES
    table2d = jnp.concatenate(
        [table, jnp.zeros(total - table.shape[0], table.dtype)]
    ).reshape(t_rows, LANES)
    hi_iota = jnp.arange(t_rows, dtype=ids2d.dtype)
    lo_iota = jnp.arange(LANES, dtype=ids2d.dtype)
    tiles = ids2d.reshape(-1, BLOCK_OBS)

    def body(c, idx):
        hi = idx // LANES
        lo = idx % LANES
        a = (hi[:, None] == hi_iota[None, :]).astype(jnp.float32)
        rows = jnp.dot(a, table2d, preferred_element_type=jnp.float32,
                       precision=jax.lax.Precision.HIGH)
        out = jnp.sum(rows * (lo[:, None] == lo_iota[None, :]), axis=1)
        return c, out

    _, outs = jax.lax.scan(body, 0.0, tiles)
    return outs.reshape(-1)


def _use_sort_permute(n: int) -> bool:
    """Sort beats the element-serialized take only on TPU at scale (tests
    monkeypatch this to force the branch on the CPU mesh)."""
    return n >= SORT_PERMUTE_MIN_N and jax.default_backend() == "tpu"


def _apply_perm(contrib: Array, plan: GatherPlan) -> Array:
    """Reorder contributions into table-id order (the backward permute).

    Quasi-identity permutations (the Laue chain layout) carry a windowed
    kernel plan and run as a tight-window gather over the observation axis
    (~4x faster than the sort, same values since the permutation is
    exact). Otherwise at TPU scale a stable key-sort on the raw ids beats
    the element-serialized take(perm) ~3.6x (gather_probe.py); stability
    makes it bit-identical to take(argsort(ids, stable))."""
    if plan.perm is None:
        return contrib
    n = contrib.shape[-1]
    pp = plan.perm_plan
    if pp is not None and pp.window > 0:
        from .table_gather import windowed_gather, windowed_gather_stream
        gather = windowed_gather_stream if pp.stream else windowed_gather

        def one(row):
            return gather(row, pp.ids2d, pp.bases, pp.window,
                          pp.block_rows)[:n]
        if contrib.ndim == 1:
            return one(contrib)
        lead = contrib.shape[:-1]
        flat = contrib.reshape((-1, n))
        rows = [one(flat[s]) for s in range(flat.shape[0])]
        return jnp.stack(rows).reshape(lead + (n,))
    if plan.sort_keys is not None and _use_sort_permute(n):
        # sort FLAT rows one at a time: XLA's batched sort on (S, N) runs
        # ~7x slower than S independent 1-D sorts (measured 13.9 vs 1.9 ms
        # at (1, 1M) on v5e); S = mc_samples is small, so unrolling is free
        lead = contrib.shape[:-1]
        flat = contrib.reshape((-1, n))
        rows = [jax.lax.sort_key_val(plan.sort_keys, flat[s])[1]
                for s in range(flat.shape[0])]
        c_sorted = rows[0] if not lead else jnp.stack(rows)
        return c_sorted.reshape(lead + (n,))
    return jnp.take(contrib, plan.perm, axis=-1)


def segment_sum_by_plan(contrib: Array, plan: GatherPlan) -> Array:
    """sum of contrib over each id's segment: the scatter-add closed form.

    contrib may have leading batch axes; the segmented axis is the last one.
    When plan.perm is None the contributions are already in table-id order
    and the permute is skipped (the sorted training path).

    Precision: a single global f32 cumsum grows to sum(|contrib|) magnitude,
    so boundary differences for short segments lose ~|cs|*eps absolute
    accuracy. The cumsum is therefore two-level: exact-cancelling local
    cumsums within _CHUNK-sized chunks plus a chunk-prefix term — for the
    (overwhelmingly common) segments contained in one chunk, the large
    chunk prefix cancels exactly and the error is bounded by the local
    chunk magnitude.
    """
    if plan.hist and contrib.ndim == 1 and plan.ids2d is not None:
        return _onehot_histogram(contrib, plan.ids2d, plan.starts.shape[0])
    c_sorted = _apply_perm(contrib, plan)
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

    bnd = plan.bnd
    if bnd is not None:
        # single boundary vector p = [starts..., n] (ends[t] == starts[t+1],
        # see BoundaryPlan): ONE take of T+1 local-cumsum values...
        local_at = jnp.take(local_excl, bnd.pos, axis=-1)
        n_pos = bnd.pos.shape[0]
        if bnd.cp_window > 0:
            # ...plus a windowed-kernel resolve of the chunk-prefix half
            # (positions sorted -> ~1-row windows; the XLA element take
            # here costs ~6.7 ms/M elements, the kernel ~0.02)
            from .table_gather import windowed_gather

            def gather1(t):
                return windowed_gather(t, bnd.cp2d, bnd.cp_bases,
                                       bnd.cp_window)
            if lead:
                cp_flat = chunk_prefix.reshape((-1, chunk_prefix.shape[-1]))
                cp_at = jax.vmap(lambda t: gather1(t)[:n_pos])(cp_flat)
                cp_at = cp_at.reshape(lead + (n_pos,))
            else:
                cp_at = gather1(chunk_prefix)[:n_pos]
        else:
            cp_at = jnp.take(chunk_prefix, bnd.pos // _CHUNK, axis=-1)
        cs_b = local_at + cp_at
        return cs_b[..., 1:] - cs_b[..., :-1]

    def at(pos):  # exclusive prefix sum at pos in [0, n]
        return (jnp.take(chunk_prefix, pos // _CHUNK, axis=-1)
                + jnp.take(local_excl, pos, axis=-1))

    return at(plan.ends) - at(plan.starts)


# --------------------------------------------------------------------------
# XLA-forward path (batched tables / no window plan)
# --------------------------------------------------------------------------
@partial(jax.custom_vjp, nondiff_argnums=(0,))
def _plan_gather(hist, table, ids, perm, starts, ends, ids2d, bnd, keys, pp):
    return jnp.take(table, ids, axis=-1)


def _plan_gather_fwd(hist, table, ids, perm, starts, ends, ids2d, bnd, keys,
                     pp):
    return (jnp.take(table, ids, axis=-1),
            (perm, starts, ends, ids2d, bnd, keys, pp))


def _plan_gather_bwd(hist, res, ct):
    perm, starts, ends, ids2d, bnd, keys, pp = res
    dtable = segment_sum_by_plan(
        ct, GatherPlan(perm=perm, starts=starts, ends=ends, ids2d=ids2d,
                       hist=hist, bnd=bnd, sort_keys=keys, perm_plan=pp))
    return (dtable, None, None, None, None, None, None, None, None)


_plan_gather.defvjp(_plan_gather_fwd, _plan_gather_bwd)


# --------------------------------------------------------------------------
# One-hot MXU forward path (windowless ids over a VMEM-scale table — the
# Laue group-contiguous refl gather)
# --------------------------------------------------------------------------
@partial(jax.custom_vjp, nondiff_argnums=(0, 1, 2))
def _mxu_plan_gather(n, table_size, hist, table, ids2d, perm, starts, ends,
                     bnd, keys, pp):
    return _onehot_gather(table, ids2d, table_size)[:n]


def _mxu_fwd(n, table_size, hist, table, ids2d, perm, starts, ends, bnd,
             keys, pp):
    out = _mxu_plan_gather(n, table_size, hist, table, ids2d, perm, starts,
                           ends, bnd, keys, pp)
    return out, (perm, starts, ends, ids2d, bnd, keys, pp)


def _mxu_bwd(n, table_size, hist, res, ct):
    perm, starts, ends, ids2d, bnd, keys, pp = res
    dtable = segment_sum_by_plan(
        ct, GatherPlan(perm=perm, starts=starts, ends=ends, ids2d=ids2d,
                       hist=hist, bnd=bnd, sort_keys=keys, perm_plan=pp))
    return dtable, None, None, None, None, None, None, None


_mxu_plan_gather.defvjp(_mxu_fwd, _mxu_bwd)


# --------------------------------------------------------------------------
# Pallas-forward path (1-D table with a window plan)
# --------------------------------------------------------------------------
@partial(jax.custom_vjp, nondiff_argnums=(0, 1, 2, 3))
def _windowed_plan_gather(window, n, hist, stream, table, ids2d, bases,
                          perm, starts, ends, bnd, keys, pp):
    from .table_gather import windowed_gather, windowed_gather_stream
    g = windowed_gather_stream if stream else windowed_gather
    return g(table, ids2d, bases, window)[:n]


def _windowed_fwd(window, n, hist, stream, table, ids2d, bases, perm,
                  starts, ends, bnd, keys, pp):
    out = _windowed_plan_gather(window, n, hist, stream, table, ids2d,
                                bases, perm, starts, ends, bnd, keys, pp)
    return out, (perm, starts, ends, ids2d, bnd, keys, pp)


def _windowed_bwd(window, n, hist, stream, res, ct):
    perm, starts, ends, ids2d, bnd, keys, pp = res
    dtable = segment_sum_by_plan(
        ct, GatherPlan(perm=perm, starts=starts, ends=ends, ids2d=ids2d,
                       hist=hist, bnd=bnd, sort_keys=keys, perm_plan=pp))
    return dtable, None, None, None, None, None, None, None, None


_windowed_plan_gather.defvjp(_windowed_fwd, _windowed_bwd)


# --------------------------------------------------------------------------
# Planned convolve (the transpose of plan_gather): duplicate-index
# scatter-add of per-observation values into same-length id buckets — the
# Laue harmonic convolution (reference likelihoods/laue.py:17-25). Forward
# is the planned segment sum; backward is a planned gather of the cotangent.
# --------------------------------------------------------------------------
@partial(jax.custom_vjp, nondiff_argnums=(0, 1, 2))
def _plan_convolve(window, hist, stream, value, ids, perm, starts, ends,
                   ids2d, bases, bnd, keys):
    return segment_sum_by_plan(
        value, GatherPlan(perm=perm, starts=starts, ends=ends, ids2d=ids2d,
                          hist=hist, bnd=bnd, sort_keys=keys))


def _plan_convolve_fwd(window, hist, stream, value, ids, perm, starts,
                       ends, ids2d, bases, bnd, keys):
    out = _plan_convolve(window, hist, stream, value, ids, perm, starts,
                         ends, ids2d, bases, bnd, keys)
    return out, (ids, ids2d, bases)


def _plan_convolve_bwd(window, hist, stream, res, ct):
    ids, ids2d, bases = res
    if window > 0 and ids.ndim == 1 and ids2d is not None:
        from .table_gather import windowed_gather, windowed_gather_stream
        g = windowed_gather_stream if stream else windowed_gather
        n = ids.shape[0]
        if ct.ndim == 1:
            dv = g(ct, ids2d, bases, window)[:n]
        else:
            # unroll the (small) sample axis: the stream kernel's DMA is
            # not vmappable, and S is mc_samples
            rows = [g(ct[s], ids2d, bases, window)[:n]
                    for s in range(ct.shape[0])]
            dv = jnp.stack(rows)
    else:
        dv = jnp.take(ct, ids, axis=-1)
    return dv, None, None, None, None, None, None, None, None


_plan_convolve.defvjp(_plan_convolve_fwd, _plan_convolve_bwd)


def plan_convolve(value: Array, ids: Array,
                  plan: Optional[GatherPlan]) -> Array:
    """out[..., g] = sum of value[..., o] over o with ids[o] == g, same
    length as value (ids' table size must equal value's last-axis length).
    With a plan, forward runs as the fast segment sum and backward as the
    planned gather; without one, falls back to the XLA scatter-add."""
    if plan is None:
        if value.ndim == 1:
            return jnp.zeros_like(value).at[ids].add(value)
        return jnp.zeros_like(value).at[..., ids].add(value)
    # hist is tuned for small tables; here table_size == n_obs, so the
    # cumsum path is always the right branch
    return _plan_convolve(plan.window, False, plan.stream, value, ids,
                          plan.perm, plan.starts, plan.ends, plan.ids2d,
                          plan.bases, plan.bnd, plan.sort_keys)


def plan_gather(table: Array, ids: Array, plan) -> Array:
    """`jnp.take(table, ids, axis=-1)` with planned fast paths.

    Falls back to a plain gather (XLA scatter transpose) when plan is None —
    e.g. on sharded inputs where the ids are not globally addressable.
    """
    if plan is None:
        return jnp.take(table, ids, axis=-1)
    if isinstance(plan, ChainGatherPlan):
        return _chain_gather(table, ids, plan)
    if plan.window > 0 and table.ndim == 1 and ids.ndim == 1:
        return _windowed_plan_gather(
            plan.window, ids.shape[0], plan.hist, plan.stream, table,
            plan.ids2d, plan.bases, plan.perm, plan.starts, plan.ends,
            plan.bnd, plan.sort_keys, plan.perm_plan)
    if plan.mxu and ids.ndim == 1:
        def one(tab):
            return _mxu_plan_gather(
                ids.shape[0], plan.starts.shape[0], plan.hist, tab,
                plan.ids2d, plan.perm, plan.starts, plan.ends, plan.bnd,
                plan.sort_keys, plan.perm_plan)
        if table.ndim == 1:
            return one(table)
        # batched table (S, T): S = mc_samples is small — unroll
        lead = table.shape[:-1]
        flat = table.reshape((-1, table.shape[-1]))
        outs = [one(flat[s]) for s in range(flat.shape[0])]
        return jnp.stack(outs).reshape(lead + (ids.shape[0],))
    return _plan_gather(plan.hist, table, ids, plan.perm, plan.starts,
                        plan.ends, plan.ids2d, plan.bnd, plan.sort_keys,
                        plan.perm_plan)


# --------------------------------------------------------------------------
# Chain gather (the Laue refl gather on the harmonic-chain layout,
# ops/chain_layout.py): reflections are renumbered so each harmonic chain's
# members hold consecutive table ids and rows are quasi-sorted by the
# renumbered id. The gather then runs as
#
#     z_perm = z_f[sigma]                  (n_refl-sized table permute;
#                                           one-hot MXU / key-sort — ~20x
#                                           smaller than the obs axis)
#     out    = windowed_gather(z_perm, local_ids)   (tight windows)
#
# and the backward segment-sum's permute is quasi-identity, applied with
# the same windowed kernel (perm_plan) instead of a full 1.9 ms/M sort.
# Replaces the round-4 one-hot-forward + sort-backward pipeline (1.8 + 1.9
# ms/M) with ~0.2 + ~0.4 ms/M at 1M obs / 50k refl.
# --------------------------------------------------------------------------
# the quasi-identity backward permutation legitimately spans >= 64 chunks
# (a tile of 8192 consecutive positions alone covers 64); beyond 160 the
# per-tile chunk loop approaches the sort's cost and the sort wins
PERM_WINDOW_CHUNKS = 160
# table cap for the STREAMING windowed kernel (per-tile window DMA from
# HBM — table_gather.windowed_gather_stream): bounded by HBM, not VMEM
MAX_STREAM_TABLE_ROWS = 1 << 20  # 134M entries


@partial(jax.tree_util.register_dataclass,
         data_fields=("sigma", "sigma_inv", "sigma2d", "sigma_inv2d",
                      "inner"),
         meta_fields=("table_size",))
@dataclass(frozen=True)
class ChainGatherPlan:
    """sigma[new] = old (chain renumbering); inner gathers by the
    renumbered local ids with a windowed forward and a quasi-identity
    (perm_plan) backward. Inputs.refl_id and the model tables stay in
    canonical order — the permutation lives entirely in this plan."""

    sigma: Array            # (T,) int32, new -> old
    sigma_inv: Array        # (T,) int32, old -> new
    sigma2d: Optional[Array]      # padded tiles for the one-hot permute
    sigma_inv2d: Optional[Array]
    inner: GatherPlan
    table_size: int


def _permute_table(x: Array, ids: Array, sort_keys: Array,
                   ids2d: Optional[Array], table_size: int) -> Array:
    """out[j] = x[ids[j]] for a PERMUTATION ids (argsort(sort_keys) == ids).
    One-hot MXU for VMEM-scale tables, stable key-sort at scale, plain
    take otherwise (CPU / tiny)."""
    if jax.default_backend() == "tpu" and ids2d is not None:
        if -(-table_size // LANES) <= MAX_MXU_GATHER_ROWS:
            return _onehot_gather(x, ids2d, table_size)[:table_size]
        if table_size >= SORT_PERMUTE_MIN_N:
            return jax.lax.sort_key_val(sort_keys, x)[1]
    return jnp.take(x, ids)


@partial(jax.custom_vjp, nondiff_argnums=(0,))
def _chain_permute(table_size, x, sigma, sigma_inv, sigma2d, sigma_inv2d):
    return _permute_table(x, sigma, sigma_inv, sigma2d, table_size)


def _chain_permute_fwd(table_size, x, sigma, sigma_inv, sigma2d,
                       sigma_inv2d):
    out = _chain_permute(table_size, x, sigma, sigma_inv, sigma2d,
                         sigma_inv2d)
    return out, (sigma, sigma_inv, sigma2d, sigma_inv2d)


def _chain_permute_bwd(table_size, res, ct):
    sigma, sigma_inv, sigma2d, sigma_inv2d = res
    # transpose of a permutation is its inverse permutation
    dx = _permute_table(ct, sigma_inv, sigma, sigma_inv2d, table_size)
    return dx, None, None, None, None


_chain_permute.defvjp(_chain_permute_fwd, _chain_permute_bwd)


def _chain_gather(table: Array, ids: Array, plan: ChainGatherPlan) -> Array:
    inner = plan.inner

    def one(tab):
        z_perm = _chain_permute(plan.table_size, tab, plan.sigma,
                                plan.sigma_inv, plan.sigma2d,
                                plan.sigma_inv2d)
        return _windowed_plan_gather(
            inner.window, ids.shape[0], inner.hist, inner.stream, z_perm,
            inner.ids2d, inner.bases, inner.perm, inner.starts,
            inner.ends, inner.bnd, inner.sort_keys, inner.perm_plan)

    if table.ndim == 1:
        return one(table)
    lead = table.shape[:-1]  # batched table (S, T): S is small — unroll
    flat = table.reshape((-1, table.shape[-1]))
    outs = [one(flat[s]) for s in range(flat.shape[0])]
    return jnp.stack(outs).reshape(lead + (ids.shape[0],))


def make_chain_gather_plan(refl_id, harmonic_id,
                           table_size: int) -> Optional[ChainGatherPlan]:
    """Chain-layout refl-gather plan, or None when the layout does not
    window (rows not chain-ordered, pathological chains, or table/obs
    sizes beyond the kernel caps) — callers fall back to
    make_gather_plan's order-independent paths."""
    from .chain_layout import chain_permutation

    ids = np.asarray(refl_id).reshape(-1)
    n = len(ids)
    if n == 0:
        return None
    sigma, sigma_inv = chain_permutation(ids, harmonic_id, table_size)
    local = sigma_inv[ids]
    is_sorted = bool(np.all(local[1:] >= local[:-1])) if n > 1 else True
    ids2d, bases, window = _plan_windows(local, table_size, is_sorted,
                                         warn=False)
    if ids2d is None or window == 0:
        return None
    perm = perm_plan = None
    sorted_local = local
    if not is_sorted:
        perm = np.argsort(local, kind="stable").astype(np.int32)
        sorted_local = local[perm]
        # measured block policy (benchmarks round-5): 2048-entry tiles for
        # the VMEM perm kernel (window floor = tile height), default 8192
        # for the streaming variant (fewer, larger DMAs)
        stream = -(-n // LANES) > MAX_TABLE_ROWS
        block = BLOCK_OBS if stream else 2048
        p2d, pb, pw = _plan_windows(perm, n, False, warn=False,
                                    max_chunks=PERM_WINDOW_CHUNKS,
                                    max_rows=MAX_STREAM_TABLE_ROWS,
                                    block_obs=block)
        if p2d is None:
            return None  # displacement too large: sort would win anyway
        perm_plan = GatherPlan(perm=None, starts=None, ends=None,
                               ids2d=p2d, bases=pb, window=pw,
                               stream=stream, block_rows=block // LANES)
    rng = np.arange(table_size)
    starts = np.searchsorted(sorted_local, rng, side="left").astype(np.int32)
    ends = np.searchsorted(sorted_local, rng, side="right").astype(np.int32)
    hist = not is_sorted and table_size <= _hist_table_cap(n)
    inner = GatherPlan(
        perm=perm, starts=starts, ends=ends, ids2d=ids2d, bases=bases,
        window=window, hist=hist,
        sort_keys=None if is_sorted else local.astype(np.int32),
        perm_plan=perm_plan, bnd=make_boundary_plan(starts, n))
    mxu_ok = -(-table_size // LANES) <= MAX_MXU_GATHER_ROWS
    return ChainGatherPlan(
        sigma=sigma, sigma_inv=sigma_inv,
        sigma2d=_pad_ids2d(sigma) if mxu_ok else None,
        sigma_inv2d=_pad_ids2d(sigma_inv) if mxu_ok else None,
        inner=inner, table_size=table_size)
