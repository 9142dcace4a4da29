"""Pallas windowed table-gather kernel (the forward of ops/plan_gather.py).

XLA's generic dynamic gather on TPU resolves one element per step (~6.7 ms
per 1M-observation lookup on v5e — the single most expensive op in the
train step, measured). This kernel exploits two static facts about the
merge workload:

- the full table fits in VMEM (n_refl / n_images entries of f32);
- each 8192-observation tile's ids fall in a precomputed window of
  `window` 128-entry table chunks ([base, base+window) rows) — tight when
  observations are sorted by id (the training path sorts by refl_id), or
  the whole table when it is small (image scales).

Per tile the kernel loops over the window's chunks: broadcast the chunk row
across sublanes and resolve ids with ONE same-shape `take_along_axis`
(Mosaic tpu.dynamic_gather, the only in-kernel gather form TPU supports —
jax/_src/pallas/mosaic/lowering.py:_gather_lowering_rule), selecting each
observation's chunk with a vector compare. `window` x (gather + select) per
8192 observations instead of 8192 serialized loads.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANES = 128
BLOCK_ROWS = 64  # 64 x 128 = 8192 observations per grid step


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


def _kernel(window: int):
    def kernel(bases_ref, table_ref, ids_ref, out_ref):
        i = pl.program_id(0)
        base = bases_ref[i]
        ids = ids_ref[:]                        # (BLOCK_ROWS, 128)
        chunk_idx = jax.lax.div(ids, LANES) - base
        lane = jax.lax.rem(ids, LANES)
        acc = jnp.zeros(ids.shape, table_ref.dtype)
        for c in range(window):
            row = table_ref[pl.ds(base + c, 1), :]
            bc = jnp.broadcast_to(row, ids.shape)
            sel = jnp.take_along_axis(bc, lane, axis=1)
            acc = jnp.where(chunk_idx == c, sel, acc)
        out_ref[:] = acc

    return kernel


def _stream_kernel(window: int):
    """Like _kernel, but the table lives in HBM (pl.ANY) and each tile
    DMAs only its [base, base+window) row window into VMEM scratch —
    lifting the whole-table-in-VMEM cap (MAX_TABLE_ROWS) for layouts
    whose windows are tight but whose tables are huge (the chain
    layout's quasi-identity backward permute at 10M observations: the
    'table' is the N-sized contribution array itself)."""
    def kernel(bases_ref, table_ref, ids_ref, out_ref, tbl, sem):
        i = pl.program_id(0)
        base = bases_ref[i]
        copy = pltpu.make_async_copy(
            table_ref.at[pl.ds(base, window), :], tbl, sem)
        copy.start()
        ids = ids_ref[:]
        chunk_idx = jax.lax.div(ids, LANES) - base
        lane = jax.lax.rem(ids, LANES)
        copy.wait()
        acc = jnp.zeros(ids.shape, jnp.float32)
        for c in range(window):
            row = tbl[pl.ds(c, 1), :]
            bc = jnp.broadcast_to(row, ids.shape)
            sel = jnp.take_along_axis(bc, lane, axis=1)
            acc = jnp.where(chunk_idx == c, sel, acc)
        out_ref[:] = acc

    return kernel


@partial(jax.jit, static_argnums=(3, 4))
def windowed_gather_stream(table: jax.Array, ids2d: jax.Array,
                           bases: jax.Array, window: int,
                           block_rows: int = BLOCK_ROWS) -> jax.Array:
    """windowed_gather for tables beyond the VMEM cap: HBM-resident
    table, per-tile window DMA. Same contract as windowed_gather."""
    if _interpret():
        # interpret mode has no VMEM limit; reuse the plain kernel
        return windowed_gather(table, ids2d, bases, window, block_rows)
    # DMA/scratch sublane alignment: round the window to a multiple of 8
    # rows and re-clamp bases (they only move DOWN, so every tile's id
    # range stays inside [base, base + w8))
    w8 = -(-window // 8) * 8
    t = table.shape[0]
    rows = max(-(-t // LANES), w8)
    pad = rows * LANES - t
    table2d = jnp.concatenate(
        [table, jnp.zeros((pad,), table.dtype)]).reshape(rows, LANES)
    bases = jnp.minimum(bases, rows - w8).astype(bases.dtype)
    n_rows = ids2d.shape[0]
    grid = (n_rows // block_rows,)
    out = pl.pallas_call(
        _stream_kernel(w8),
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),        # bases
            pl.BlockSpec(memory_space=pl.ANY),            # table (HBM)
            pl.BlockSpec((block_rows, LANES), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),        # ids tile
        ],
        out_specs=pl.BlockSpec((block_rows, LANES), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n_rows, LANES), table.dtype),
        scratch_shapes=[pltpu.VMEM((w8, LANES), jnp.float32),
                        pltpu.SemaphoreType.DMA],
        interpret=_interpret(),
    )(bases, table2d, ids2d)
    return out.reshape(-1)


@partial(jax.jit, static_argnums=(3, 4))
def windowed_gather(table: jax.Array, ids2d: jax.Array, bases: jax.Array,
                    window: int,
                    block_rows: int = BLOCK_ROWS) -> jax.Array:
    """table[ids] for a (R, 128)-tiled id array with per-tile windows.

    table: (T,) f32 — padded to whole 128-entry rows internally
    ids2d: (R, 128) int32, R a multiple of block_rows (plan-time padding)
    bases: (R // block_rows,) int32 window base ROW per tile, clamped so
           [base, base+window) is inside the padded table
    block_rows: tile height — smaller tiles shrink per-tile windows on
           quasi-identity layouts (the window's structural floor is
           block_rows * 128 / 128 = block_rows chunks), trading grid
           steps for chunk-loop iterations; plan-time picks the minimum
           total work (plan_gather._best_block)
    returns (R * 128,) f32 — caller slices to the real observation count
    """
    t = table.shape[0]
    rows = -(-t // LANES)
    rows = max(rows, window)
    pad = rows * LANES - t
    table2d = jnp.concatenate(
        [table, jnp.zeros((pad,), table.dtype)]).reshape(rows, LANES)
    n_rows = ids2d.shape[0]
    grid = (n_rows // block_rows,)

    out = pl.pallas_call(
        _kernel(window),
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),        # bases
            pl.BlockSpec((rows, LANES), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),        # whole table
            pl.BlockSpec((block_rows, LANES), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),        # ids tile
        ],
        out_specs=pl.BlockSpec((block_rows, LANES), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n_rows, LANES), table.dtype),
        interpret=_interpret(),
    )(bases, table2d, ids2d)
    return out.reshape(-1)
