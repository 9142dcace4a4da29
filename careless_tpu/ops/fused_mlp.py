"""Fused Pallas kernel for the scaling-MLP trunk (the step's main MXU work).

The reference-default scaler is a 20-layer width-10 MLP over every
observation's metadata (/root/reference/careless/models/scaling/nn.py:55-90,
args/scaling.py:21-31). Executed layer-by-layer in XLA that is ~60 tiny
dispatches per train step (20 forward + 40 backward matmuls), each far too
small to fill the MXU pipeline — measured 2.3 ms of a 3.7 ms step on v5e at
100k observations, i.e. ~7x above its FLOP cost.

This kernel runs the ENTIRE trunk in one pallas_call per direction:

- observations are lane-packed g-per-row exactly like MLPScaler's pack
  layout (nn.py block_diag): row r of the (R, 128) activation tile holds g
  observations' width-D feature vectors side by side, and every layer's
  (D, D) weight is expanded to a block-diagonal (g*D, g*D) matrix padded to
  128x128 — one (BR, 128) x (128, 128) MXU matmul computes g*BR
  observations' layer;
- all L padded weights live in VMEM for the whole grid (L x 64 KB);
- the backward kernel recomputes the forward activations in VMEM (they
  never touch HBM — stashing them was measured slower, see _bwd_kernel)
  and accumulates dW/db across grid steps in the output block, emitting
  dx per block;
- the kernel is MXU-ISSUE-bound (~1 row/cycle/chain; f32 and bf16 issue
  identically on v5e, benchmarks/mxu_probe.py — the bf16 option cannot
  speed it up), so each block is processed as independent SPLIT_ROWS-row
  chains, giving the scheduler per-layer matmuls to overlap across MXUs.

Zero-padding (rows beyond N/g, lanes beyond g*D) is self-consistent: padded
input columns are zero, padded weight rows/cols are zero, and the upstream
cotangent for sliced-away rows is zero, so no gradient leaks.
"""
from __future__ import annotations

from dataclasses import dataclass
from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANES = 128
BLOCK_ROWS = 512
# rows per independent matmul chain within a block: the layer loop is a
# sequential dependence chain, and a single chain issues ~1 MXU row/cycle;
# 2 chains of 256 rows give the scheduler independent matmuls to overlap
# (v5e sweep, benchmarks/trunk_sweep.py: 512/256 = 5.62 ms vs 512/512 =
# 5.71, 512/128 = 5.84, 256/128 = 6.17 at 1M obs; the chip's practical
# peak is ~110 TF for ANY precision — f32 and bf16 time identically, so
# bf16 operands cannot speed this up, benchmarks/mxu_probe.py)
SPLIT_ROWS = 256


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


def _dot(a, b, bf16: bool, dims=None):
    """MXU matmul; bf16 operands with f32 accumulation when requested.
    Measured on v5e: NO rate difference vs f32 (f32 matmuls already run at
    the bf16 MXU rate; the kernel is issue-rate-bound — mxu_probe.py). The
    operands here are O(1) standardized metadata activations and
    near-identity weights, well inside bf16 range, so the option is safe
    where it does help (memory-bound wide trunks, other TPU generations).
    """
    if bf16:
        a = a.astype(jnp.bfloat16)
        b = b.astype(jnp.bfloat16)
    if dims is None:
        return jnp.dot(a, b, preferred_element_type=jnp.float32)
    return jax.lax.dot_general(a, b, dimension_numbers=dims,
                               preferred_element_type=jnp.float32)


def _split_slices(total_rows: int):
    n = max(1, total_rows // SPLIT_ROWS)
    step = total_rows // n
    # fail loudly on constant combinations that would leave trailing rows
    # uncovered (e.g. SPLIT_ROWS=96 -> 5 chains of 102 rows, 2 rows lost)
    assert step * n == total_rows, (total_rows, SPLIT_ROWS, n, step)
    return [slice(j * step, (j + 1) * step) for j in range(n)]


def _fwd_kernel(n_layers: int, leakiness: float, bf16: bool,
                head: bool = False):
    total = n_layers + (1 if head else 0)

    def kernel(x_ref, w_ref, b_ref, out_ref):
        # independent row-chains (see SPLIT_ROWS): each chain's layer loop
        # is a sequential MXU dependence; chains overlap in the scheduler
        sls = _split_slices(x_ref.shape[0])
        hs = [x_ref[s, :] for s in sls]
        for l in range(total):
            wl = w_ref[l]
            bl = b_ref[l:l + 1, :]
            hs = [_dot(h, wl, bf16) + bl for h in hs]
            if l < n_layers:
                # leaky-relu as max(h, a*h) (exact for a in (0,1)): one VPU
                # op fewer than compare+select; the head layer is linear
                hs = [jnp.maximum(h, leakiness * h) for h in hs]
        for s, h in zip(sls, hs):
            out_ref[s, :] = h
    return kernel


def _bwd_kernel(n_layers: int, leakiness: float, bf16: bool,
                head: bool = False):
    """Recompute-in-VMEM backward: activations are rebuilt per block from
    x (an extra n_layers matmuls, ~1/3 of the backward's MXU issue) and
    never touch HBM. The stash-to-HBM alternative was measured SLOWER on
    v5e (+1.0 ms at 1M obs): the (L-1, B, 128) stash DMA does not overlap
    — trading issue cycles for serialized HBM traffic loses."""
    total = n_layers + (1 if head else 0)

    def kernel(x_ref, w_ref, b_ref, dy_ref, dx_ref, dw_ref, db_ref):
        i = pl.program_id(0)

        @pl.when(i == 0)
        def _():
            dw_ref[:] = jnp.zeros(dw_ref.shape, dw_ref.dtype)
            db_ref[:] = jnp.zeros(db_ref.shape, db_ref.dtype)

        sls = _split_slices(x_ref.shape[0])
        # recompute forward per chain, keeping every activation in VMEM
        acts = [[x_ref[s, :]] for s in sls]
        for l in range(total):
            wl = w_ref[l]
            bl = b_ref[l:l + 1, :]
            for a in acts:
                h = _dot(a[-1], wl, bf16) + bl
                a.append(jnp.maximum(h, leakiness * h) if l < n_layers
                         else h)

        dhs = [dy_ref[s, :] for s in sls]
        for l in range(total - 1, -1, -1):
            wl = w_ref[l]
            if l < n_layers:
                # leaky_relu'(pre): act and pre share sign (leakiness > 0)
                dpres = [dh * jnp.where(a[l + 1] >= 0, 1.0, leakiness)
                         for dh, a in zip(dhs, acts)]
            else:
                dpres = dhs  # linear head layer
            dw = _dot(acts[0][l], dpres[0], bf16,
                      dims=(((0,), (0,)), ((), ())))
            for a, dpre in zip(acts[1:], dpres[1:]):
                dw += _dot(a[l], dpre, bf16, dims=(((0,), (0,)), ((), ())))
            dw_ref[l] += dw
            db_ref[l:l + 1, :] += sum(
                jnp.sum(dpre, axis=0, keepdims=True) for dpre in dpres)
            dhs = [_dot(dpre, wl, bf16, dims=(((1,), (1,)), ((), ())))
                   for dpre in dpres]
        for s, dh in zip(sls, dhs):
            dx_ref[s, :] = dh
    return kernel


def _specs(n_rows: int, n_layers: int):
    grid = (n_rows // BLOCK_ROWS,)
    blk = lambda: pl.BlockSpec((BLOCK_ROWS, LANES), lambda i: (i, 0),
                               memory_space=pltpu.VMEM)
    w_spec = pl.BlockSpec((n_layers, LANES, LANES), lambda i: (0, 0, 0),
                          memory_space=pltpu.VMEM)
    b_spec = pl.BlockSpec((n_layers, LANES), lambda i: (0, 0),
                          memory_space=pltpu.VMEM)
    return grid, blk, w_spec, b_spec


@partial(jax.custom_vjp, nondiff_argnums=(0, 1, 2, 3))
def _trunk(n_rows, leakiness, bf16, head, x, w, b):
    return _trunk_fwd(n_rows, leakiness, bf16, head, x, w, b)[0]


def _trunk_fwd(n_rows, leakiness, bf16, head, x, w, b):
    total = w.shape[0]
    n_layers = total - (1 if head else 0)
    grid, blk, w_spec, b_spec = _specs(n_rows, total)
    out = pl.pallas_call(
        _fwd_kernel(n_layers, leakiness, bf16, head),
        grid=grid,
        in_specs=[blk(), w_spec, b_spec],
        out_specs=blk(),
        out_shape=jax.ShapeDtypeStruct((n_rows, LANES), jnp.float32),
        interpret=_interpret(),
    )(x, w, b)
    return out, (x, w, b)


def _trunk_bwd(n_rows, leakiness, bf16, head, res, dy):
    x, w, b = res
    total = w.shape[0]
    n_layers = total - (1 if head else 0)
    grid, blk, w_spec, b_spec = _specs(n_rows, total)
    dx, dw, db = pl.pallas_call(
        _bwd_kernel(n_layers, leakiness, bf16, head),
        grid=grid,
        in_specs=[blk(), w_spec, b_spec, blk()],
        out_specs=(blk(), w_spec, b_spec),
        out_shape=(
            jax.ShapeDtypeStruct((n_rows, LANES), jnp.float32),
            jax.ShapeDtypeStruct((total, LANES, LANES), jnp.float32),
            jax.ShapeDtypeStruct((total, LANES), jnp.float32),
        ),
        interpret=_interpret(),
    )(x, w, b, dy)
    return dx, dw, db


_trunk.defvjp(_trunk_fwd, _trunk_bwd)


@partial(jax.tree_util.register_dataclass,
         data_fields=("x2d",),
         meta_fields=("n", "d_in", "d_slot", "group"))
@dataclass(frozen=True)
class PackedMeta:
    """Host-side pre-packed metadata for the fused trunk: the lane-packed
    (rows, 128) buffer is static per dataset, so packing it in XLA on every
    step (two N*d-sized copies, forward only — metadata takes no gradient)
    is pure waste. Built once by `pack_metadata`, carried in
    Inputs.plans.meta, matched by geometry at trace time (the int fields
    are pytree metadata, so they stay concrete inside jit)."""

    x2d: jax.Array      # (n_rows, 128) f32, BLOCK_ROWS-aligned
    n: int              # real observation count
    d_in: int           # metadata dim it was packed from
    d_slot: int         # per-observation lane slot (max(d_in, width))
    group: int          # observations per row


def pack_geometry(n: int, d_in: int, width: int):
    d_slot = max(d_in, width)
    group = max(1, LANES // d_slot)
    rows_real = -(-n // group)
    n_rows = -(-rows_real // BLOCK_ROWS) * BLOCK_ROWS
    return d_slot, group, n_rows


def pack_metadata(x: np.ndarray, width: int) -> PackedMeta:
    """Pack metadata (N, d) into the fused-trunk lane layout (numpy,
    host-side, once per dataset)."""
    x = np.asarray(x, np.float32)
    n, d_in = x.shape
    d_slot, group, n_rows = pack_geometry(n, d_in, width)
    x_pad = np.zeros((n_rows * group, d_slot), np.float32)
    x_pad[:n, :d_in] = x
    x2d = np.zeros((n_rows, LANES), np.float32)
    x2d[:, :group * d_slot] = x_pad.reshape(n_rows, group * d_slot)
    return PackedMeta(x2d=x2d, n=n, d_in=d_in, d_slot=d_slot, group=group)


def pack_params(layers, d_slot: int, group: int):
    """Stack per-layer (d_in, d_out) weights into block-diagonal padded
    (L, 128, 128) + (L, 128) tensors. Differentiable (pure jnp), so
    gradients flow back to the original parameter pytree."""
    n_layers = len(layers)
    ws = []
    bs = []
    for layer in layers:
        wl, bl = layer["w"], layer["b"]
        d_in, d_out = wl.shape
        w_pad = jnp.zeros((d_slot, d_slot), jnp.float32)
        w_pad = w_pad.at[:d_in, :d_out].set(wl)
        # block-diagonal expansion: slot j maps lanes [j*D, j*D+D)
        eye_g = jnp.eye(group, dtype=jnp.float32)
        w_bd = (eye_g[:, None, :, None] * w_pad[None, :, None, :]
                ).reshape(group * d_slot, group * d_slot)
        w_full = jnp.zeros((LANES, LANES), jnp.float32)
        w_full = w_full.at[:group * d_slot, :group * d_slot].set(w_bd)
        b_pad = jnp.zeros(d_slot, jnp.float32).at[:d_out].set(bl)
        b_full = jnp.zeros(LANES, jnp.float32)
        b_full = b_full.at[:group * d_slot].set(jnp.tile(b_pad, group))
        ws.append(w_full)
        bs.append(b_full)
    return jnp.stack(ws), jnp.stack(bs)


def fused_mlp_trunk(x, layers, leakiness: float, bf16: bool = False,
                    packed: Optional[PackedMeta] = None):
    """Run the full hidden-layer stack over metadata x (N, d) in one Pallas
    kernel pass; returns (N, width) activations. layers: list of {'w','b'}
    with layer 0 mapping d -> width and the rest width -> width.

    packed: pre-packed metadata (pack_metadata) — used instead of x when its
    geometry matches, skipping the per-step XLA packing copies."""
    n, d_in = x.shape
    width = layers[0]["w"].shape[1]
    d_slot, group, n_rows = pack_geometry(n, d_in, width)
    w, b = pack_params(layers, d_slot, group)

    # INVARIANT: a PackedMeta must have been packed from exactly this x.
    # The check is geometric only (x may be traced here, so content cannot
    # be compared at trace time); Inputs.replace() enforces the invariant
    # by dropping plans whenever a plan-source field is replaced.
    x2d = _pack_x2d(x, n, d_in, d_slot, group, n_rows, packed)

    h = _trunk(int(n_rows), float(leakiness), bool(bf16), False, x2d, w, b)

    # unpack: slot j's output lanes [j*D, j*D+width)
    h = h[:, :group * d_slot].reshape(n_rows * group, d_slot)[:n, :width]
    return h


def _pack_x2d(x, n, d_in, d_slot, group, n_rows,
              packed: Optional[PackedMeta]):
    # INVARIANT: a PackedMeta must have been packed from exactly this x
    # (see fused_mlp_trunk); geometric match only — x may be traced here
    if (packed is not None and packed.n == n and packed.d_in == d_in
            and packed.d_slot == d_slot and packed.group == group):
        return packed.x2d
    x_pad = jnp.zeros((n_rows * group, d_slot), jnp.float32)
    x_pad = x_pad.at[:n, :d_in].set(x)
    x2d = jnp.zeros((n_rows, LANES), jnp.float32)
    return x2d.at[:, :group * d_slot].set(
        x_pad.reshape(n_rows, group * d_slot))


def fused_mlp_trunk_head(x, layers, out_layer, leakiness: float,
                         bf16: bool = False,
                         packed: Optional[PackedMeta] = None):
    """Trunk + linear output head in ONE kernel pass, returning FLAT (N,)
    (loc_raw, scale_raw) — never materializing an (N, width) intermediate.

    Rationale (measured, benchmarks/PERF_NOTES.md): XLA lane-pads an
    (N, 10) f32 array to (N, 128) tiles, so every head/unpack pass over the
    old (N, width) intermediate moved ~12.8x the useful bytes — 2.3 ms of
    the 5.6 ms trunk+head fwd+bwd at 1M obs. Folding the head into the
    kernel as one more block-diagonal matmul (no activation) keeps
    everything in the packed (rows, 128) layout; the per-slot (loc, raw)
    lanes are extracted with strided lane slices into flat 1-D arrays,
    which have no lane padding.

    out_layer: {'w': (width, 2), 'b': (2,)} — the reference's final linear
    layer (nn.py:70-90).
    """
    n, d_in = x.shape
    width = layers[0]["w"].shape[1]
    d_slot, group, n_rows = pack_geometry(n, d_in, width)
    w, b = pack_params(list(layers) + [out_layer], d_slot, group)
    x2d = _pack_x2d(x, n, d_in, d_slot, group, n_rows, packed)

    y2d = _trunk(int(n_rows), float(leakiness), bool(bf16), True, x2d, w, b)

    span = group * d_slot
    loc = y2d[:, 0:span:d_slot].reshape(-1)[:n]
    raw = y2d[:, 1:span:d_slot].reshape(-1)[:n]
    return loc, raw


def fused_eligible(x, n_layers: int) -> bool:
    """The kernel pays off for deep trunks on real 2-D batches."""
    return x.ndim == 2 and n_layers >= 2
