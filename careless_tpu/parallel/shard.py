"""Data-parallel observation sharding over a 1-D device mesh.

The TPU-native scale-out layer the reference lacks entirely (SURVEY.md §2.0:
"Parallelism strategies in the reference: NONE"). Design per §5.8 and the
BASELINE.json north star:

- the packed Inputs arrays are sharded along the observation (N) axis;
- posterior/scaler parameters are small and stay replicated, so the
  `gather(z_F, refl_id)` in the ELBO is device-local;
- the loss reductions make gradients a sum over shards — XLA SPMD inserts
  the psum over ICI automatically when the jitted step sees sharded inputs
  and replicated params;
- Laue harmonic groups must never straddle a shard boundary (the scatter-add
  in the convolved likelihood is shard-local), so Laue padding is inserted
  at group boundaries;
- padding rows carry mask=0 and contribute exactly zero to the likelihood.
"""
from __future__ import annotations

import logging
from dataclasses import replace as dc_replace
from typing import List, Optional, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..models.base import GatherPlans, Inputs

logger = logging.getLogger(__name__)


def make_mesh(num_devices: int, devices=None, axis_name: str = "obs") -> Mesh:
    devices = devices if devices is not None else jax.devices()
    if num_devices > len(devices):
        raise ValueError(
            f"requested {num_devices} devices but only {len(devices)} available")
    return Mesh(np.array(devices[:num_devices]), (axis_name,))


def pad_inputs_to_multiple(inputs: Inputs, multiple: int) -> Inputs:
    """Pad per-observation arrays so N % multiple == 0.

    Padding rows: refl_id repeats the last row's id (preserves sortedness
    for the per-shard gather plans; their gradient contribution is exactly
    zero because mask=0 zeroes the likelihood), image_id 0, intensities/
    uncertainties 1 (the Laue padding convention, reference
    formatter.py:639-640), own fresh harmonic groups, and mask 0.
    """
    n = inputs.n_obs
    pad = (-n) % multiple
    mask = inputs.mask if inputs.mask is not None else np.ones(n, np.float32)
    if pad == 0 and inputs.mask is not None:
        return inputs
    if pad == 0:
        return inputs._replace(mask=np.asarray(mask, np.float32))

    def pad1(x, value):
        return np.concatenate([
            np.asarray(x), np.full((pad,) + np.shape(x)[1:], value,
                                   dtype=np.asarray(x).dtype)])

    refl_pad_value = int(np.asarray(inputs.refl_id)[-1]) if n > 0 else 0

    harmonic_id = inputs.harmonic_id
    if harmonic_id is not None:
        hid = np.asarray(harmonic_id)
        # fresh singleton groups for padding rows
        harmonic_id = np.concatenate([
            hid, hid.max() + 1 + np.arange(pad, dtype=hid.dtype)])

    return Inputs(
        refl_id=pad1(inputs.refl_id, refl_pad_value),
        image_id=pad1(inputs.image_id, 0),
        file_id=pad1(inputs.file_id, 0),
        metadata=pad1(inputs.metadata, 0.0),
        intensities=pad1(inputs.intensities, 1.0),
        uncertainties=pad1(inputs.uncertainties, 1.0),
        wavelength=(None if inputs.wavelength is None
                    else pad1(inputs.wavelength, 1.0)),
        harmonic_id=harmonic_id,
        mask=pad1(mask, 0.0),
    )


def _laue_group_aligned_order(inputs: Inputs, num_shards: int,
                              n_refl: Optional[int] = None) -> Inputs:
    """Reorder observations so harmonic groups are contiguous, then pad each
    shard to a group boundary. Keeps the scatter-add shard-local.

    The group-compressed intensities (first n_groups rows) must be repacked
    to the new group numbering, exactly like the reference's Laue splitter
    (manager.py:299-343).

    n_refl (chain layouts): shard cuts additionally align to harmonic-CHAIN
    boundaries. A chain whose groups straddle two shards leaves straggler
    rows whose per-shard chain label (min observed refl id) lands far from
    their row position, blowing the per-shard gather windows and silently
    dropping the chain plan (round-5 finding: ONE straggler row per 1M-obs
    shard was enough). Chains are <= ~tens of rows, so balance is
    unaffected.
    """
    hid = np.asarray(inputs.harmonic_id)
    order = np.argsort(hid, kind="stable")
    n = len(hid)
    # group sizes in sorted order
    sorted_hid = hid[order]
    uniq, first_idx, counts = np.unique(sorted_hid, return_index=True,
                                        return_counts=True)
    iobs = np.asarray(inputs.intensities)[: len(uniq)]
    sig = np.asarray(inputs.uncertainties)[: len(uniq)]

    group_chain = None
    if n_refl is not None and len(uniq):
        from ..ops.chain_layout import chain_labels
        rid = np.asarray(inputs.refl_id)
        lab = chain_labels(rid, hid, n_refl)
        # chain label of each group = label of its first row's reflection
        group_chain = lab[rid[order[first_idx]]]

    # assign whole groups (whole CHAINS when known) greedily to shards
    # (balance on row counts, preserving order within shard)
    target = int(np.ceil(n / num_shards))
    shard_rows = [[] for _ in range(num_shards)]
    shard_groups = [[] for _ in range(num_shards)]
    s = 0
    for gi in range(len(uniq)):
        rows = order[first_idx[gi]: first_idx[gi] + counts[gi]]
        chain_boundary = (group_chain is None or gi == 0
                          or group_chain[gi] != group_chain[gi - 1])
        if chain_boundary and s < num_shards - 1 and len(shard_rows[s]) > 0 \
           and len(shard_rows[s]) + len(rows) > target:
            s += 1
        shard_rows[s].extend(rows.tolist())
        shard_groups[s].append(gi)

    width = max(max(len(r) for r in shard_rows),
                max(len(g) for g in shard_groups))

    def build(field, padvalue, dtype, pad_like_last=False):
        out = np.full((num_shards, width) + np.shape(field)[1:], padvalue,
                      dtype=dtype)
        for si, rows in enumerate(shard_rows):
            out[si, : len(rows)] = np.asarray(field)[rows]
            if pad_like_last and rows:
                # padding rows repeat the shard's LAST value: a constant-0
                # refl pad joins the chain of reflection 0 (renumbered to
                # local id ~0) and makes the boundary tile's gather window
                # span the whole table, silently disqualifying the
                # per-shard chain plan at scale (round-5 review finding);
                # pad rows are mask-0 so the value itself never matters
                out[si, len(rows):] = out[si, len(rows) - 1]
        return out.reshape((num_shards * width,) + np.shape(field)[1:])

    new = {
        "refl_id": build(inputs.refl_id, 0, np.int32, pad_like_last=True),
        "image_id": build(inputs.image_id, 0, np.int32),
        "file_id": build(inputs.file_id, 0, np.int32),
        "metadata": build(inputs.metadata, 0.0, np.float32),
        "wavelength": build(inputs.wavelength, 1.0, np.float32),
    }
    # For the convolved likelihood, log-probs live on harmonic-GROUP rows:
    # mask marks the real group rows of each shard (everything else —
    # including the self-scatter rows of padding observations — is zeroed,
    # so no gradient leaks through padding).
    mask = np.zeros((num_shards, width), np.float32)
    for si, groups in enumerate(shard_groups):
        mask[si, : len(groups)] = 1.0
    new["mask"] = mask.reshape(-1)
    # per-shard local harmonic ids offset by shard start so groups stay
    # unique globally but land in their shard's row range
    hid_new = np.zeros((num_shards, width), np.int32)
    intens = np.ones((num_shards, width), np.float32)
    sigma = np.ones((num_shards, width), np.float32)
    for si, (rows, groups) in enumerate(zip(shard_rows, shard_groups)):
        local = {g: j for j, g in enumerate(groups)}
        hid_new[si, : len(rows)] = [
            si * width + local[hid[r]] for r in rows]
        # padding rows scatter into their own fresh (masked-out) groups,
        # numbered CONTIGUOUSLY after the real ones — numbering them by
        # raw row index left a len(rows)-len(groups) id gap that blew the
        # per-shard harmonic plan's gather windows at the boundary tile
        for k, j in enumerate(range(len(rows), width)):
            hid_new[si, j] = si * width + len(groups) + k
        for j, g in enumerate(groups):
            intens[si, j] = iobs[g]
            sigma[si, j] = sig[g]
    return Inputs(
        refl_id=new["refl_id"],
        image_id=new["image_id"],
        file_id=new["file_id"],
        metadata=new["metadata"],
        intensities=intens.reshape(-1),
        uncertainties=sigma.reshape(-1),
        wavelength=new["wavelength"],
        harmonic_id=hid_new.reshape(-1),
        mask=new["mask"],
    )


def _stack_gather_plans(plans: List, n_local: int):
    """Stack per-shard GatherPlans into one plan whose data fields carry a
    leading n_shards axis, with UNIFORM static meta (window/hist) — the
    shard_map body is one program, so every shard must take the same
    branch. Mixed kernel/no-kernel shards degrade uniformly to the XLA
    forward (window 0); the planned backward always survives."""
    from ..ops.plan_gather import GatherPlan

    if any(p.perm is not None for p in plans):
        perm = np.stack([
            np.asarray(p.perm) if p.perm is not None
            else np.arange(n_local, dtype=np.int32) for p in plans])
    else:
        perm = None
    starts = np.stack([np.asarray(p.starts) for p in plans])
    ends = np.stack([np.asarray(p.ends) for p in plans])

    sort_keys = np.stack([np.asarray(p.sort_keys) for p in plans]) \
        if all(p.sort_keys is not None for p in plans) else None

    windows = [p.window for p in plans]
    mxu = False
    stream = False
    if all(w > 0 for w in windows) and all(
            p.ids2d is not None for p in plans) and len(
                {p.stream for p in plans}) == 1:
        window = max(windows)
        stream = plans[0].stream
        ids2d = np.stack([np.asarray(p.ids2d) for p in plans])
        # re-clamp bases for the unified (possibly larger) window: coverage
        # [base, base+window) still contains each tile's id range because
        # base only moves down
        bases = []
        for p in plans:
            t_rows = -(-p.starts.shape[0] // 128)
            bases.append(np.minimum(np.asarray(p.bases),
                                    max(t_rows - window, 0)).astype(np.int32))
        bases = np.stack(bases)
    elif all(p.mxu for p in plans) and all(
            p.ids2d is not None for p in plans):
        # uniform one-hot MXU forward (windowless Laue refl layouts)
        window, bases = 0, None
        ids2d = np.stack([np.asarray(p.ids2d) for p in plans])
        mxu = True
    else:
        window, ids2d, bases = 0, None, None
        if any(w > 0 for w in windows) or any(p.mxu for p in plans):
            logger.debug(
                "gather fast-forward degraded to the XLA take for all %d "
                "shards (mixed window/mxu eligibility)", len(plans))
    # forward (window/mxu) and backward (hist) choices are independent
    hist = all(p.hist for p in plans) and ids2d is not None

    # quasi-identity backward-permute plans (the Laue chain layout) stack
    # like the main windows: uniform max window, bases re-clamped
    pps = [p.perm_plan for p in plans]
    perm_plan = None
    if all(pp is not None and pp.window > 0 and pp.ids2d is not None
           for pp in pps) and len(
               {(pp.stream, pp.block_rows) for pp in pps}) == 1:
        pw = max(pp.window for pp in pps)
        rows_local = -(-n_local // 128)
        perm_plan = GatherPlan(
            perm=None, starts=None, ends=None,
            ids2d=np.stack([np.asarray(pp.ids2d) for pp in pps]),
            bases=np.stack([
                np.minimum(np.asarray(pp.bases),
                           max(rows_local - pw, 0)).astype(np.int32)
                for pp in pps]),
            window=pw, stream=pps[0].stream,
            block_rows=pps[0].block_rows)

    # boundary plans: stack when every shard has one with the windowed
    # chunk-prefix resolve (uniform meta like the main window); otherwise
    # degrade to the take fallback (pos alone still halves the gathers)
    from ..ops.plan_gather import _CHUNK, BoundaryPlan
    bnds = [p.bnd for p in plans]
    bnd = None
    if all(b is not None for b in bnds):
        pos = np.stack([np.asarray(b.pos) for b in bnds])
        cp_windows = [b.cp_window for b in bnds]
        if all(w > 0 for w in cp_windows) and all(
                b.cp2d is not None for b in bnds):
            cp_window = max(cp_windows)
            cp2d = np.stack([np.asarray(b.cp2d) for b in bnds])
            m = (n_local + _CHUNK) // _CHUNK  # chunk-prefix table length
            cp_rows = -(-m // 128)
            cp_bases = np.stack([
                np.minimum(np.asarray(b.cp_bases),
                           max(cp_rows - cp_window, 0)).astype(np.int32)
                for b in bnds])
        else:
            cp2d, cp_bases, cp_window = None, None, 0
            if any(w > 0 for w in cp_windows):
                # uniform-branch requirement: one shard lacking a
                # chunk-prefix window degrades every shard to the XLA take
                # for that half (mirrors the main-window degrade above)
                logger.debug(
                    "boundary-plan chunk-prefix window degraded to the XLA "
                    "take for all %d shards (%d shard(s) lack a window)",
                    len(bnds), sum(1 for w in cp_windows if w == 0))
        bnd = BoundaryPlan(pos=pos, cp2d=cp2d, cp_bases=cp_bases,
                           cp_window=cp_window)
    return GatherPlan(perm=perm, starts=starts, ends=ends, ids2d=ids2d,
                      bases=bases, window=window, hist=hist, mxu=mxu,
                      stream=stream, sort_keys=sort_keys,
                      perm_plan=perm_plan, bnd=bnd)


def _stack_chain_plans(plans: List, n_local: int, n_refl: int):
    """Stack per-shard ChainGatherPlans (leading axis n_shards) with
    uniform static meta, or None when any shard lacks the full windowed
    form (callers fall back to the order-independent stacked plan)."""
    from ..ops.plan_gather import ChainGatherPlan

    if not all(isinstance(p, ChainGatherPlan) and p.inner.perm is not None
               and p.inner.perm_plan is not None
               and p.inner.perm_plan.window > 0 for p in plans):
        return None
    inner = _stack_gather_plans([p.inner for p in plans], n_local)
    if inner.window == 0 or inner.perm_plan is None:
        return None
    use_2d = all(p.sigma2d is not None for p in plans)
    return ChainGatherPlan(
        sigma=np.stack([np.asarray(p.sigma) for p in plans]),
        sigma_inv=np.stack([np.asarray(p.sigma_inv) for p in plans]),
        sigma2d=(np.stack([np.asarray(p.sigma2d) for p in plans])
                 if use_2d else None),
        sigma_inv2d=(np.stack([np.asarray(p.sigma_inv2d) for p in plans])
                     if use_2d else None),
        inner=inner, table_size=n_refl)


def _per_shard_plans(inputs: Inputs, num_shards: int, n_refl: int,
                     n_images: int, mlp_width: Optional[int]
                     ) -> GatherPlans:
    """Build per-shard gather plans (leading axis n_shards) for the
    shard_map training path. `inputs` is the already-laid-out global array
    set (mono: refl-sorted + padded; Laue: group-aligned), whose length is
    a multiple of num_shards."""
    from ..ops.fused_mlp import PackedMeta, pack_metadata
    from ..ops.plan_gather import make_gather_plan

    from ..ops.conv_runs import ConvRunPlan, make_conv_run_plan

    n = inputs.n_obs
    assert n % num_shards == 0, (n, num_shards)
    w = n // num_shards
    refl_id = np.asarray(inputs.refl_id)
    image_id = np.asarray(inputs.image_id)
    metadata = np.asarray(inputs.metadata)
    hid = (np.asarray(inputs.harmonic_id) if inputs.is_laue else None)
    intens = np.asarray(inputs.intensities)
    sig = np.asarray(inputs.uncertainties)
    mask = None if inputs.mask is None else np.asarray(inputs.mask)

    refl_plans, image_plans, harm_plans, run_plans, metas = [], [], [], [], []
    chain_plans = []
    for s in range(num_shards):
        lo, hi = s * w, (s + 1) * w
        refl_plans.append(make_gather_plan(refl_id[lo:hi], n_refl))
        image_plans.append(make_gather_plan(image_id[lo:hi], n_images))
        if hid is not None:
            from ..ops.plan_gather import make_chain_gather_plan
            # chain-layout refl plan (windowed both directions); shards of
            # a chain-ordered layout are contiguous chain-ordered row
            # ranges, so per-shard windows stay tight
            chain_plans.append(make_chain_gather_plan(
                refl_id[lo:hi], hid[lo:hi], n_refl))
            # shard-local group ids (the layout offsets groups by s * w)
            harm_plans.append(make_gather_plan(hid[lo:hi] - lo, w))
            run_plans.append(make_conv_run_plan(
                hid[lo:hi] - lo, intens[lo:hi], sig[lo:hi],
                None if mask is None else mask[lo:hi]))
        if mlp_width is not None:
            metas.append(pack_metadata(metadata[lo:hi], mlp_width))

    refl_stacked = (_stack_chain_plans(chain_plans, w, n_refl)
                    if chain_plans else None)
    if refl_stacked is None:
        refl_stacked = _stack_gather_plans(refl_plans, w)

    harmonic_run = None
    if run_plans and all(r is not None for r in run_plans):
        # uniform static meta: every shard unrolls to the largest run
        harmonic_run = ConvRunPlan(
            start_ll_mask=np.stack([r.start_ll_mask for r in run_plans]),
            run_len=np.stack([r.run_len for r in run_plans]),
            iobs_row=np.stack([r.iobs_row for r in run_plans]),
            sig_row=np.stack([r.sig_row for r in run_plans]),
            tail_mask=np.stack([r.tail_mask for r in run_plans]),
            max_run=max(r.max_run for r in run_plans))

    meta = None
    if metas:
        meta = PackedMeta(
            x2d=np.stack([m.x2d for m in metas]),
            n=metas[0].n, d_in=metas[0].d_in,
            d_slot=metas[0].d_slot, group=metas[0].group)
    return GatherPlans(
        refl=refl_stacked,
        image=_stack_gather_plans(image_plans, w),
        meta=meta,
        harmonic=(_stack_gather_plans(harm_plans, w) if harm_plans
                  else None),
        harmonic_run=harmonic_run)


def prepare_sharded_layout(inputs: Inputs, num_shards: int,
                           n_refl: Optional[int] = None) -> Inputs:
    """The global array layout the sharded path trains on: mono inputs are
    refl-sorted (tight per-shard gather windows) and padded to a multiple
    of num_shards; Laue inputs are harmonic-group-aligned per shard — in
    the chain order (ops/chain_layout.py) when n_refl is known, matching
    the single-device layout so per-shard refl gathers window. Used by
    shard_inputs_over_mesh and by the shard-invariance tests (the 1-device
    reference must see the SAME layout so per-row MC noise matches)."""
    inputs = inputs._replace(plans=None, shard_plans=None)
    if inputs.is_laue:
        if n_refl is not None and inputs.mask is None:
            # chain order survives the group-aligned re-sort below (groups
            # are renumbered to chain order, and the stable argsort by
            # group id preserves it)
            inputs = inputs.sorted_by_harmonic(n_refl)
        return _laue_group_aligned_order(inputs, num_shards, n_refl=n_refl)
    if inputs.n_obs > 1:
        rid = np.asarray(inputs.refl_id)
        if not bool(np.all(rid[1:] >= rid[:-1])):
            inputs = inputs.sorted_by_refl()
    return pad_inputs_to_multiple(inputs, num_shards)


def shard_inputs_over_mesh(inputs: Inputs, num_devices: int, devices=None,
                           *, n_refl: Optional[int] = None,
                           n_images: Optional[int] = None,
                           mlp_width: Optional[int] = None
                           ) -> Tuple[Inputs, Mesh]:
    """Place the packed inputs on an 'obs'-sharded mesh; returns the
    device-resident Inputs and the mesh.

    When the global table sizes are supplied, per-shard gather plans are
    attached as `shard_plans` (leading axis = shard), keeping the planned
    gathers/scatters and the fused Pallas kernels alive inside the
    shard_map training path — without them, every fast path degraded to
    element-serialized XLA gathers (the round-2 multi-chip regression)."""
    mesh = make_mesh(num_devices, devices)
    inputs = prepare_sharded_layout(inputs, num_devices, n_refl=n_refl)
    if n_refl is not None and n_images is not None:
        inputs = inputs._replace(shard_plans=_per_shard_plans(
            inputs, num_devices, n_refl, n_images, mlp_width))
    sharding = NamedSharding(mesh, P("obs"))

    def put_rows(x):
        if x is None:
            return None
        return jax.device_put(np.asarray(x), sharding)

    def put_stacked(x):
        # plan leaves carry the shard axis first; trailing dims replicated
        spec = P(*(("obs",) + (None,) * (np.ndim(x) - 1)))
        return jax.device_put(np.asarray(x), NamedSharding(mesh, spec))

    shard_plans = (None if inputs.shard_plans is None else jax.tree.map(
        put_stacked, inputs.shard_plans))
    data = Inputs(*[put_rows(x) for x in inputs[:-Inputs._N_PLAN_FIELDS]])
    return data._replace(shard_plans=shard_plans), mesh
