"""The packed-input data model: the core internal ABI.

TPU-native redesign of the reference's positional-tuple protocol
(/root/reference/careless/models/base.py:22-31): a typed NamedTuple of flat
jnp arrays (a JAX pytree) instead of index-magic over a bare tuple. Laue data
is detected by the presence of wavelength/harmonic_id (reference: tuple
length, base.py:39-47). All per-observation arrays are 1-D of length N_obs
(the reference's (N,1) column vectors are flattened); metadata is (N, d).

The N axis is the data-parallel shard axis on TPU (SURVEY.md §5.8).
"""
from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import numpy as np

Array = jax.Array


class GatherPlans(NamedTuple):
    """Precomputed fast-transpose plans for the ELBO's static-index gathers
    (ops/plan_gather.py). Derived data: recomputed after any row subsetting."""

    refl: Optional["GatherPlanLike"] = None   # for z_f[refl_id]
    image: Optional["GatherPlanLike"] = None  # for image_scales[image_id]
    meta: Optional["GatherPlanLike"] = None   # ops.fused_mlp.PackedMeta
    harmonic: Optional["GatherPlanLike"] = None  # Laue convolve over harmonic_id
    # gather-free run-aligned Laue convolution for the training-path ll sum
    # (ops/conv_runs.py); harmonic above remains for output-time convolves
    harmonic_run: Optional["GatherPlanLike"] = None


GatherPlanLike = object  # ops.plan_gather.GatherPlan (untyped to avoid a cycle)


class Inputs(NamedTuple):
    """Packed per-observation inputs (mono: first 6 fields; Laue: all 8)."""

    refl_id: Array        # (N,) int32 — global ASU-collection reflection id
    image_id: Array       # (N,) int32 — globally renumbered image
    file_id: Array        # (N,) int32 — input file index
    metadata: Array       # (N, d) f32 — standardized metadata (+ pos. enc.)
    intensities: Array    # (N,) f32 — mono: per-obs; Laue: per-harmonic-group (padded)
    uncertainties: Array  # (N,) f32 — same layout as intensities
    wavelength: Optional[Array] = None    # (N,) f32, Laue only
    harmonic_id: Optional[Array] = None   # (N,) int32, Laue only
    mask: Optional[Array] = None          # (N,) f32, 0 on shard-padding rows
    plans: Optional[GatherPlans] = None   # static gather-transpose plans
    # per-shard plans, each field stacked on a leading n_shards axis and
    # sharded over the mesh (parallel/shard.py). Consumed ONLY by the
    # shard_map training path (variational.py); the plain elbo ignores it,
    # so jit-ing the model directly on sharded inputs still works (XLA
    # auto-SPMD fallback).
    shard_plans: Optional[GatherPlans] = None

    @property
    def is_laue(self) -> bool:
        return self.harmonic_id is not None

    @property
    def n_obs(self) -> int:
        return self.refl_id.shape[0]

    # fields the gather plans are derived from: replacing any of these with
    # stale plans attached would silently compute on wrong indices/metadata
    # (intensities/uncertainties/mask feed the Laue ConvRunPlan's baked
    # row-broadcast values and masks, ops/conv_runs.py)
    _PLAN_SOURCE_FIELDS = frozenset(
        ("refl_id", "image_id", "metadata", "harmonic_id",
         "intensities", "uncertainties", "mask"))

    def replace(self, **kwargs) -> "Inputs":
        """_replace that preserves the plan invariant: plans always travel
        with the arrays they were built from, so replacing a plan-source
        field drops them (recompute via with_plans)."""
        if (self.plans is not None and "plans" not in kwargs
                and self._PLAN_SOURCE_FIELDS.intersection(kwargs)):
            kwargs["plans"] = None
        return self._replace(**kwargs)

    # number of trailing derived-plan fields (plans, shard_plans)
    _N_PLAN_FIELDS = 2

    def select(self, mask_or_idx) -> "Inputs":
        """Row-select every per-observation array (host-side numpy only).
        Gather plans are derived data and are dropped (recompute via
        with_plans after subsetting)."""
        def take(x):
            return None if x is None else np.asarray(x)[mask_or_idx]
        return Inputs(*[take(x) for x in self[:-self._N_PLAN_FIELDS]])

    def sorted_by_refl(self) -> "Inputs":
        """Stable-sort rows by refl_id (host-side numpy). Training-path
        optimization: sorted ids give the planned z_f gather tight kernel
        windows and an identity backward permute (ops/plan_gather.py). The
        ELBO is a sum over observations, so row order does not change the
        result. Mono only — Laue intensities are packed by row position."""
        if self.is_laue:
            raise ValueError("cannot reorder Laue inputs (group packing)")
        order = np.argsort(np.asarray(self.refl_id), kind="stable")
        return self.select(order)

    def sorted_by_harmonic(self, n_refl: Optional[int] = None) -> "Inputs":
        """Reorder Laue rows so harmonic groups are contiguous runs
        (host-side numpy). Training-path optimization: the planned
        convolution's forward segment-sum then needs no permute and its
        backward gather gets tight kernel windows (ops/plan_gather.py).

        Legacy mode (n_refl None): stable-sort by harmonic_id. Group ids
        do not change, so the group-indexed intensities/uncertainties
        (first n_groups entries carry the group values, reference
        formatter.py:637-640) stay exactly as packed.

        Chain mode (n_refl given, mask None, dense group ids): the
        harmonic-CHAIN layout (ops/chain_layout.py) — groups ordered by
        their minimum chain-renumbered refl id, rows within a group by
        that id, so the refl gather's plan (with_plans) gets the windowed
        kernel in both directions instead of the order-independent one-hot
        + sort pipeline. Groups are renumbered to the new order, so the
        group-indexed intensities/uncertainties are repacked accordingly.
        Either way the ELBO is a sum over groups and rows — order-free."""
        if not self.is_laue:
            raise ValueError("sorted_by_harmonic applies to Laue inputs only")
        hid = np.asarray(self.harmonic_id)
        uniq = np.unique(hid)
        dense = len(uniq) == 0 or (uniq[0] == 0
                                   and uniq[-1] == len(uniq) - 1)
        if n_refl is None or self.mask is not None or not dense:
            order = np.argsort(hid, kind="stable")
            renumber = False
        else:
            from ..ops.chain_layout import chain_row_order
            order = chain_row_order(np.asarray(self.refl_id), hid, n_refl)
            renumber = True

        def take_rows(x):
            return None if x is None else np.asarray(x)[order]

        new_hid = take_rows(self.harmonic_id)
        iobs, sig = self.intensities, self.uncertainties
        if renumber:
            h_sorted = new_hid
            change = np.concatenate(
                [[True], h_sorted[1:] != h_sorted[:-1]])
            old_of_new = h_sorted[np.flatnonzero(change)]
            n_groups = len(old_of_new)
            new_hid = (np.cumsum(change) - 1).astype(h_sorted.dtype)
            iobs = np.asarray(iobs).copy()
            sig = np.asarray(sig).copy()
            iobs[:n_groups] = np.asarray(self.intensities)[old_of_new]
            sig[:n_groups] = np.asarray(self.uncertainties)[old_of_new]
        return self._replace(
            refl_id=take_rows(self.refl_id),
            image_id=take_rows(self.image_id),
            file_id=take_rows(self.file_id),
            metadata=take_rows(self.metadata),
            intensities=iobs,
            uncertainties=sig,
            wavelength=take_rows(self.wavelength),
            harmonic_id=new_hid,
            mask=take_rows(self.mask),
            plans=None,
        )

    def with_plans(self, n_refl: int, n_images: int,
                   mlp_width: Optional[int] = None) -> "Inputs":
        """Attach static gather-transpose plans (host-side; see
        ops/plan_gather.py). Speeds up the backward pass of the ELBO's
        table gathers on the unsharded path.

        Both table sizes MUST be the GLOBAL sizes the model's parameter
        tables were built with — never inferred from this (possibly
        subset) Inputs. A plan sized from a subset's max image id emits a
        smaller-than-table gradient in the gather transpose and crashes
        value_and_grad (the round-1 --merge-half-datasets regression).

        mlp_width: when given, also pre-pack the (static) metadata into the
        fused-MLP lane layout (ops/fused_mlp.py) so the trunk kernel skips
        the per-step XLA packing copies."""
        from ..ops.conv_runs import make_conv_run_plan
        from ..ops.fused_mlp import pack_metadata
        from ..ops.plan_gather import (make_chain_gather_plan,
                                       make_gather_plan)
        meta = (pack_metadata(self.metadata, mlp_width)
                if mlp_width is not None else None)
        harmonic = harmonic_run = refl_plan = None
        if self.is_laue:
            harmonic = make_gather_plan(self.harmonic_id, self.n_obs)
            harmonic_run = make_conv_run_plan(
                self.harmonic_id, self.intensities, self.uncertainties,
                self.mask)
            # chain-layout rows (sorted_by_harmonic(n_refl)) get the
            # windowed two-sided gather; other layouts fall through to the
            # order-independent plan below
            refl_plan = make_chain_gather_plan(self.refl_id,
                                               self.harmonic_id, n_refl)
        if refl_plan is None:
            refl_plan = make_gather_plan(self.refl_id, n_refl)
        return self._replace(plans=GatherPlans(
            refl=refl_plan,
            image=make_gather_plan(self.image_id, n_images),
            meta=meta,
            harmonic=harmonic,
            harmonic_run=harmonic_run))

    @staticmethod
    def from_arrays(refl_id, image_id, file_id, metadata, intensities,
                    uncertainties, wavelength=None, harmonic_id=None,
                    mask=None) -> "Inputs":
        def i32(x):
            return None if x is None else np.ascontiguousarray(
                np.asarray(x).reshape(-1), dtype=np.int32)

        def f32(x):
            return None if x is None else np.ascontiguousarray(
                np.asarray(x).reshape(-1), dtype=np.float32)

        return Inputs(
            refl_id=i32(refl_id),
            image_id=i32(image_id),
            file_id=i32(file_id),
            metadata=np.ascontiguousarray(np.atleast_2d(metadata), dtype=np.float32),
            intensities=f32(intensities),
            uncertainties=f32(uncertainties),
            wavelength=f32(wavelength),
            harmonic_id=i32(harmonic_id),
            mask=f32(mask),
        )

    def to_reference_tuple(self):
        """Export as the reference's positional layout (for parity checks)."""
        cols = [
            np.asarray(self.refl_id)[:, None].astype(np.int64),
            np.asarray(self.image_id)[:, None].astype(np.int64),
            np.asarray(self.file_id)[:, None].astype(np.int64),
            np.asarray(self.metadata, dtype=np.float32),
            np.asarray(self.intensities)[:, None].astype(np.float32),
            np.asarray(self.uncertainties)[:, None].astype(np.float32),
        ]
        if self.is_laue:
            cols.append(np.asarray(self.wavelength)[:, None].astype(np.float32))
            cols.append(np.asarray(self.harmonic_id)[:, None].astype(np.int64))
        return tuple(cols)
