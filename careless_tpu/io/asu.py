"""Reciprocal asymmetric-unit bookkeeping.

Reference behavior: /root/reference/careless/io/asu.py. A ReciprocalASU
enumerates the unique Miller indices in the reciprocal ASU to dmin (optionally
Friedel-separated) with per-reflection centric flags, multiplicity epsilon and
d-spacing; a collection concatenates several ASUs into one contiguous global
refl_id space (offset per ASU) with bidirectional (asu_id, H) <-> refl_id
maps. Built on careless_tpu.xtal instead of gemmi/reciprocalspaceship.
"""
from __future__ import annotations

from typing import List, Sequence, Tuple

import numpy as np
import pandas as pd

from ..xtal import SpaceGroup, UnitCell


class ReciprocalASU:
    def __init__(self, cell: UnitCell, spacegroup: SpaceGroup, dmin: float,
                 anomalous: bool):
        self.cell = cell
        self.spacegroup = spacegroup
        self.dmin = float(dmin)
        self.anomalous = anomalous
        self.Hall = spacegroup.generate_reciprocal_asu(cell, dmin, anomalous)
        self.centric = spacegroup.is_centric(self.Hall)
        self.multiplicity = spacegroup.epsilon(self.Hall).astype(np.float32)
        self.dHKL = cell.compute_d(self.Hall).astype(np.float32)
        self._index = pd.MultiIndex.from_arrays(
            [self.Hall[:, 0], self.Hall[:, 1], self.Hall[:, 2]],
            names=["H", "K", "L"])
        self._ids = pd.Series(np.arange(len(self.Hall)), index=self._index)

    def __len__(self) -> int:
        return len(self.Hall)

    def to_refl_id(self, H: np.ndarray) -> np.ndarray:
        """Map (n, 3) ASU Miller indices to integer reflection ids
        (float array with NaN marking indices not in this ASU)."""
        H = np.atleast_2d(np.asarray(H, dtype=np.int64))
        idx = pd.MultiIndex.from_arrays([H[:, 0], H[:, 1], H[:, 2]])
        return self._ids.reindex(idx).to_numpy(np.float64)

    def to_miller_index(self, refl_id: np.ndarray) -> np.ndarray:
        return self.Hall[np.asarray(refl_id, dtype=np.int64)]


class ReciprocalASUCollection:
    def __init__(self, reciprocal_asus: Sequence[ReciprocalASU]):
        self.reciprocal_asus: List[ReciprocalASU] = list(reciprocal_asus)
        sizes = [len(a) for a in self.reciprocal_asus]
        self.offsets = np.concatenate([[0], np.cumsum(sizes)])[:-1]
        self.asu_ids = np.concatenate([
            np.full(len(a), i, dtype=np.int64)
            for i, a in enumerate(self.reciprocal_asus)])
        self.hkls = np.concatenate([a.Hall for a in self.reciprocal_asus])
        self.centric = np.concatenate([a.centric for a in self.reciprocal_asus])
        self.multiplicity = np.concatenate(
            [a.multiplicity for a in self.reciprocal_asus])
        self.dHKL = np.concatenate([a.dHKL for a in self.reciprocal_asus])

    def __len__(self) -> int:
        """Number of ASUs (matches the reference's xval bookkeeping,
        careless.py:105)."""
        return len(self.reciprocal_asus)

    @property
    def n_refl(self) -> int:
        """Total reflections across the global contiguous refl_id space."""
        return len(self.hkls)

    def __iter__(self):
        return iter(self.reciprocal_asus)

    def __getitem__(self, i) -> ReciprocalASU:
        return self.reciprocal_asus[i]

    def to_refl_id(self, asu_id: np.ndarray, H: np.ndarray,
                   allow_missing: bool = False) -> np.ndarray:
        """Global refl ids for (asu_id, H) pairs; missing -> -1 if allowed
        (reference asu.py:150-172)."""
        asu_id = np.asarray(asu_id, dtype=np.int64).reshape(-1)
        H = np.atleast_2d(np.asarray(H, dtype=np.int64))
        out = np.full(len(asu_id), -1, dtype=np.int64)
        for i, asu in enumerate(self.reciprocal_asus):
            mask = asu_id == i
            if not mask.any():
                continue
            local = asu.to_refl_id(H[mask])  # float w/ NaN for missing
            good = ~np.isnan(local)
            vals = np.where(good, np.nan_to_num(local, nan=-1.0), -1.0)
            vals = vals.astype(np.int64)
            vals = np.where(vals >= 0, vals + self.offsets[i], -1)
            out[mask] = vals
        if not allow_missing and (out < 0).any():
            raise KeyError("Miller indices not found in ASU collection")
        return out

    def to_asu_id_and_miller_index(self, refl_id: np.ndarray
                                   ) -> Tuple[np.ndarray, np.ndarray]:
        refl_id = np.asarray(refl_id, dtype=np.int64).reshape(-1)
        return self.asu_ids[refl_id], self.hkls[refl_id]
