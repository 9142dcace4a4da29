"""DataSet: a pandas DataFrame carrying crystallographic context.

Minimal stand-in for reciprocalspaceship's rs.DataSet (the reference's host
data structure, see /root/reference/careless/io/formatter.py:165-185). Holds a
unit cell, a space group, and per-column MTZ type tags, and provides the
symmetry-aware methods the merging pipeline needs: compute_dHKL,
remove_absences, hkl_to_asu, label_centrics, compute_multiplicity.
"""
from __future__ import annotations

from typing import Dict, Optional

import numpy as np
import pandas as pd

from .cell import UnitCell
from .symmetry import SpaceGroup

# Default MTZ column type per canonical column name
DEFAULT_MTZ_TYPES = {
    "H": "H", "K": "H", "L": "H",
    "BATCH": "B",
    "I": "J", "SIGI": "Q", "SigI": "Q",
    "F": "F", "SIGF": "Q", "SigF": "Q",
    "M/ISYM": "Y",
}


class DataSet(pd.DataFrame):
    """DataFrame + (cell, spacegroup, mtz_dtypes)."""

    _metadata = ["cell", "spacegroup", "mtz_dtypes"]

    def __init__(self, data=None, *args, cell: Optional[UnitCell] = None,
                 spacegroup: Optional[SpaceGroup] = None,
                 mtz_dtypes: Optional[Dict[str, str]] = None, **kwargs):
        super().__init__(data, *args, **kwargs)
        if cell is not None or not hasattr(self, "cell"):
            object.__setattr__(self, "cell", cell)
        if spacegroup is not None or not hasattr(self, "spacegroup"):
            object.__setattr__(self, "spacegroup", spacegroup)
        if mtz_dtypes is not None or not hasattr(self, "mtz_dtypes"):
            object.__setattr__(self, "mtz_dtypes", dict(mtz_dtypes or {}))

    @property
    def _constructor(self):
        return DataSet

    # pandas copies _metadata through __finalize__
    def copy_context_from(self, other: "DataSet") -> "DataSet":
        object.__setattr__(self, "cell", other.cell)
        object.__setattr__(self, "spacegroup", other.spacegroup)
        object.__setattr__(self, "mtz_dtypes", dict(getattr(other, "mtz_dtypes", {})))
        return self

    # ------------------------------------------------------------ helpers
    def get_hkls(self) -> np.ndarray:
        return self[["H", "K", "L"]].to_numpy(np.int64)

    def set_hkls(self, hkl: np.ndarray) -> None:
        self["H"], self["K"], self["L"] = hkl[:, 0], hkl[:, 1], hkl[:, 2]

    def compute_dHKL(self, inplace: bool = True) -> "DataSet":
        ds = self if inplace else self.copy().copy_context_from(self)
        ds["dHKL"] = ds.cell.compute_d(ds.get_hkls()).astype(np.float32)
        ds.mtz_dtypes.setdefault("dHKL", "R")
        return ds

    def remove_absences(self, inplace: bool = True) -> "DataSet":
        ds = self if inplace else self.copy().copy_context_from(self)
        absent = ds.spacegroup.is_absent(ds.get_hkls())
        if absent.any():
            ds.drop(ds.index[absent], inplace=True)
        return ds

    def hkl_to_asu(self, inplace: bool = True, anomalous: bool = False) -> "DataSet":
        ds = self if inplace else self.copy().copy_context_from(self)
        asu, _ = ds.spacegroup.map_to_asu(ds.get_hkls(), anomalous=anomalous)
        ds.set_hkls(asu)
        return ds

    def label_centrics(self, inplace: bool = True) -> "DataSet":
        ds = self if inplace else self.copy().copy_context_from(self)
        ds["CENTRIC"] = ds.spacegroup.is_centric(ds.get_hkls())
        return ds

    def compute_multiplicity(self, inplace: bool = True) -> "DataSet":
        ds = self if inplace else self.copy().copy_context_from(self)
        ds["EPSILON"] = ds.spacegroup.epsilon(ds.get_hkls()).astype(np.int32)
        ds.mtz_dtypes.setdefault("EPSILON", "I")
        return ds

    def write_mtz(self, path: str) -> None:
        from .mtz import write_mtz
        write_mtz(self, path)


def concat_datasets(datasets, **kwargs) -> DataSet:
    out = DataSet(pd.concat(datasets, **kwargs))
    if datasets:
        out.copy_context_from(datasets[0])
    return out
