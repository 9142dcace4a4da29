"""Host-side crystallography core (CPU preprocessing before the TPU graph).

Standalone replacement for the reference's gemmi + reciprocalspaceship stack.
"""
from .cell import UnitCell
from .dataset import DataSet, concat_datasets
from .mtz import read_mtz, write_mtz
from .symmetry import SpaceGroup
from .symop import Op, close_group

__all__ = [
    "UnitCell", "DataSet", "concat_datasets", "read_mtz", "write_mtz",
    "SpaceGroup", "Op", "close_group",
]
