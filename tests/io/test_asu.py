"""ASU bookkeeping tests (reference tests/io/test_asu.py: id<->HKL round
trips, no gaps/duplicates across collections)."""
import numpy as np
import pytest

from careless_tpu.io.asu import ReciprocalASU, ReciprocalASUCollection
from careless_tpu.xtal import SpaceGroup, UnitCell


@pytest.fixture(scope="module", params=[False, True], ids=["friedel", "anom"])
def asus(request):
    cell = UnitCell(34, 45, 98)
    sg = SpaceGroup.from_name("P 21 21 21")
    cell2 = UnitCell(66.9, 66.9, 40.9, 90, 90, 120)
    sg2 = SpaceGroup.from_name("P 63")
    return [ReciprocalASU(cell, sg, 4.0, request.param),
            ReciprocalASU(cell2, sg2, 5.0, request.param)]


def test_asu_roundtrip(asus):
    for asu in asus:
        ids = np.arange(len(asu))
        H = asu.to_miller_index(ids)
        back = asu.to_refl_id(H)
        np.testing.assert_array_equal(back.astype(np.int64), ids)


def test_asu_properties(asus):
    for asu in asus:
        assert len(asu.centric) == len(asu)
        assert len(asu.multiplicity) == len(asu)
        assert (asu.dHKL >= asu.dmin - 1e-3).all()
        assert set(np.unique(asu.multiplicity)) <= {1.0, 2.0, 3.0, 4.0, 6.0}


def test_collection_contiguous_ids(asus):
    rac = ReciprocalASUCollection(asus)
    assert rac.n_refl == len(asus[0]) + len(asus[1])
    # global ids are 0..n-1 with no gaps and correct asu attribution
    asu_id, H = rac.to_asu_id_and_miller_index(np.arange(rac.n_refl))
    assert (np.bincount(asu_id) == [len(asus[0]), len(asus[1])]).all()
    back = rac.to_refl_id(asu_id, H)
    np.testing.assert_array_equal(back, np.arange(rac.n_refl))


def test_collection_allow_missing(asus):
    rac = ReciprocalASUCollection(asus)
    bogus = np.array([[99, 99, 99]])
    with pytest.raises(KeyError):
        rac.to_refl_id(np.array([0]), bogus)
    out = rac.to_refl_id(np.array([0]), bogus, allow_missing=True)
    assert out[0] == -1
