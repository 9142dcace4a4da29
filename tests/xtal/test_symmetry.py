"""Symmetry engine tests: Hall parsing, group properties, ASU invariants.

Mirrors the reference's index-correctness strategy (SURVEY.md §4,
/root/reference/tests/io/test_asu.py) plus table-validation checks the
reference gets for free from gemmi.
"""
import numpy as np
import pytest

from careless_tpu.xtal import Op, SpaceGroup, UnitCell
from careless_tpu.xtal.hall import parse_hall
from careless_tpu.xtal.sg_tables import SG_TABLE, expected_group_order


def test_op_xyz_roundtrip():
    for s in ["x,y,z", "-y,x-y,z+1/3", "-x,-y,z+1/2", "x-y,x,z+1/2",
              "y+1/4,-x+3/4,z+1/4", "-x+1/2,y+1/2,-z"]:
        op = Op.from_xyz(s)
        assert Op.from_xyz(op.to_xyz()) == op


def test_op_inverse_and_compose():
    op = Op.from_xyz("-y,x-y,z+1/3")
    assert (op * op.inverse()).is_identity()
    assert (op.inverse() * op).is_identity()
    # order-3 screw: op^3 = pure translation by c
    op3 = op * op * op
    assert np.array_equal(op3.rot_array, np.eye(3, dtype=np.int64))
    assert tuple(op3.trans) == (0, 0, 24)[0:0] or op3.trans == (0, 0, 24 % 24)


@pytest.mark.parametrize("num,hm,hall", SG_TABLE)
def test_all_230_group_orders(num, hm, hall):
    """Every table entry must close to a group whose order matches an
    independent decoding of the H-M point group x centering."""
    ops = parse_hall(hall)
    assert len(ops) == expected_group_order(hm), (num, hm, hall, len(ops))
    # group property: closed under composition and inverse
    opset = set(ops)
    assert Op.identity() in opset
    for op in ops[: min(len(ops), 8)]:
        assert op.inverse() in opset


def test_p63_matches_mtz_header():
    """P 63 ops must equal the SYMM records shipped in the reference MTZ."""
    sg = SpaceGroup.from_name("P 63")
    mtz_ops = {Op.from_xyz(s) for s in [
        "X,Y,Z", "X-Y,X,Z+1/2", "-Y,X-Y,Z", "-X,-Y,Z+1/2",
        "-X+Y,-X,Z", "Y,-X+Y,Z+1/2"]}
    assert set(sg.ops) == mtz_ops


def test_p212121_ops_match_ita():
    sg = SpaceGroup.from_name("P 21 21 21")
    expected = {Op.from_xyz(s) for s in [
        "x,y,z", "-x+1/2,-y,z+1/2", "-x,y+1/2,-z+1/2", "x+1/2,-y+1/2,-z"]}
    assert set(sg.ops) == expected


def test_name_lookups():
    for key in [19, "19", "P212121", "P 21 21 21", "p 21 21 21"]:
        sg = SpaceGroup.from_name(key)
        assert sg.n_ops == 4
    sg = SpaceGroup.from_name("Hall:P 2ac 2ab")
    assert sg.n_ops == 4


def test_centric_and_epsilon_p63():
    sg = SpaceGroup.from_name("P 63")
    hkl = np.array([[0, 0, 2], [1, 0, 0], [1, 2, 3], [3, 0, 0]])
    centric = sg.is_centric(hkl)
    # P63 (chiral): centric zone is hk0 (2-fold component of 63 maps (h,k,0)->(-h,-k,0))
    assert list(centric) == [False, True, False, True]
    eps = sg.epsilon(hkl)
    assert eps[0] == 6  # 00l fixed by all six rotations
    assert eps[2] == 1  # general reflection


def test_absences_p63():
    sg = SpaceGroup.from_name("P 63")
    hkl = np.array([[0, 0, 1], [0, 0, 2], [0, 0, 3], [1, 0, 0], [1, 2, 3]])
    absent = sg.is_absent(hkl)
    assert list(absent) == [True, False, True, False, False]


def test_absences_p212121():
    sg = SpaceGroup.from_name("P 21 21 21")
    # axial reflections absent for odd index
    assert sg.is_absent(np.array([[1, 0, 0]]))[0]
    assert sg.is_absent(np.array([[0, 3, 0]]))[0]
    assert sg.is_absent(np.array([[0, 0, 5]]))[0]
    assert not sg.is_absent(np.array([[2, 0, 0]]))[0]
    assert not sg.is_absent(np.array([[1, 1, 0]]))[0]


@pytest.mark.parametrize("name", ["P 1", "P -1", "P 21 21 21", "C 2", "P 63",
                                  "P 3", "R 3 2", "I 4", "P 43 21 2",
                                  "F 2 2 2", "P 63/m m c", "I a -3 d"])
def test_map_to_asu_consistency(name, rng):
    """Every reflection maps to exactly one ASU representative; equivalents
    map to the same representative; the representative is an equivalent."""
    sg = SpaceGroup.from_name(name)
    hkl = rng.integers(-8, 9, size=(200, 3))
    hkl = hkl[np.any(hkl != 0, axis=1)]
    asu, fminus = sg.map_to_asu(hkl)
    # idempotent
    asu2, _ = sg.map_to_asu(asu)
    assert np.array_equal(asu, asu2)
    # every symmetry mate of h maps to the same ASU rep
    for op in sg.ops[: min(sg.n_ops, 6)]:
        mate = op.apply_to_hkl(hkl)
        asu_m, _ = sg.map_to_asu(mate)
        assert np.array_equal(asu, asu_m)
    # Friedel mate maps to same rep (non-anomalous)
    asu_f, _ = sg.map_to_asu(-hkl)
    assert np.array_equal(asu, asu_f)


def test_map_to_asu_anomalous_friedel_sign():
    sg = SpaceGroup.from_name("P 63")
    hkl = np.array([[1, 2, 3]])
    plus, fm_p = sg.map_to_asu(hkl, anomalous=True)
    minus, fm_m = sg.map_to_asu(-hkl, anomalous=True)
    assert np.array_equal(plus, -minus)
    assert fm_p[0] != fm_m[0]
    # centric reflections never get a Friedel-minus label
    centric_h = np.array([[1, 2, 0]])
    _, fm_c = sg.map_to_asu(centric_h, anomalous=True)
    _, fm_c2 = sg.map_to_asu(-centric_h, anomalous=True)
    assert not fm_c[0] and not fm_c2[0]


def test_generate_reciprocal_asu_covers_all(rng):
    cell = UnitCell(66.9, 66.9, 40.9543, 90, 90, 120)
    sg = SpaceGroup.from_name("P 63")
    dmin = 3.0
    asu = sg.generate_reciprocal_asu(cell, dmin)
    # unique
    assert len(np.unique(asu, axis=0)) == len(asu)
    # every generated index is its own ASU rep and in resolution range
    mapped, _ = sg.map_to_asu(asu)
    assert np.array_equal(mapped, asu)
    assert (cell.compute_d(asu) >= dmin - 1e-6).all()
    assert not sg.is_absent(asu).any()
    # any in-range reflection maps into the generated set
    probe = rng.integers(-10, 11, (500, 3))
    probe = probe[np.any(probe != 0, axis=1)]
    probe = probe[cell.compute_d(probe) >= dmin]
    probe = probe[~sg.is_absent(probe)]
    mapped, _ = sg.map_to_asu(probe)
    table = {tuple(h) for h in asu}
    for h in mapped:
        assert tuple(h) in table


def test_generate_reciprocal_asu_anomalous():
    cell = UnitCell(66.9, 66.9, 40.9543, 90, 90, 120)
    sg = SpaceGroup.from_name("P 63")
    asu = sg.generate_reciprocal_asu(cell, 4.0, anomalous=False)
    asu_anom = sg.generate_reciprocal_asu(cell, 4.0, anomalous=True)
    n_centric = int(sg.is_centric(asu).sum())
    n_acentric = len(asu) - n_centric
    assert len(asu_anom) == n_centric + 2 * n_acentric


def test_unit_cell_dspacing():
    # orthorhombic sanity: d(h00) = a/h
    cell = UnitCell(10, 20, 30)
    assert np.isclose(cell.compute_d(np.array([[2, 0, 0]]))[0], 5.0)
    assert np.isclose(cell.compute_d(np.array([[0, 4, 0]]))[0], 5.0)
    # hexagonal: d(100) = a * sqrt(3)/2
    hexcell = UnitCell(10, 10, 30, 90, 90, 120)
    assert np.isclose(hexcell.compute_d(np.array([[1, 0, 0]]))[0],
                      10 * np.sqrt(3) / 2)
