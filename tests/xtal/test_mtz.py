"""MTZ binary I/O tests against the reference's bundled real data files."""
import numpy as np

from careless_tpu.xtal import DataSet, UnitCell, SpaceGroup, read_mtz, write_mtz


def test_read_pyp_off(pyp_off_mtz):
    ds = read_mtz(pyp_off_mtz)
    assert len(ds) == 166
    assert list(ds.columns) == ["H", "K", "L", "X", "Y", "Wavelength", "I",
                                "SigI", "BATCH", "M/ISYM"]
    assert ds.spacegroup.n_ops == 6
    assert ds.spacegroup.number == 173
    assert np.isclose(ds.cell.a, 66.9)
    assert np.isclose(ds.cell.gamma, 120.0)
    assert ds["H"].dtype.kind == "i"
    assert ds["I"].dtype == np.float32
    assert (ds["I"] > 0).all()


def test_read_pyp_wrong_sg(data_dir):
    ds = read_mtz(f"{data_dir}/pyp_2ms_P3.mtz")
    assert ds.spacegroup.number == 143 or ds.spacegroup.n_ops == 3


def test_roundtrip(tmp_path, pyp_off_mtz):
    ds = read_mtz(pyp_off_mtz)
    out = tmp_path / "rt.mtz"
    write_mtz(ds, str(out))
    ds2 = read_mtz(str(out))
    assert list(ds.columns) == list(ds2.columns)
    assert set(ds.spacegroup.ops) == set(ds2.spacegroup.ops)
    assert np.allclose(ds.cell.parameters, ds2.cell.parameters, atol=1e-3)
    for col in ds.columns:
        if col == "M/ISYM":
            # the op index may differ between ASU conventions; the observed
            # HKL (checked above) and Friedel parity must round-trip
            centric = ds.spacegroup.is_centric(ds.get_hkls())
            p1 = ds[col].to_numpy(np.int64) % 2
            p2 = ds2[col].to_numpy(np.int64) % 2
            assert np.array_equal(p1[~centric], p2[~centric])
            continue
        assert np.allclose(ds[col].to_numpy(np.float64),
                           ds2[col].to_numpy(np.float64), rtol=1e-6), col
    assert ds2.mtz_dtypes["I"] == "J"
    assert ds2.mtz_dtypes["BATCH"] == "B"


def test_write_synthetic(tmp_path):
    cell = UnitCell(30, 40, 50)
    sg = SpaceGroup.from_name("P 21 21 21")
    ds = DataSet({
        "H": np.array([1, 2, 3], dtype=np.int32),
        "K": np.array([1, 0, 2], dtype=np.int32),
        "L": np.array([0, 1, 4], dtype=np.int32),
        "F": np.array([10.5, 3.25, 8.0], dtype=np.float32),
        "SigF": np.array([1.0, 0.5, 0.25], dtype=np.float32),
    }, cell=cell, spacegroup=sg, mtz_dtypes={"H": "H", "K": "H", "L": "H",
                                             "F": "F", "SigF": "Q"})
    path = tmp_path / "synth.mtz"
    write_mtz(ds, str(path))
    ds2 = read_mtz(str(path))
    assert np.array_equal(ds.get_hkls(), ds2.get_hkls())
    assert np.allclose(ds["F"], ds2["F"])
    assert ds2.spacegroup.n_ops == 4


def test_dataset_methods(pyp_off_mtz):
    ds = read_mtz(pyp_off_mtz)
    ds.compute_dHKL()
    assert (ds.dHKL > 0).all()
    # dHKL matches the RESO header range from the file
    assert ds.dHKL.min() >= 1 / np.sqrt(0.039939201393) - 1e-3
    ds.label_centrics()
    ds.compute_multiplicity()
    assert ds["EPSILON"].isin([1, 2, 3, 6]).all()
    n0 = len(ds)
    ds.remove_absences()
    assert len(ds) <= n0
