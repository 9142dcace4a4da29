"""XDS + CrystFEL reader tests on the reference's bundled files
(reference tests/io coverage for xds, formatter stream handling)."""
import numpy as np

from careless_tpu.xtal import read_mtz
from careless_tpu.xtal.stream import read_crystfel
from careless_tpu.xtal.xds import (ArgumentParser, infer_file_type, read_hkl,
                                   run)

DATA = "/root/reference/tests/data"


def test_infer_file_type():
    assert infer_file_type(f"{DATA}/XDS_ASCII.HKL") == "ascii"
    assert infer_file_type(f"{DATA}/INTEGRATE.HKL") == "integrate"


def test_read_integrate():
    ds = read_hkl(f"{DATA}/INTEGRATE.HKL")
    assert ds.spacegroup.number == 96
    assert np.isclose(ds.cell.a, 79.395)
    assert {"H", "K", "L", "IOBS", "SIGMA", "BATCH"} <= set(ds.columns)
    assert len(ds) > 10
    assert ds["BATCH"].min() >= 0


def test_read_ascii():
    ds = read_hkl(f"{DATA}/XDS_ASCII.HKL")
    assert ds.spacegroup.number == 96
    assert "IOBS" in ds.columns
    assert "BATCH" in ds.columns
    assert len(ds) > 10


def test_xds2mtz_cli(tmp_path):
    out = str(tmp_path / "xds.mtz")
    run(ArgumentParser().parse_args([f"{DATA}/XDS_ASCII.HKL", out]))
    ds = read_mtz(out)
    assert ds.spacegroup.n_ops == 8  # P43212
    assert len(ds) > 10


def test_xds2mtz_cli_overrides(tmp_path):
    out = str(tmp_path / "xds.mtz")
    run(ArgumentParser().parse_args(
        [f"{DATA}/INTEGRATE.HKL", out, "-s", "P 41 21 2",
         "-c", "79", "79", "38", "90", "90", "90"]))
    ds = read_mtz(out)
    assert np.isclose(ds.cell.a, 79.0, atol=0.01)


def test_stream_reader():
    ds = read_crystfel(f"{DATA}/crystfel.stream")
    assert len(ds) == 618
    assert set(ds["BATCH"].unique()) == {0, 1, 2}
    for col in ["s1x", "s1y", "s1z", "ewald_offset", "angular_ewald_offset"]:
        assert col in ds.columns
        assert np.isfinite(ds[col].to_numpy(np.float64)).all()
    # Ewald offsets should be small for indexed reflections
    assert np.abs(ds["ewald_offset"].to_numpy(np.float64)).max() < 0.01
    # s1 length should be close to 1/lambda
    lam = ds["Wavelength"].to_numpy(np.float64)
    s1n = np.sqrt(ds["s1x"].astype(np.float64) ** 2
                  + ds["s1y"].astype(np.float64) ** 2
                  + ds["s1z"].astype(np.float64) ** 2)
    np.testing.assert_allclose(s1n, 1 / lam, rtol=5e-3)
