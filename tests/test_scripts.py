"""Conversion script tests (reference scripts/ equivalents, SURVEY.md §2 L6)."""
import os
import subprocess
import sys

import numpy as np
import pytest

from careless_tpu.xtal import read_mtz
from careless_tpu.xtal.xds import read_hkl

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SCRIPTS = os.path.join(REPO, "scripts")


def run_script(name, args):
    env = dict(os.environ, PYTHONPATH=REPO, JAX_PLATFORMS="cpu")
    return subprocess.run([sys.executable, os.path.join(SCRIPTS, name)] + args,
                          capture_output=True, text=True, env=env)


def test_stream2mtz(tmp_path, data_dir):
    out = str(tmp_path / "stream.mtz")
    r = run_script("stream2mtz", [f"{data_dir}/crystfel.stream",
                                  "-g", "96", "-o", out])
    assert r.returncode == 0, r.stderr
    ds = read_mtz(out)
    assert len(ds) == 618
    assert ds.spacegroup.number == 96


def test_temp_ahkl_reads():
    """XSCALE .ahkl output parses through the XDS ascii reader
    (reference tests/io/test_xds.py:70)."""
    ds = read_hkl("/root/reference/tests/data/temp.ahkl", file_type="ascii")
    assert len(ds) > 0
    assert {"H", "K", "L", "IOBS"} <= set(ds.columns)


@pytest.fixture(scope="module")
def merged_output(tmp_path_factory):
    from careless_tpu.main import main
    out = str(tmp_path_factory.mktemp("scripts_data") / "m")
    main(["mono", "dHKL,image_id", "/root/reference/tests/data/pyp_off.mtz",
          out, "--iterations=10", "--disable-progress-bar"])
    return out


def test_to_intensities(tmp_path, merged_output):
    out = str(tmp_path / "with_i.mtz")
    r = run_script("to_intensities", [merged_output + "_0.mtz", out])
    assert r.returncode == 0, r.stderr
    ds = read_mtz(out)
    assert "I" in ds.columns and "SigI" in ds.columns
    # I = F^2 + SigF^2
    np.testing.assert_allclose(
        ds["I"].to_numpy(np.float64),
        ds["F"].astype(np.float64) ** 2 + ds["SigF"].astype(np.float64) ** 2,
        rtol=1e-4)
    assert (ds["SigI"].to_numpy(np.float64) > 0).all()


def test_stack_intensities(tmp_path, merged_output):
    out = str(tmp_path / "stacked.mtz")
    r = run_script("stack_intensities", [merged_output + "_0.mtz", out])
    assert r.returncode == 0, r.stderr
    ds = read_mtz(out)
    assert "icol_id" in ds.columns
    assert "I" in ds.columns


def test_plot_predictions(tmp_path, merged_output):
    png = str(tmp_path / "pred.png")
    r = run_script("plot_predictions",
                   [merged_output + "_predictions_0.mtz", "-n", "3",
                    "--image", png])
    assert r.returncode == 0, r.stderr
    assert os.path.exists(png)


def test_make_difference_map(tmp_path, merged_output, data_dir):
    # synthesize a phase mtz from the merged output
    ds = read_mtz(merged_output + "_0.mtz")
    phases = ds[["H", "K", "L", "F"]].copy()
    phases = type(ds)(phases).copy_context_from(ds)
    phases["F-model"] = ds["F"].to_numpy(np.float32)
    phases["PHIF-model"] = np.zeros(len(ds), np.float32)
    phases.mtz_dtypes.update({"F-model": "F", "PHIF-model": "P"})
    phase_mtz = str(tmp_path / "phases.mtz")
    from careless_tpu.xtal import write_mtz
    write_mtz(phases, phase_mtz)

    out = str(tmp_path / "diff.mtz")
    r = run_script("make_difference_map",
                   [merged_output + "_0.mtz", merged_output + "_0.mtz",
                    phase_mtz, "-o", out])
    assert r.returncode == 0, r.stderr
    diff = read_mtz(out)
    for col in ["DeltaF", "SigDeltaF", "W", "DH", "ML", "KDE", "RNORM"]:
        assert col in diff.columns
    # on == off here, so DeltaF must vanish
    np.testing.assert_allclose(diff["DeltaF"].to_numpy(np.float64), 0.0,
                               atol=1e-5)


def test_stills2mtz_gates_without_dials(tmp_path):
    r = run_script("stills2mtz", ["a.refl", "b.expt"])
    assert r.returncode != 0
    assert "DIALS" in r.stderr or "DIALS" in r.stdout
