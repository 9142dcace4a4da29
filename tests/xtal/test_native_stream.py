"""Native C++ stream parser: parity with the pure-Python parser."""
import os
import subprocess

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
LIB = os.path.join(REPO, "careless_tpu", "xtal", "_native_lib.so")


@pytest.fixture(scope="module")
def native_lib():
    if not os.path.exists(LIB):
        try:
            subprocess.run(["make", "-C", os.path.join(REPO, "cpp")],
                           check=True, capture_output=True)
        except (subprocess.CalledProcessError, FileNotFoundError) as e:
            pytest.skip(f"cannot build native lib: {e}")
    return LIB


def test_native_matches_python(native_lib, data_dir):
    from careless_tpu.xtal._native import parse_stream
    from careless_tpu.xtal.stream import _read_crystfel_python
    arrays, cell = parse_stream(f"{data_dir}/crystfel.stream")
    py = _read_crystfel_python(f"{data_dir}/crystfel.stream")
    assert len(arrays["H"]) == len(py)
    assert np.allclose(cell, list(py.cell.parameters))
    for col in py.columns:
        np.testing.assert_allclose(
            np.asarray(arrays[col], np.float64),
            py[col].to_numpy(np.float64), rtol=1e-5, atol=1e-6, err_msg=col)


def test_native_error_path(native_lib, tmp_path):
    from careless_tpu.xtal._native import parse_stream
    bad = tmp_path / "empty.stream"
    bad.write_text("CrystFEL stream format 2.3\n")
    with pytest.raises(ValueError, match="no indexed reflections"):
        parse_stream(str(bad))
