"""Formatter invariants over a parameter grid (reference
tests/io/test_data_formatter.py:11-107)."""
import numpy as np
import pytest

from careless_tpu.io.formatter import LaueFormatter, MonoFormatter
from careless_tpu.xtal import read_mtz

DATA = "/root/reference/tests/data"


@pytest.mark.parametrize("anomalous", [False, True])
@pytest.mark.parametrize("separate", [False, True])
@pytest.mark.parametrize("dmin", [None, 6.0])
def test_mono_formatter_invariants(anomalous, separate, dmin):
    f = MonoFormatter(metadata_keys=["dHKL", "image_id"],
                      separate_outputs=separate, anomalous=anomalous,
                      dmin=dmin or 0.0)
    inputs, rac = f.format_files([f"{DATA}/pyp_off.mtz",
                                  f"{DATA}/pyp_2ms.mtz"])
    n = inputs.n_obs
    assert inputs.refl_id.shape == (n,)
    assert inputs.metadata.shape == (n, 2)
    assert inputs.metadata.dtype == np.float32
    assert inputs.refl_id.min() >= 0
    assert inputs.refl_id.max() < rac.n_refl
    assert len(rac) == (2 if separate else 1)
    # image ids globally renumbered and contiguous
    imgs = np.unique(inputs.image_id)
    np.testing.assert_array_equal(imgs, np.arange(len(imgs)))
    # standardized metadata: z-scores
    assert abs(inputs.metadata.mean(0)).max() < 1e-4
    np.testing.assert_allclose(inputs.metadata.std(0), 1.0, rtol=1e-3)
    if dmin:
        d = rac.dHKL[inputs.refl_id]
        assert d.min() >= dmin - 1e-2
    assert (inputs.uncertainties > 0).all()


def test_mono_isigi_cutoff_reduces_rows():
    base = MonoFormatter(metadata_keys=["dHKL"], anomalous=False)
    cut = MonoFormatter(metadata_keys=["dHKL"], anomalous=False,
                        isigi_cutoff=2.0)
    n0 = base.format_files([f"{DATA}/pyp_off.mtz"])[0].n_obs
    n1 = cut.format_files([f"{DATA}/pyp_off.mtz"])[0].n_obs
    assert 0 < n1 < n0


@pytest.mark.parametrize("anomalous", [False, True])
def test_laue_formatter_invariants(anomalous):
    f = LaueFormatter(metadata_keys=["dHKL", "image_id"],
                      anomalous=anomalous)
    inputs, rac = f.format_files([f"{DATA}/pyp_off.mtz"])
    n = inputs.n_obs
    assert inputs.is_laue
    assert inputs.harmonic_id.shape == (n,)
    n_groups = int(inputs.harmonic_id.max()) + 1
    # harmonic ids contiguous; intensities group-compressed with 1-padding
    np.testing.assert_array_equal(np.unique(inputs.harmonic_id),
                                  np.arange(n_groups))
    assert n_groups <= n
    assert (inputs.intensities[n_groups:] == 1.0).all()
    assert (inputs.wavelength > 0).all()
    # harmonics expanded: more rows than the raw file
    raw = read_mtz(f"{DATA}/pyp_off.mtz")
    assert n >= len(raw)


def test_laue_wavelength_range_filters():
    full = LaueFormatter(metadata_keys=["dHKL"])
    narrow = LaueFormatter(metadata_keys=["dHKL"], lam_min=1.05, lam_max=1.1)
    n_full = full.format_files([f"{DATA}/pyp_off.mtz"])[0].n_obs
    n_narrow = narrow.format_files([f"{DATA}/pyp_off.mtz"])[0].n_obs
    assert 0 < n_narrow < n_full


def test_positional_encoding_appends_columns():
    f = MonoFormatter(metadata_keys=["dHKL"], anomalous=False,
                      positional_encoding_keys=["X", "Y"],
                      encoding_bit_depth=3)
    inputs, _ = f.format_files([f"{DATA}/pyp_off.mtz"])
    # 1 metadata col + 2 keys * 3 freqs * 2 (cos,sin)
    assert inputs.metadata.shape[1] == 1 + 2 * 3 * 2
    enc = inputs.metadata[:, 1:]
    assert (enc >= -1 - 1e-5).all() and (enc <= 1 + 1e-5).all()
