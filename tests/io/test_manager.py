"""DataManager unit tests mirroring the reference's
tests/io/test_data_manager.py: splitters, Wilson prior construction, and
merged-results invariants, exercised directly (the CLI e2e tests cover the
same code end-to-end; these pin the unit-level contracts)."""
import numpy as np
import pytest

from careless_tpu.io.formatter import LaueFormatter, MonoFormatter
from careless_tpu.io.manager import DataManager
from careless_tpu.models.merging.surrogate import TruncatedNormalPosterior

DATA = "/root/reference/tests/data"


@pytest.fixture(scope="module", params=["mono", "laue"])
def dm(request):
    cls = MonoFormatter if request.param == "mono" else LaueFormatter
    f = cls(metadata_keys=["dHKL", "image_id"])
    inputs, rac = f.format_files([f"{DATA}/pyp_off.mtz"])
    return DataManager(inputs, rac)


def _check_split(dm, train, test):
    assert train.n_obs + test.n_obs >= dm.inputs.n_obs  # Laue may repad
    assert 0 < test.n_obs < dm.inputs.n_obs
    for part in (train, test):
        assert part.refl_id.max() < dm.n_refl
        assert part.image_id.max() < dm.n_images
        if part.is_laue:
            # harmonic groups renumbered contiguously; packed group values
            # occupy the leading rows (the reference splitter's repacking
            # invariant, manager.py:299-343)
            hid = np.asarray(part.harmonic_id)
            uniq = np.unique(hid)
            np.testing.assert_array_equal(uniq, np.arange(len(uniq)))
            assert (np.asarray(part.uncertainties)[: len(uniq)] > 0).all()


def test_split_data_by_refl(dm):
    train, test = dm.split_data_by_refl(0.1)
    _check_split(dm, train, test)
    if dm.inputs.is_laue:
        # a harmonic group never straddles the split
        hid = np.asarray(dm.inputs.harmonic_id)
        n_groups = hid.max() + 1
        # groups counted once across both halves
        n_train = len(np.unique(np.asarray(train.harmonic_id)))
        n_test = len(np.unique(np.asarray(test.harmonic_id)))
        assert n_train + n_test == n_groups


def test_split_data_by_image(dm):
    train, test = dm.split_data_by_image(0.1)
    _check_split(dm, train, test)
    # every image lands wholly in one half
    imgs_train = set(np.asarray(train.image_id).tolist())
    imgs_test = set(np.asarray(test.image_id).tolist())
    assert not imgs_train & imgs_test


def test_wilson_prior_and_b_factor(dm):
    p = dm.get_wilson_prior()
    assert np.isfinite(np.asarray(p.mean())).all()
    pb = dm.get_wilson_prior(20.0)
    # B > 0 shrinks high-resolution (large 1/d^2) Sigma
    assert float(np.asarray(pb.mean()).sum()) < float(
        np.asarray(p.mean()).sum())


def test_get_results_invariants(dm):
    p = dm.get_wilson_prior()
    posterior = TruncatedNormalPosterior(
        low=np.zeros(dm.n_refl, np.float32))
    params = posterior.init(np.asarray(p.mean()), np.asarray(p.stddev()))
    dist = posterior.distribution(params)
    results = dm.get_results(dist)
    assert len(results) == len(dm.asu_collection)
    for ds in results:
        assert (ds["N"].to_numpy() > 0).all()  # reference test_data_manager
        assert (ds["SigF"].to_numpy() > 0).all()
        assert (ds["SigI"].to_numpy() > 0).all()
        # I consistent with the posterior moments: I = F^2 + SigF^2
        np.testing.assert_allclose(
            ds["I"].to_numpy(),
            ds["F"].to_numpy() ** 2 + ds["SigF"].to_numpy() ** 2, rtol=1e-4)


def test_pickle_round_trip(dm, tmp_path):
    path = str(tmp_path / "dm.pickle")
    dm.to_pickle(path)
    dm2 = DataManager.from_pickle(path)
    assert dm2.n_refl == dm.n_refl
    np.testing.assert_array_equal(np.asarray(dm2.inputs.refl_id),
                                  np.asarray(dm.inputs.refl_id))
