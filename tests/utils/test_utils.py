"""Unit tests: positional encoding, harmonic expansion, checkpointing."""
import numpy as np
import pytest

from careless_tpu.utils.laue import calculate_harmonic, expand_harmonics
from careless_tpu.utils.positional_encoding import positional_encoding
from careless_tpu.xtal import DataSet, SpaceGroup, UnitCell


def test_positional_encoding_shapes_and_range(rng):
    X = rng.normal(size=(50, 3)).astype(np.float32) * 10
    enc = positional_encoding(X, 4)
    assert enc.shape == (50, 3 * 4 * 2)
    assert (np.abs(enc) <= 1 + 1e-6).all()
    # first frequency of a column spans [-1, 1] -> cos(pi*p)
    p = 2 * (X - X.min(0)) / (X.max(0) - X.min(0)) - 1
    np.testing.assert_allclose(enc[:, 0], np.cos(np.pi * p[:, 0]), rtol=1e-5,
                               atol=1e-5)


def test_positional_encoding_constant_column():
    X = np.ones((10, 2), np.float32)
    enc = positional_encoding(X, 2)
    assert np.isfinite(enc).all()


def test_calculate_harmonic():
    H = np.array([[1, 2, 3], [2, 4, 6], [0, 0, 4], [3, 0, 0], [-2, -4, -6]])
    np.testing.assert_array_equal(calculate_harmonic(H), [1, 2, 4, 3, 2])


def test_expand_harmonics():
    cell = UnitCell(30, 30, 30)
    sg = SpaceGroup.from_name("P 1")
    ds = DataSet({
        "H": [1, 2], "K": [1, 0], "L": [1, 0],
        "Wavelength": [2.0, 1.5],
        "I": [10.0, 20.0],
    }, cell=cell, spacegroup=sg, mtz_dtypes={})
    out = expand_harmonics(ds, dmin=5.0)
    # each ray expanded to all n with d_0/n >= dmin
    assert len(out) > len(ds)
    hkl = out[["H", "K", "L"]].to_numpy(np.int64)
    h0 = out[["H_0", "K_0", "L_0"]].to_numpy(np.int64)
    n = hkl[:, 0] // np.where(h0[:, 0] == 0, 1, h0[:, 0])
    # lambda_n = lambda_0 / n and hkl = n * h0
    np.testing.assert_array_equal(hkl, h0 * np.maximum(n, 1)[:, None])
    d = cell.compute_d(hkl)
    assert (d >= 5.0 - 1e-6).all()


def test_checkpoint_roundtrip(tmp_path):
    import jax.numpy as jnp

    from careless_tpu.utils.checkpoint import load_params, save_params
    params = {"a": {"w": jnp.arange(6.0).reshape(2, 3)},
              "b": [jnp.ones(4), jnp.zeros((2, 2))]}
    path = str(tmp_path / "ckpt")
    save_params(path, params)
    like = {"a": {"w": jnp.zeros((2, 3))},
            "b": [jnp.zeros(4), jnp.ones((2, 2))]}
    loaded = load_params(path, like)
    np.testing.assert_array_equal(np.asarray(loaded["a"]["w"]),
                                  np.arange(6.0).reshape(2, 3))
    np.testing.assert_array_equal(np.asarray(loaded["b"][0]), np.ones(4))
    # shape mismatch rejected
    bad = {"a": {"w": jnp.zeros((3, 2))}, "b": [jnp.zeros(4), jnp.zeros((2, 2))]}
    with pytest.raises(ValueError):
        load_params(path, bad)
