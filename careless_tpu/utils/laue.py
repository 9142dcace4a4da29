"""Harmonic expansion for polychromatic (Laue) data.

Reference behavior: /root/reference/careless/utils/laue.py:9-81. Each observed
reflection on a central ray is expanded to every contributing harmonic
h = n * H_0 within the resolution cutoff; wavelengths scale as lambda_0 / n.
Host-side pandas/numpy preprocessing.
"""
from __future__ import annotations

import numpy as np

from ..xtal.dataset import DataSet


def calculate_harmonic(H: np.ndarray) -> np.ndarray:
    """The harmonic index n = gcd(|h|, |k|, |l|) of each Miller index."""
    return np.gcd.reduce(np.abs(np.asarray(H, dtype=np.int64)), axis=-1)


def expand_harmonics(ds: DataSet, dmin: float = None,
                     wavelength_key: str = "Wavelength") -> DataSet:
    """Expand each observation to all harmonics out to dmin.

    Adds H_0/K_0/L_0 columns holding the innermost reflection on each central
    ray; updates H/K/L, wavelength, and dHKL per harmonic.
    """
    ds = ds.copy().copy_context_from(ds)
    if "dHKL" not in ds:
        ds.compute_dHKL(inplace=True)
    if dmin is None:
        dmin = float(ds["dHKL"].min()) - 1e-12

    Hobs = ds.get_hkls()
    nobs = calculate_harmonic(Hobs)
    nobs = np.maximum(nobs, 1)

    H_0 = (Hobs / nobs[:, None]).astype(np.int32)
    d_0 = ds["dHKL"].to_numpy(np.float64) * nobs
    wav_0 = ds[wavelength_key].to_numpy(np.float64) * nobs

    n_max = np.floor_divide(d_0, dmin).astype(np.int64)
    n_range = np.arange(max(1, n_max.max())) + 1
    idx, n = np.where(n_range[None, :] <= n_max[:, None])
    n = n + 1

    out = ds.iloc[idx].reset_index(drop=True)
    out = DataSet(out).copy_context_from(ds)
    out["H_0"], out["K_0"], out["L_0"] = H_0[idx].T
    out[wavelength_key] = (wav_0[idx] / n).astype(np.float32)
    hkl_n = (n[:, None] * H_0[idx]).astype(np.int64)
    out["H"], out["K"], out["L"] = hkl_n.T
    out.compute_dHKL(inplace=True)
    return out
