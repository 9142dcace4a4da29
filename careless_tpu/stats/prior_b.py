"""Estimate the Wilson b-factor from unmerged data.

Reference behavior: /root/reference/careless/stats/prior_b.py — Wilson-plot
linear regression of log<I> vs 1/d^2 per resolution bin, with an automatic
resolution cutoff from binned I/sigI; B = -2 * slope.
"""
import argparse

import numpy as np
import pandas as pd
from scipy.stats import linregress

from ..io.formatter import get_first_key_of_dtype
from ._lib import bin_by_percentile


class ArgumentParser(argparse.ArgumentParser):
    def __init__(self):
        super().__init__(formatter_class=argparse.RawTextHelpFormatter,
                         description=__doc__)
        self.add_argument("input", nargs="+",
                          help="Unmerged reflection file(s), MTZ or CrystFEL "
                               ".stream")
        self.add_argument("-i", "--intensity-key", type=str, default=None)
        self.add_argument("-s", "--sigma-key", type=str, default=None)
        self.add_argument("-b", "--bins", type=int, default=20,
                          help="Number of bins (default 20).")
        group = self.add_mutually_exclusive_group()
        group.add_argument("-c", "--isigi-cutoff", type=float, default=1.5,
                           help="Estimate a resolution cutoff from binned "
                                "signal to noise (default 1.5).")
        group.add_argument("-d", "--dmin", type=float, default=None,
                           help="Explicit resolution cutoff in Å.")
        self.add_argument("-x", "--dmax", type=float, default=np.inf)
        self.add_argument("--plot", action="store_true")


def _make_df(dHKL, I, SigI, bins=None):
    df = pd.DataFrame({"dHKL": dHKL, "I": I, "SigI": SigI})
    if bins is not None:
        labels, _ = bin_by_percentile(dHKL, bins, ascending=True)
        df["bin"] = labels
    return df


def _truncate_data(dHKL, I, SigI, bins=20, isigi_cutoff=None, dmin=None):
    if isigi_cutoff is None and dmin is None:
        return dHKL, I, SigI
    if dmin is not None:
        idx = dHKL >= dmin
        return dHKL[idx], I[idx], SigI[idx]
    df = _make_df(dHKL, I, SigI, bins)
    df["isigi"] = df.I / df.SigI
    mu = df.groupby("bin").mean()
    dmin = mu.dHKL[mu.isigi >= isigi_cutoff].min()
    return _truncate_data(dHKL, I, SigI, bins, None, dmin)


def estimate_b(dHKL, I, SigI, bins=20, isigi_cutoff=None, dmin=None):
    """Wilson b-factor fit (reference prior_b.py:108-139)."""
    dHKL, I, SigI = _truncate_data(dHKL, I, SigI, bins, isigi_cutoff, dmin)
    df = _make_df(dHKL, I, SigI, bins)
    df["inv_d2"] = np.reciprocal(np.square(df["dHKL"]))
    mu = df[["bin", "I", "inv_d2"]].groupby("bin").mean()
    x, y = mu.inv_d2, np.log(mu.I)
    result = linregress(x, y)
    result.x = x
    result.y = y
    return result


def run_analysis(parser):
    from ..xtal import read_mtz
    ds = []
    for i, file in enumerate(parser.input):
        if file.endswith(".mtz"):
            _ds = read_mtz(file)
        elif file.endswith(".stream"):
            from ..xtal.stream import read_crystfel
            _ds = read_crystfel(file)
        else:
            raise ValueError(f"unsupported input {file}")
        _ds["file_id"] = i
        ds.append(pd.DataFrame(_ds))
    first = read_mtz(parser.input[0]) if parser.input[0].endswith(".mtz") else None
    import pandas as _pd
    from ..xtal import DataSet
    cat = DataSet(_pd.concat(ds, ignore_index=True))
    if first is not None:
        cat.copy_context_from(first)

    ikey = parser.intensity_key or get_first_key_of_dtype(
        read_mtz(parser.input[0]) if parser.input[0].endswith(".mtz") else cat, "J") or "I"
    sigkey = parser.sigma_key
    if sigkey is None:
        for prefix in ("Sig", "SIG"):
            if prefix + ikey in cat.columns:
                sigkey = prefix + ikey
    sigkey = sigkey or "SigI"

    cat.compute_dHKL(inplace=True)
    dHKL = cat["dHKL"].to_numpy(np.float64)
    I = cat[ikey].to_numpy(np.float64)
    SigI = cat[sigkey].to_numpy(np.float64)
    fit = estimate_b(dHKL, I, SigI, parser.bins, parser.isigi_cutoff,
                     parser.dmin)

    title = (f"Estimated Wilson b-factor: {-2.0 * fit.slope:0.2f} "
             f"± {2.0 * fit.stderr:0.2f}")
    if parser.plot:
        import matplotlib.pyplot as plt
        import seaborn as sns
        sns.regplot(x=fit.x, y=fit.y, color="k")
        plt.xlabel(r"$1 / d_{HKL}^2\ (Å^{-2})$")
        plt.ylabel(r"$\log \langle I \rangle$")
        plt.title(title)
        plt.show()
    print(title)
    return fit


def main():
    run_analysis(ArgumentParser().parse_args())


if __name__ == "__main__":
    main()
