"""Compute Rsplit from careless-tpu output.

Reference behavior: /root/reference/careless/stats/rsplit.py — Rsplit =
sqrt(2) * min_k sum|x - k*y| / sum(x + k*y) via scipy minimize per bin.
"""
import numpy as np
import pandas as pd
from scipy.optimize import minimize

from ._lib import (BaseParser, bin_by_percentile, emit, lineplot,
                   load_concat, resolution_labels, stack_anomalous)


class ArgumentParser(BaseParser):
    def __init__(self):
        super().__init__(description=__doc__)
        self.add_argument("mtz", nargs="+",
                          help="MTZs containing crossvalidation data")
        self.add_argument("-b", "--bins", default=10, type=int,
                          help="Number of resolution bins (default 10).")
        self.add_argument("--overall", action="store_true",
                          help="Pool all mtz files into a single calculation.")


def rsplit(dataset):
    x, y = dataset["F1"].to_numpy(np.float64), dataset["F2"].to_numpy(np.float64)

    def rfunc(k):
        return np.sum(np.abs(x - k * y)) / np.sum(x + k * y)

    p = minimize(rfunc, 1.0)
    return np.sqrt(2) * p.fun


def make_halves_rsplit(mtz):
    half1 = mtz.loc[mtz.half == 0].copy()
    half2 = mtz.loc[mtz.half == 1].copy()
    if "F(+)" in half1.columns:
        half1 = stack_anomalous(half1)
        half2 = stack_anomalous(half2)
    out = pd.merge(half1[["H", "K", "L", "F", "SigF", "repeat"]],
                   half2[["H", "K", "L", "F", "SigF", "repeat"]],
                   on=["H", "K", "L", "repeat"], suffixes=("1", "2")).dropna()
    from ..xtal import DataSet
    return DataSet(out).copy_context_from(mtz)


def run_analysis(args):
    ds = load_concat(args.mtz, transform=make_halves_rsplit)
    bins, edges = bin_by_percentile(ds["dHKL"], args.bins, ascending=False)
    ds["bin"] = bins
    labels = resolution_labels(edges)

    group_keys = (["bin", "repeat"] if args.overall
                  else ["file", "bin", "repeat"])
    grouper = ds.groupby(group_keys)
    result = grouper.apply(rsplit, include_groups=False)
    result = pd.DataFrame({"Rsplit": result}).reset_index()
    result["Resolution Range (Å)"] = np.array(labels)[result["bin"]]
    result["Spacegroup"] = grouper["Spacegroup"].first().to_numpy()
    cols = ["repeat", "Resolution Range (Å)", "bin", "Spacegroup", "Rsplit"]
    if not args.overall:
        cols = ["file"] + cols
    result = result[cols]

    emit(result, args)
    lineplot(result, args, x="bin", y="Rsplit", labels=labels,
             bins=args.bins, hue=None if args.overall else "file",
             ylabel=r"$R_{\mathrm{split}}$")
    return result


def main():
    run_analysis(ArgumentParser().parse_args())


if __name__ == "__main__":
    main()
