"""Compute CChalf from careless-tpu output.

Reference behavior: /root/reference/careless/stats/cchalf.py — pair the
half-dataset outputs on (H,K,L,repeat), correlate the halves per resolution
bin (pearson/spearman/weighted), CSV + lineplot; --use-structure-factors
switches I -> F.
"""
import numpy as np
import pandas as pd

from ._lib import (BaseParser, bin_by_percentile, cc_funcs, emit, lineplot,
                   load_concat, resolution_labels, stack_anomalous)


class ArgumentParser(BaseParser):
    def __init__(self):
        super().__init__(description=__doc__)
        self.add_argument("mtz", nargs="+",
                          help="MTZs containing crossvalidation data")
        self.add_argument("-m", "--method", default="pearson",
                          choices=["pearson", "spearman", "weighted"],
                          help="Correlation method (default pearson).")
        self.add_argument("-b", "--bins", default=10, type=int,
                          help="Number of resolution bins (default 10).")
        self.add_argument("--overall", action="store_true",
                          help="Pool all mtz files into a single calculation.")
        self.add_argument("--use-structure-factors", action="store_true",
                          help="Use F instead of I for the CChalf calculation.")


def make_halves_cchalf(mtz):
    half1 = mtz.loc[mtz.half == 0].copy()
    half2 = mtz.loc[mtz.half == 1].copy()
    if "F(+)" in half1.columns:
        half1 = stack_anomalous(half1)
        half2 = stack_anomalous(half2)
    out = pd.merge(
        half1[["H", "K", "L", "F", "SigF", "I", "SigI", "repeat"]],
        half2[["H", "K", "L", "F", "SigF", "I", "SigI", "repeat"]],
        on=["H", "K", "L", "repeat"], suffixes=("1", "2")).dropna()
    from ..xtal import DataSet
    return DataSet(out).copy_context_from(mtz)


def run_analysis(args):
    ds = load_concat(args.mtz, transform=make_halves_cchalf)
    bins, edges = bin_by_percentile(ds["dHKL"], args.bins, ascending=False)
    ds["bin"] = bins
    labels = resolution_labels(edges)

    if args.use_structure_factors:
        keep = ["file", "bin", "repeat", "F1", "SigF1", "F2", "SigF2",
                "Spacegroup"]
        ds = ds[keep].rename(columns={"F1": "I1", "F2": "I2",
                                      "SigF1": "SigI1", "SigF2": "SigI2"})

    group_keys = (["bin", "repeat"] if args.overall
                  else ["file", "bin", "repeat"])
    grouper = ds.groupby(group_keys)
    ccfunc = cc_funcs("I1", "I2", "SigI1", "SigI2")[args.method.lower()]

    result = grouper.apply(ccfunc, include_groups=False)
    result = pd.DataFrame({"CChalf": result}).reset_index()
    result["Resolution Range (Å)"] = np.array(labels)[result["bin"]]
    result["Spacegroup"] = grouper["Spacegroup"].first().to_numpy()
    cols = (["repeat", "Resolution Range (Å)", "bin", "Spacegroup", "CChalf"])
    if not args.overall:
        cols = ["file"] + cols
    result = result[cols]

    emit(result, args)
    lineplot(result, args, x="bin", y="CChalf", labels=labels, bins=args.bins,
             hue=None if args.overall else "file",
             ylabel=r"$\mathrm{CC_{1/2}}$ " + f"({args.method})")
    return result


def main():
    run_analysis(ArgumentParser().parse_args())


if __name__ == "__main__":
    main()
