"""Compute CCanom from careless-tpu output.

Reference behavior: /root/reference/careless/stats/ccanom.py — Danom =
F(+) - F(-) per half (requiring N(+)>0 and N(-)>0), correlated between
halves per resolution bin.
"""
import numpy as np
import pandas as pd

from ._lib import (BaseParser, bin_by_percentile, cc_funcs, emit, lineplot,
                   load_concat, resolution_labels)


class ArgumentParser(BaseParser):
    def __init__(self):
        super().__init__(description=__doc__)
        self.add_argument("mtz", nargs="+",
                          help="MTZs containing crossvalidation data")
        self.add_argument("-m", "--method", default="weighted",
                          choices=["weighted", "pearson", "spearman"],
                          help="Correlation method (default weighted, "
                               "consistent with XDS).")
        self.add_argument("-b", "--bins", default=10, type=int,
                          help="Number of resolution bins (default 10).")
        self.add_argument("--overall", action="store_true",
                          help="Pool all mtz files into a single calculation.")


def make_halves_ccanom(mtz):
    mtz = mtz.loc[(mtz["N(+)"] > 0) & (mtz["N(-)"] > 0)]
    half1 = mtz.loc[mtz.half == 0].copy()
    half2 = mtz.loc[mtz.half == 1].copy()
    for h in (half1, half2):
        h["Danom"] = h["F(+)"] - h["F(-)"]
        h["SigDanom"] = np.sqrt(np.square(h["SigF(+)"])
                                + np.square(h["SigF(-)"]))
    out = pd.merge(half1[["H", "K", "L", "Danom", "SigDanom", "repeat"]],
                   half2[["H", "K", "L", "Danom", "SigDanom", "repeat"]],
                   on=["H", "K", "L", "repeat"], suffixes=("1", "2"))
    from ..xtal import DataSet
    return DataSet(out).copy_context_from(mtz)


def run_analysis(args):
    ds = load_concat(args.mtz, transform=make_halves_ccanom)
    bins, edges = bin_by_percentile(ds["dHKL"], args.bins, ascending=False)
    ds["bin"] = bins
    labels = resolution_labels(edges)

    group_keys = (["bin", "repeat"] if args.overall
                  else ["file", "bin", "repeat"])
    grouper = ds.groupby(group_keys)
    ccfunc = cc_funcs("Danom1", "Danom2", "SigDanom1",
                      "SigDanom2")[args.method.lower()]

    result = grouper.apply(ccfunc, include_groups=False)
    result = pd.DataFrame({"CCanom": result}).reset_index()
    result["Resolution Range (Å)"] = np.array(labels)[result["bin"]]
    result["Spacegroup"] = grouper["Spacegroup"].first().to_numpy()
    cols = ["repeat", "Resolution Range (Å)", "bin", "Spacegroup", "CCanom"]
    if not args.overall:
        cols = ["file"] + cols
    result = result[cols]

    emit(result, args)
    lineplot(result, args, x="bin", y="CCanom", labels=labels, bins=args.bins,
             hue=None if args.overall else "file",
             ylabel=r"$\mathrm{CC_{anom}}$ " + f"({args.method})")
    return result


def main():
    run_analysis(ArgumentParser().parse_args())


if __name__ == "__main__":
    main()
