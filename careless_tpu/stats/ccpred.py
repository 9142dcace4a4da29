"""Compute CCpred from careless-tpu output.

Reference behavior: /root/reference/careless/stats/ccpred.py — CC(Iobs,
Ipred) from *_predictions_*.mtz grouped by (file, bin, test), yielding
train/test curves per resolution bin.
"""
import numpy as np
import pandas as pd

from ._lib import (BaseParser, bin_by_percentile, cc_funcs, emit, lineplot,
                   load_concat, resolution_labels)


class ArgumentParser(BaseParser):
    def __init__(self):
        super().__init__(description=__doc__)
        self.add_argument("mtz", nargs="+",
                          help="MTZ(s) containing prediction data")
        self.add_argument("-m", "--method", default="weighted",
                          choices=["weighted", "pearson", "spearman"],
                          help="Correlation method (default weighted).")
        self.add_argument("-b", "--bins", default=10, type=int,
                          help="Number of resolution bins (default 10).")
        self.add_argument("--overall", action="store_true",
                          help="Pool all mtz files into a single calculation.")


def run_analysis(args):
    ds = load_concat(args.mtz)
    bins, edges = bin_by_percentile(ds["dHKL"], args.bins, ascending=False)
    ds["bin"] = bins
    labels = resolution_labels(edges)

    group_keys = ["bin", "test"] if args.overall else ["file", "bin", "test"]
    grouper = ds.groupby(group_keys)
    ccfunc = cc_funcs("Iobs", "Ipred", "SigIobs")[args.method.lower()]

    result = grouper.apply(ccfunc, include_groups=False)
    result = pd.DataFrame({"CCpred": result}).reset_index()
    result["Resolution Range (Å)"] = np.array(labels)[result["bin"]]
    result["Spacegroup"] = grouper["Spacegroup"].first().to_numpy()
    cols = ["Resolution Range (Å)", "bin", "test", "Spacegroup", "CCpred"]
    if not args.overall:
        cols = ["file"] + cols
    result = result[cols]
    result["bin"] = result["bin"].to_numpy("int32")
    result["test"] = np.array(["Train", "Test"])[result["test"]]

    emit(result, args)
    lineplot(result, args, x="bin", y="CCpred", labels=labels, bins=args.bins,
             hue=None if args.overall else "file", style="test",
             ylabel=r"$\mathrm{CC_{pred}}$ " + f"({args.method})")
    return result


def main():
    run_analysis(ArgumentParser().parse_args())


if __name__ == "__main__":
    main()
