"""Compute mean I/sigI per resolution bin from careless-tpu output.

Reference behavior: /root/reference/careless/stats/isigi.py.
"""
import os

import numpy as np
import pandas as pd

from ._lib import (BaseParser, bin_by_percentile, emit, lineplot,
                   load_concat, resolution_labels)


class ArgumentParser(BaseParser):
    def __init__(self):
        super().__init__(description=__doc__)
        self.add_argument("mtz", nargs="+", help="Careless output MTZs")
        self.add_argument("-b", "--bins", default=20, type=int,
                          help="Number of resolution bins (default 20).")
        self.add_argument("--intensity-key", dest="I_col", default=None,
                          type=str, help="Intensity key")
        self.add_argument("--uncertainty-key", dest="sigI_col", default=None,
                          type=str, help="Sigma(Intensity) key")
        self.add_argument("--log", action="store_true",
                          help="Logarithmic y-axis.")
        self.add_argument("--overall", action="store_true",
                          help="Pool all mtz files into a single calculation.")


def run_analysis(args):
    ds = load_concat(args.mtz)
    ds["file"] = [m if len(m) < 50 else os.path.basename(m)
                  for m in ds["file"]]
    bins, edges = bin_by_percentile(ds["dHKL"], args.bins, ascending=False)
    ds["bin"] = bins
    labels = resolution_labels(edges)

    from ..io.formatter import get_first_key_of_dtype
    ikey = args.I_col or get_first_key_of_dtype(ds, "J") or "I"
    sigkey = args.sigI_col or get_first_key_of_dtype(ds, "Q") or "SigI"

    grouper = ds.groupby(["bin"] if args.overall else ["file", "bin"])
    result = grouper.apply(lambda x: np.mean(x[ikey] / x[sigkey]),
                           include_groups=False)
    result = pd.DataFrame({"I/sigI": result}).reset_index()
    result["Resolution Range (Å)"] = np.array(labels)[result["bin"]]
    result["Spacegroup"] = grouper["Spacegroup"].first().to_numpy()
    cols = ["Resolution Range (Å)", "bin", "Spacegroup", "I/sigI"]
    if not args.overall:
        cols = ["file"] + cols
    result = result[cols]

    emit(result, args)
    lineplot(result, args, x="bin", y="I/sigI", labels=labels,
             bins=args.bins, hue=None if args.overall else "file",
             ylabel=r"$\mathrm{I/\sigma(I)}$", log=args.log)
    return result


def main():
    run_analysis(ArgumentParser().parse_args())


if __name__ == "__main__":
    main()
