"""Compute per-image CCpred from careless-tpu output.

Reference behavior: /root/reference/careless/stats/image_cc.py — CC(Iobs,
Ipred) grouped per image (BATCH) per file.
"""
import numpy as np
import pandas as pd

from ._lib import BaseParser, cc_funcs, emit, lineplot, load_concat


class ArgumentParser(BaseParser):
    def __init__(self):
        super().__init__(description=__doc__)
        self.add_argument("mtz", nargs="+",
                          help="MTZ(s) containing prediction data")
        self.add_argument("-m", "--method", default="weighted",
                          choices=["weighted", "pearson", "spearman"],
                          help="Correlation method (default weighted).")


def run_analysis(args):
    ds = load_concat(args.mtz)
    ds["BATCH"] = (ds["image_id"]
                   - ds.groupby("asu_id")["image_id"].transform("min") + 1)
    grouper = ds.groupby(["file", "BATCH"])
    ccfunc = cc_funcs("Iobs", "Ipred", "SigIobs")[args.method.lower()]

    result = grouper.apply(ccfunc, include_groups=False)
    result = pd.DataFrame({"CCpred": result}).reset_index()
    result["file_id"] = grouper.first()["file_id"].to_numpy()
    result["asu_id"] = grouper.first()["asu_id"].to_numpy()
    result = result[["file", "file_id", "asu_id", "BATCH", "CCpred"]]

    emit(result, args)
    lineplot(result, args, x="BATCH", y="CCpred", hue="file",
             ylabel=r"$\mathrm{CC_{pred}}$ " + f"({args.method})")
    return result


def main():
    run_analysis(ArgumentParser().parse_args())


if __name__ == "__main__":
    main()
