"""Filter reflections by image based on CCpred.

Reference behavior: /root/reference/careless/stats/filter_by_image_cc.py —
compute per-image CCpred from predictions files, then filter the original
unmerged MTZs by a CC cutoff, writing *_filtered.mtz. Predictions vs data
files are distinguished by filename pattern.
"""
import argparse
import re

import pandas as pd

from ..io.formatter import get_first_key_of_dtype
from ..xtal import read_mtz, write_mtz
from ._lib import cc_funcs, load_concat


class ArgumentParser(argparse.ArgumentParser):
    def __init__(self):
        super().__init__(description=__doc__)
        self.add_argument(
            "mtzs", nargs="+",
            help="A mix of *_predictions_#.mtz files and unmerged input "
                 "files. Filenames are used to interpret what they are; the "
                 "unmerged files must be in the order presented to careless.")
        self.add_argument("-m", "--method", default="weighted",
                          choices=["weighted", "pearson", "spearman"])
        self.add_argument("-c", "--cc-cutoff", required=True, type=float,
                          help="The correlation cutoff, between 0 and 1.")
        self.add_argument("-o", default=None, help="Output filename base.")


def is_predictions_filename(filename: str) -> bool:
    return re.match(r".+predictions_[0-9]+\.mtz$", filename) is not None


def predictions_id(filename: str) -> int:
    return int(filename[:-4].split("_")[-1])


def run_analysis(args):
    data_mtzs = [f for f in args.mtzs if not is_predictions_filename(f)]
    predictions_mtzs = sorted(
        (f for f in args.mtzs if is_predictions_filename(f)),
        key=predictions_id)

    ds = load_concat(predictions_mtzs)
    grouper = ds.groupby(["file", "image_id"])
    ccfunc = cc_funcs("Iobs", "Ipred", "SigIobs")[args.method.lower()]
    result = grouper.apply(ccfunc, include_groups=False)
    result = pd.DataFrame({"CCpred": result}).reset_index()
    result["file_id"] = grouper.first()["file_id"].to_numpy()
    result["asu_id"] = grouper.first()["asu_id"].to_numpy()

    outputs = []
    for i, m in enumerate(data_mtzs):
        ds = read_mtz(m)
        out = (m[:-4] + "_filtered.mtz" if args.o is None
               else args.o + f"_{i}.mtz")
        batch_key = get_first_key_of_dtype(ds, "B")
        image_id = ds.groupby(batch_key).ngroup().to_numpy()
        cc = (result[result.file_id == i].iloc[image_id]["CCpred"].to_numpy())
        keep = cc >= args.cc_cutoff
        filtered = ds[keep].copy()
        filtered = type(ds)(filtered).copy_context_from(ds)
        write_mtz(filtered, out)
        outputs.append(out)
    return outputs


def main():
    run_analysis(ArgumentParser().parse_args())


if __name__ == "__main__":
    main()
