"""Rescale careless-tpu output to match a given Wilson b-factor.

Reference behavior: /root/reference/careless/stats/rescale.py — F,SigF
scaled by exp(-B/4d^2); I,SigI by exp(-B/2d^2).
"""
import argparse

import numpy as np

from ..xtal import read_mtz, write_mtz


class ArgumentParser(argparse.ArgumentParser):
    def __init__(self):
        super().__init__(formatter_class=argparse.RawTextHelpFormatter,
                         description=__doc__)
        self.add_argument("mtz_in", help="Merged MTZ to rescale")
        self.add_argument("mtz_out", help="Where to write the rescaled MTZ")
        self.add_argument("-b", "--wilson-b", type=float, required=True,
                          help="Wilson B-factor (Å²) to impose on the output")


def run_analysis(parser):
    ds = read_mtz(parser.mtz_in)
    dHKL = ds.compute_dHKL(inplace=False)["dHKL"].to_numpy(np.float32)
    id2 = np.reciprocal(np.square(dHKL))
    B = parser.wilson_b
    f_factor = np.exp(-0.25 * B * id2)
    i_factor = np.exp(-0.5 * B * id2)
    # handles both plain (F/SigF/I/SigI) and anomalous (+/-) column layouts
    for col in ds.columns:
        root = col.replace("(+)", "").replace("(-)", "")
        if root in ("F", "SigF"):
            ds[col] = ds[col] * f_factor
        elif root in ("I", "SigI"):
            ds[col] = ds[col] * i_factor
    ds.drop(columns=["dHKL"], errors="ignore", inplace=True)
    write_mtz(ds, parser.mtz_out)
    return ds


def main():
    run_analysis(ArgumentParser().parse_args())


if __name__ == "__main__":
    main()
