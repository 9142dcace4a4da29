"""Compute completeness from careless-tpu output.

Reference behavior: /root/reference/careless/stats/completeness.py, which
wraps rs.stats.compute_completeness: fraction of the reciprocal ASU observed
per resolution bin (plus an overall row, printed first). Expected counts
come from this package's own ASU generator.
"""
import numpy as np
import pandas as pd

from ._lib import BaseParser, bin_by_percentile, emit, read_careless_mtz


class ArgumentParser(BaseParser):
    def __init__(self):
        super().__init__(description=__doc__)
        self.add_argument("mtz", help="MTZ containing merged data")
        self.add_argument("-b", "--bins", default=10, type=int,
                          help="Number of resolution bins (default 10).")


def compute_completeness(ds, bins: int = 10) -> pd.DataFrame:
    """Observed / expected unique reflections per resolution bin."""
    anomalous = "F(+)" in ds.columns
    ds = ds.compute_dHKL(inplace=False)
    d = ds["dHKL"].to_numpy(np.float64)
    labels, edges = bin_by_percentile(d, bins, ascending=False)

    dmin = float(d.min())
    sg, cell = ds.spacegroup, ds.cell
    asu = sg.generate_reciprocal_asu(cell, dmin, anomalous=False)
    asu_d = cell.compute_d(asu)
    centric = sg.is_centric(asu)

    hkl = ds[["H", "K", "L"]].to_numpy(np.int64)
    hkl_plus, _ = sg.map_to_asu(hkl)
    observed = {tuple(h) for h in hkl_plus}
    if anomalous:
        has_minus = ~ds["F(-)"].isna().to_numpy()

    rows = []
    ranges = list(zip(edges[:-1], edges[1:])) + [(edges[0], edges[-1])]
    names = [f"{e1:0.2f} - {e2:0.2f}" for e1, e2 in ranges[:-1]] + ["overall"]
    for (dmax_e, dmin_e), name in zip(ranges, names):
        lo, hi = min(dmax_e, dmin_e), max(dmax_e, dmin_e)
        sel = (asu_d >= lo - 1e-9) & (asu_d <= hi + 1e-9) if name != "overall" \
            else np.ones(len(asu), bool)
        expected = asu[sel]
        n_exp = len(expected)
        n_obs = sum(1 for h in expected if tuple(h) in observed)
        row = {"Resolution Range (Å)": name,
               "all": n_obs / max(n_exp, 1)}
        if anomalous:
            exp_acentric = expected[~centric[sel]]
            obs_minus = {tuple(h) for h, m in zip(hkl_plus, has_minus) if m}
            n_anom = sum(1 for h in exp_acentric
                         if tuple(h) in observed and tuple(h) in obs_minus)
            row["anomalous"] = n_anom / max(len(exp_acentric), 1)
        rows.append(row)
    # overall first (reference rolls it to the front)
    rows = [rows[-1]] + rows[:-1]
    return pd.DataFrame(rows)


def run_analysis(args):
    ds = read_careless_mtz(args.mtz)
    results = compute_completeness(ds, bins=args.bins)

    emit(results, args)

    import matplotlib
    matplotlib.use("Agg" if not args.show else matplotlib.get_backend())
    import matplotlib.pyplot as plt
    import seaborn as sns
    xlabel = "Resolution Range (Å)"
    plt.figure(figsize=(args.width, args.height))
    sns.lineplot(data=results.melt(xlabel), x=xlabel, y="value",
                 hue="variable", palette="Dark2")
    plt.xticks(rotation=45, rotation_mode="anchor", ha="right")
    plt.legend(title="")
    plt.ylabel("Completeness")
    plt.grid(which="both", axis="both", ls="dashdot")
    if args.ylim is not None:
        plt.ylim(args.ylim)
    plt.tight_layout()
    if args.image is not None:
        plt.savefig(args.image)
    if args.show:
        plt.show()
    plt.close("all")
    return results


def main():
    run_analysis(ArgumentParser().parse_args())


if __name__ == "__main__":
    main()
