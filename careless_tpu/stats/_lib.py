"""Shared machinery for the post-hoc statistics CLIs.

Reference behavior: /root/reference/careless/stats/*.py — every CLI reads
careless output MTZs, bins by resolution percentiles, groups, applies a CC
or summary function, prints/saves a CSV, and draws a seaborn lineplot.
Pure pandas/matplotlib; no model involvement.
"""
from __future__ import annotations

import argparse
from typing import List, Optional

import numpy as np
import pandas as pd

from ..xtal import DataSet, read_mtz


class BaseParser(argparse.ArgumentParser):
    """Common flags (reference careless/stats/parser.py:21-69)."""

    def __init__(self, **kwargs):
        super().__init__(formatter_class=argparse.RawTextHelpFormatter, **kwargs)
        self.add_argument("-s", "--show", action="store_true",
                          help="Make a plot of the results and display it "
                               "using matplotlib.")
        self.add_argument("-i", "--image", type=str, default=None,
                          help="Make a plot of the results and save it to "
                               "this filename.")
        self.add_argument("-o", "--output", type=str, default=None,
                          help="Optionally save results to this file in csv "
                               "format instead of printing them.")
        self.add_argument("-l", "--ylim", type=float, nargs=2, default=None,
                          help="Override the y-axis limits like `--ylim 0. 1.`")
        self.add_argument("--height", default=6, type=float,
                          help="Height of the plot (inches, default 6).")
        self.add_argument("--width", default=6, type=float,
                          help="Width of the plot (inches, default 6).")


def bin_by_percentile(data, bins: int = 10, ascending: bool = False):
    """Assign percentile bins; returns (labels, edges)
    (rs.utils.bin_by_percentile semantics)."""
    data = np.asarray(data, dtype=np.float64)
    qs = np.linspace(0, 100, bins + 1)
    edges = np.percentile(data, qs)
    if not ascending:
        edges = edges[::-1]
        labels = (bins - 1) - np.clip(
            np.searchsorted(edges[::-1], data, side="left") - 1, 0, bins - 1)
    else:
        labels = np.clip(np.searchsorted(edges, data, side="right") - 1,
                         0, bins - 1)
    return labels.astype(np.int64), edges


def weighted_pearsonr(x, y, w):
    """Weighted Pearson correlation (rs.utils.weighted_pearsonr)."""
    x = np.asarray(x, np.float64)
    y = np.asarray(y, np.float64)
    w = np.asarray(w, np.float64)
    sw = w.sum()
    mx = (w * x).sum() / sw
    my = (w * y).sum() / sw
    cov = (w * (x - mx) * (y - my)).sum() / sw
    vx = (w * np.square(x - mx)).sum() / sw
    vy = (w * np.square(y - my)).sum() / sw
    denom = np.sqrt(vx * vy)
    if denom == 0.0:  # zero-variance group: correlation undefined
        return np.nan
    return cov / denom


def stack_anomalous(ds: DataSet) -> DataSet:
    """Two-column (+/-) anomalous format -> one row per Friedel sign
    (inverse of the manager's unstack; rs stack_anomalous semantics)."""
    plus_cols = [c for c in ds.columns if c.endswith("(+)")]
    minus_cols = [c for c in ds.columns if c.endswith("(-)")]
    other = [c for c in ds.columns
             if c not in plus_cols + minus_cols]
    hkl = ds[["H", "K", "L"]].to_numpy(np.int64)

    plus = pd.DataFrame({c[:-3]: ds[c].to_numpy() for c in plus_cols})
    for c in other:
        plus[c] = ds[c].to_numpy()
    plus[["H", "K", "L"]] = hkl

    minus = pd.DataFrame({c[:-3]: ds[c].to_numpy() for c in minus_cols})
    for c in other:
        minus[c] = ds[c].to_numpy()
    minus[["H", "K", "L"]] = -hkl

    out = pd.concat([plus, minus], ignore_index=True)
    value_cols = sorted({c[:-3] for c in plus_cols})
    out = out.dropna(subset=[c for c in value_cols if c in out.columns])
    result = DataSet(out, cell=ds.cell, spacegroup=ds.spacegroup,
                     mtz_dtypes={})
    return result


def read_careless_mtz(path: str) -> DataSet:
    """Read + normalize column aliases the way the stats CLIs expect."""
    ds = read_mtz(path)
    ds = ds.rename(columns={"SIGI": "SigI", "SIGF": "SigF"})
    ds = DataSet(ds).copy_context_from(ds)
    return ds


def sg_name(ds: DataSet) -> str:
    sg = ds.spacegroup
    if sg is None:
        return "unknown"
    return sg.hm or sg.hall or f"{sg.n_ops} ops"


def load_concat(paths: List[str], transform=None) -> DataSet:
    frames = []
    first = None
    for m in paths:
        ds = read_careless_mtz(m)
        if transform is not None:
            ds = transform(ds)
        ds.compute_dHKL(inplace=True)
        ds["file"] = m
        ds["Spacegroup"] = sg_name(ds)
        if first is None:
            first = ds
        frames.append(pd.DataFrame(ds))
    out = DataSet(pd.concat(frames, ignore_index=True))
    if first is not None:
        out.copy_context_from(first)
    return out


def resolution_labels(edges) -> List[str]:
    return [f"{e1:0.2f} - {e2:0.2f}" for e1, e2 in zip(edges[:-1], edges[1:])]


def cc_funcs(key1: str, key2: str, sig1: Optional[str] = None,
             sig2: Optional[str] = None):
    """(pearson, spearman, weighted) CC functions over a grouped frame."""

    def pearson(df):
        return df[[key1, key2]].corr(method="pearson")[key1][key2]

    def spearman(df):
        return df[[key1, key2]].corr(method="spearman")[key1][key2]

    def weighted(df):
        w = np.reciprocal(
            np.square(df[sig1].to_numpy(np.float64))
            + (np.square(df[sig2].to_numpy(np.float64)) if sig2 else 0.0))
        return weighted_pearsonr(df[key1].to_numpy(np.float64),
                                 df[key2].to_numpy(np.float64), w)

    return {"pearson": pearson, "spearman": spearman, "weighted": weighted}


def emit(result: pd.DataFrame, args) -> None:
    if args.output is not None:
        result.to_csv(args.output)
    else:
        print(result.to_string())


def lineplot(result, args, x, y, labels=None, bins=None, hue=None,
             style=None, ylabel=None, log=False):
    import matplotlib
    matplotlib.use("Agg" if not args.show else matplotlib.get_backend())
    import matplotlib.pyplot as plt
    import seaborn as sns

    plot_kwargs = {"data": result, "x": x, "y": y}
    if hue is None:
        plot_kwargs["color"] = "k"
    else:
        plot_kwargs["hue"] = hue
        plot_kwargs["palette"] = "Dark2"
    if style is not None:
        plot_kwargs["style"] = style
    plt.figure(figsize=(args.width, args.height))
    ax = sns.lineplot(**plot_kwargs)
    if log:
        ax.set(yscale="log")
    if labels is not None and bins is not None:
        plt.xticks(range(bins), labels, rotation=45, ha="right",
                   rotation_mode="anchor")
    if ylabel:
        plt.ylabel(ylabel)
    plt.xlabel("Resolution ($\\mathrm{\\AA}$)")
    plt.grid(which="both", axis="both", ls="dashdot")
    if args.ylim is not None:
        plt.ylim(args.ylim)
    plt.tight_layout()
    if args.image is not None:
        plt.savefig(args.image)
    if args.show:
        plt.show()
    plt.close("all")
