"""Render the careless-tpu probabilistic graphical model as a plate
diagram (doc/model.md has the textual form). Parity artifact with the
reference's doc/figures/careless_pgm.py, drawn from scratch with plain
matplotlib.

Usage: python doc/figures/pgm.py [out.png]
"""
import sys

import matplotlib
matplotlib.use("Agg")
import matplotlib.pyplot as plt
from matplotlib.patches import Circle, FancyArrowPatch, Rectangle


def node(ax, xy, label, observed=False, deterministic=False, r=0.32):
    face = "#d9d9d9" if observed else "white"
    ls = "--" if deterministic else "-"
    ax.add_patch(Circle(xy, r, facecolor=face, edgecolor="black",
                        linestyle=ls, zorder=3))
    ax.text(*xy, label, ha="center", va="center", fontsize=11, zorder=4)


def arrow(ax, a, b, shrink=0.36):
    ax.add_patch(FancyArrowPatch(a, b, arrowstyle="-|>", mutation_scale=14,
                                 shrinkA=shrink * 72 * 0.5,
                                 shrinkB=shrink * 72 * 0.5,
                                 color="black", zorder=2))


def plate(ax, x0, y0, x1, y1, label):
    ax.add_patch(Rectangle((x0, y0), x1 - x0, y1 - y0, fill=False,
                           edgecolor="black", linewidth=1.0, zorder=1))
    ax.text(x1 - 0.08, y0 + 0.12, label, ha="right", va="bottom",
            fontsize=9, style="italic")


def main(out="doc/figures/pgm.png"):
    fig, ax = plt.subplots(figsize=(7.2, 4.6))
    ax.set_xlim(0, 8.6)
    ax.set_ylim(0, 5.4)
    ax.axis("off")

    # reflection plate: prior hyperparams -> F_h
    node(ax, (1.2, 4.4), r"$\epsilon_h$", deterministic=True)
    node(ax, (2.4, 4.4), r"$c_h$", deterministic=True)
    node(ax, (1.8, 3.3), r"$F_h$")
    arrow(ax, (1.2, 4.4), (1.8, 3.3))
    arrow(ax, (2.4, 4.4), (1.8, 3.3))
    plate(ax, 0.5, 2.7, 3.1, 5.1, r"reflections $h \in$ ASU")

    # observation plate
    node(ax, (4.2, 4.4), r"$x_i$", observed=True)
    node(ax, (5.8, 4.4), r"$\theta$")
    node(ax, (4.8, 3.3), r"$\Sigma_i$")
    arrow(ax, (4.2, 4.4), (4.8, 3.3))
    arrow(ax, (5.8, 4.4), (4.8, 3.3))
    node(ax, (3.6, 2.1), r"$I_i$", deterministic=True)
    arrow(ax, (1.8, 3.3), (3.6, 2.1))
    arrow(ax, (4.8, 3.3), (3.6, 2.1))
    node(ax, (5.2, 1.0), r"$I_g$", deterministic=True)
    arrow(ax, (3.6, 2.1), (5.2, 1.0))
    node(ax, (7.0, 1.0), r"$I^{obs}_g$", observed=True)
    node(ax, (7.6, 2.3), r"$\sigma^{obs}_g$", observed=True)
    arrow(ax, (5.2, 1.0), (7.0, 1.0))
    arrow(ax, (7.6, 2.3), (7.0, 1.0))
    plate(ax, 3.0, 1.6, 6.4, 5.1, r"observations $i$")
    plate(ax, 2.9, 0.4, 8.3, 1.65, r"harmonic groups $g$ (Laue)")

    ax.text(1.8, 2.45, "Wilson prior", ha="center", fontsize=8)
    ax.text(4.8, 2.62, "MLP scaler", ha="center", fontsize=8)
    ax.text(4.35, 1.78, r"$I_i=\Sigma_i F_{h(i)}^2$", fontsize=8)
    ax.text(6.1, 0.62, r"$I_g=\sum_{i\in g} I_i$", fontsize=8)
    ax.text(7.0, 0.35, "likelihood", ha="center", fontsize=8)

    fig.tight_layout()
    fig.savefig(out, dpi=160)
    print(f"wrote {out}")


if __name__ == "__main__":
    main(*sys.argv[1:])
