#!/usr/bin/env python
"""Render the quality-parity curves (torch reference vs this framework).

Reads the ``results/quality_parity_*_e{N}.json`` archives written by
``scripts/quality_parity.py`` and draws one PNG of line panels: val ELBO
and val SSIM over epochs, one row per model family present (Cond_SRVAE
arm, plain-VAE arm). Each side's highest-epoch archive is used.

Usage:
  python scripts/plot_parity.py [--out results/quality_parity_curves.png]
"""

from __future__ import annotations

import argparse
import glob
import json
import os

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
OUT_DIR = os.path.join(REPO, "results")

# two-series categorical palette, fixed slot order (reference instance of
# the repo's viz method): slot 1 blue = the torch reference, slot 2
# orange = this framework; ink/grid colors are text tokens, not series hues
C_REF, C_TPU = "#2a78d6", "#eb6834"
INK, INK2, GRID, SURFACE = "#0b0b0b", "#52514e", "#e4e3df", "#fcfcfb"


def _latest(side: str):
    cands = glob.glob(os.path.join(OUT_DIR, f"quality_parity_{side}_e*.json"))
    if not cands:
        return None
    path = max(cands, key=lambda p: int(p.rsplit("_e", 1)[1].split(".")[0]))
    with open(path) as fh:
        return json.load(fh)


def _series(data, key):
    eps = data["epochs"]
    return [e["epoch"] for e in eps], [e[key] for e in eps]


def _seed_replicates(family="cond"):
    """A family's seed replicates, keyed by side.

    Discovery (globs, torchwire exclusion, seed parsing, smoke-run
    filter) is delegated to ``quality_parity.seed_replicates`` so the
    plot and the ``--report_seeds`` table always agree on what counts
    as a replicate. Returns {"reference": [data, ...], "tpu": [...]} or
    None when fewer than two replicates exist on either side (no spread
    to show).
    """
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "quality_parity", os.path.join(REPO, "scripts", "quality_parity.py")
    )
    qp = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(qp)
    groups = qp.seed_replicates(family, min_epochs=40)
    if len(groups["reference"]) < 2 or len(groups["tpu"]) < 2:
        return None
    return {s: [d for _, d in sorted(runs.items())]
            for s, runs in groups.items()}


def _style_axis(ax, title, ylabel):
    """The figure's shared axis styling (titles, ink/grid tokens)."""
    ax.set_title(title, fontsize=10, color=INK, loc="left")
    ax.set_xlabel("epoch", fontsize=9, color=INK2)
    ax.set_ylabel(ylabel, fontsize=9, color=INK2)
    ax.grid(True, color=GRID, linewidth=0.6)
    for spine in ("top", "right"):
        ax.spines[spine].set_visible(False)
    for spine in ("left", "bottom"):
        ax.spines[spine].set_color(GRID)
    ax.tick_params(colors=INK2, labelsize=8)
    ax.margins(x=0.02)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default=os.path.join(OUT_DIR,
                                                  "quality_parity_curves.png"))
    args = ap.parse_args()

    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    arms = []  # (row title, ref data, tpu data, ssim key)
    ref, tpu = _latest("reference"), _latest("tpu")
    if ref and tpu:
        arms.append(("Cond_SRVAE (cr=1.2, ps=64, bs=8)", ref, tpu, "ssim_sr",
                     "val SSIM (SR output)"))
    ref_v, tpu_v = _latest("reference_vae"), _latest("tpu_vae")
    if ref_v and tpu_v:
        arms.append(("VAE (cr=1.28, ps=32, bs=32)", ref_v, tpu_v,
                     "ssim_recon", "val SSIM (reconstruction)"))
    # round-4 high-frequency study: both frameworks against the shared
    # bicubic bar (drawn as a dashed line on the SSIM panel)
    for hf_side_r, hf_side_t, hf_title in (
        ("reference_hf_mid35", "tpu_hf_mid35",
         "synthetic_hf mid_amp 0.35 — SR vs the bicubic bar (cr=1.2, ps=64)"),
        ("reference_hf", "tpu_hf",
         "synthetic_hf — SR vs the bicubic bar (cr=1.2, ps=64)"),
    ):
        ref_h, tpu_h = _latest(hf_side_r), _latest(hf_side_t)
        if ref_h and tpu_h:
            arms.append((hf_title, ref_h, tpu_h, "ssim_sr",
                         "val SSIM (SR output)"))
    if not arms:
        raise SystemExit("no quality_parity archives in results/")
    seed_rows = []  # (row title, groups, ssim key, ssim label)
    for family, title, key, label in (
        ("cond", "Seed spread — Cond_SRVAE small preset (cr=2, ps=32)",
         "ssim_sr", "val SSIM (SR output)"),
        ("vae", "Seed spread — VAE (cr=1.28, ps=32)",
         "ssim_recon", "val SSIM (reconstruction)"),
    ):
        groups = _seed_replicates(family)
        if groups:
            seed_rows.append((title, groups, key, label))

    nrows = len(arms) + len(seed_rows)
    fig, axes = plt.subplots(
        nrows, 2, figsize=(11, 4.2 * nrows), facecolor=SURFACE
    )
    axes = axes.reshape(nrows, 2)
    for row, (title, rd, td, ssim_key, ssim_label) in enumerate(arms):
        for col, (key, ylabel) in enumerate(
            [("val_loss", "val ELBO (lower = tighter bound)"),
             (ssim_key, ssim_label)]
        ):
            ax = axes[row][col]
            ax.set_facecolor(SURFACE)
            # compare over the COMMON epoch range — one side may have a
            # longer archive, and end labels must compare like for like
            n = min(len(rd["epochs"]), len(td["epochs"]))
            for k, (data, color, label) in enumerate(
                ((rd, C_REF, "torch reference"),
                 (td, C_TPU, "this framework"))
            ):
                x, y = _series(data, key)
                x, y = x[:n], y[:n]
                ax.plot(x, y, color=color, linewidth=2, label=label)
                bar = data.get("ssim_baseline") if "ssim" in key else None
                if bar is not None and k == 1:
                    ax.axhline(bar, color="#888888", linestyle="--",
                               linewidth=1.2)
                    ax.annotate(f"bicubic {bar:.3f}", xy=(x[0], bar),
                                xytext=(2, 3), textcoords="offset points",
                                fontsize=8, color="#666666")
                # selective direct label at the line end (staggered so two
                # converged series don't collide)
                ax.annotate(
                    f"{y[-1]:,.0f}" if abs(y[-1]) > 10 else f"{y[-1]:.3f}",
                    (x[-1], y[-1]), textcoords="offset points",
                    xytext=(4, 9 - 18 * k), fontsize=8, color=INK2,
                )
            _style_axis(ax, title, ylabel)
    # seed-spread rows: every replicate as its own thin line, so the
    # cross-framework gap can be read against each side's own
    # seed-to-seed spread (the seed policy makes this THE comparison)
    for i, (row_title, groups, ssim_key, ssim_label) in enumerate(seed_rows):
        row = len(arms) + i
        # common epoch range: replicate lengths differ (e40 vs e80 runs)
        n = min(len(d["epochs"]) for s in groups.values() for d in s)
        for col, (key, ylabel) in enumerate(
            [("val_loss", "val ELBO (lower = tighter bound)"),
             (ssim_key, ssim_label)]
        ):
            ax = axes[row][col]
            ax.set_facecolor(SURFACE)
            for side, color in (("reference", C_REF), ("tpu", C_TPU)):
                for data in groups[side]:
                    x, y = _series(data, key)
                    ax.plot(x[:n], y[:n], color=color, linewidth=1.2,
                            alpha=0.75)
            title = (row_title if col == 0 else
                     f"{len(groups['reference'])}+"
                     f"{len(groups['tpu'])} seed replicates")
            _style_axis(ax, title, ylabel)
    # one legend for the figure (2 series, also direct-labeled)
    handles, labels = axes[0][0].get_legend_handles_labels()
    fig.legend(handles, labels, loc="upper right", fontsize=9,
               frameon=False, labelcolor=INK)
    fig.suptitle(
        "Quality parity at matched config — identical data, params, "
        "optimizer (scripts/quality_parity.py)",
        fontsize=11, color=INK, x=0.01, ha="left",
    )
    fig.tight_layout(rect=(0, 0, 1, 0.95))
    fig.savefig(args.out, dpi=150)
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
