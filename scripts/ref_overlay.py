"""Quantitative comparison against the reference's PUBLISHED 9x9 frontier
(r4 VERDICT next-step #4).

The reference's headline figure (docs/flops_curves.svg, produced by
analysis/data.py:73-145) is committed as vector data: per-run Elo-vs-FLOP
curves plus a 101-point FRONTIER envelope per boardsize (the last 7 line2d
elements, one color per boardsize 3..9), on calibrated log-FLOP / Elo axes
("Elo v. perfect play", MoHex-anchored). This script

  1. parses the SVG axes + frontier paths back into data
     -> results/scaling/ref_frontier_svg.csv
  2. fits the same changepoint shape (elo = clip(max(plateau, slope*logF+b),
     <=0)) to the reference frontier per boardsize
  3. overlays the repo's committed 9x9 frontier (results/scaling/
     frontier_b9.csv, league-relative Elo) on the reference's absolute curve
     with a least-squares vertical offset over the shared FLOP range
     -> results/scaling/ref_overlay_b9.png + ref_overlay_b9.json

The repo's Elo scale is league-relative (best agent = 0); the reference's is
vs perfect play. Slopes and changepoints are anchor-free and compared
directly; the offset is reported, not interpreted.

Usage: python scripts/ref_overlay.py
"""
import json
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

SVG = "/root/reference/docs/flops_curves.svg"
OUT = "results/scaling"

# axis calibration from the SVG's major gridlines (see parse_axes)
BOARD_COLORS = {  # frontier draw order = boardsize order; colors verified
    "#a82c24": 3, "#a89d24": 4, "#42a824": 5, "#24a877": 6,
    "#2468a8": 7, "#5224a8": 8, "#a8248d": 9,
}


def parse_axes(svg):
    """Pixel->data calibration from the labeled major gridlines: x majors at
    1e11/1e14/1e17 FLOPs, y majors at -2000..0 Elo (500 apart)."""
    gx = re.findall(r'<g id="xtick_\d+">.*?d="M ([\d.]+) 126', svg, re.S)
    gy = re.findall(r'<g id="ytick_\d+">.*?d="M 40.29 ([\d.]+)', svg, re.S)
    gx = np.array(sorted(set(float(x) for x in gx)))
    gy = np.array(sorted(set(float(y) for y in gy)))
    # majors are the ticks the three x / five y labels sit on: for x the
    # log-minor ticks cluster, majors are exactly evenly spaced — recover
    # them as the widest even triple
    x_major = [gx.min(), None, gx.max()]
    span = gx.max() - gx.min()
    mid = gx[np.argmin(np.abs(gx - (gx.min() + span / 2)))]
    x_major[1] = mid
    px_per_decade = (x_major[2] - x_major[0]) / 6.0  # 1e11 -> 1e17
    assert abs((x_major[1] - x_major[0]) - 3 * px_per_decade) < 0.5, x_major
    # y majors: -2000 .. 0 every 500, minors every 250 — majors are every
    # second sorted gridline starting from the bottom-most (=-2000)... the
    # SVG lists majors then minors; recover by spacing fit instead
    y_sorted = np.sort(gy)
    dy = np.min(np.diff(y_sorted))  # 250-Elo pitch
    y0 = y_sorted.min()  # top line = 0 Elo? top of axes = HIGHEST elo
    # smallest pixel y = topmost = 0 Elo line is the minor at +? The labeled
    # range is -2000..0, topmost major. Calibrate: 500 Elo = 2*dy pixels.
    elo_per_px = 500.0 / (2 * dy)
    return {
        "x0_px": x_major[0], "x0_log10f": 11.0, "px_per_decade": px_per_decade,
        "y_zero_px": y0, "elo_per_px": elo_per_px,
    }


def parse_frontiers(svg, cal):
    """The 7 trailing 101-point paths are the per-boardsize frontier
    envelopes."""
    curves = re.findall(
        r'<g id="line2d_(\d+)">\s*<path clip-path="[^"]*" d="([^"]+)" '
        r'style="([^"]*?)"', svg)
    fronts = {}
    for cid, d, style in curves:
        pts = re.findall(r'[ML] ([\d.\-]+) ([\d.\-]+)', d)
        m = re.search(r"stroke:(#\w+)", style)
        if len(pts) != 101 or not m or m.group(1) not in BOARD_COLORS:
            continue
        b = BOARD_COLORS[m.group(1)]
        xy = np.array(pts, float)
        logf = cal["x0_log10f"] + (xy[:, 0] - cal["x0_px"]) / cal["px_per_decade"]
        elo = -(xy[:, 1] - cal["y_zero_px"]) * cal["elo_per_px"]
        fronts[b] = np.stack([logf, elo], 1)
    assert set(fronts) == set(BOARD_COLORS.values()), sorted(fronts)
    return fronts


def fit_changepoint(logf, elo):
    """elo = min(0, max(plateau, slope*logf + b)) by changepoint grid search
    + per-segment least squares — the reference's frontier shape
    (analysis/data.py:85-125) for a single boardsize."""
    best = None
    for cp in np.linspace(logf.min(), logf.max() - 0.5, 120):
        lo = elo[logf <= cp]
        hi_mask = logf > cp
        if hi_mask.sum() < 3:
            continue
        plateau = lo.mean() if len(lo) else elo.min()
        A = np.stack([logf[hi_mask], np.ones(hi_mask.sum())], 1)
        coef, *_ = np.linalg.lstsq(A, elo[hi_mask], rcond=None)
        pred = np.minimum(0.0, np.maximum(plateau, logf * coef[0] + coef[1]))
        rmse = float(np.sqrt(np.mean((pred - elo) ** 2)))
        if best is None or rmse < best["rmse"]:
            best = {"rmse": rmse, "slope_elo_per_decade": float(coef[0]),
                    "intercept": float(coef[1]), "plateau_elo": float(plateau),
                    "changepoint_log10_flops": float((plateau - coef[1]) / coef[0])}
    return best


def main():
    svg = open(SVG).read()
    cal = parse_axes(svg)
    fronts = parse_frontiers(svg, cal)

    os.makedirs(OUT, exist_ok=True)
    import pandas as pd

    rows = []
    for b, xy in sorted(fronts.items()):
        for logf, elo in xy:
            rows.append({"boardsize": b, "log10_flops": logf, "elo_vs_perfect": elo})
    pd.DataFrame(rows).to_csv(f"{OUT}/ref_frontier_svg.csv", index=False)

    fits = {b: fit_changepoint(xy[:, 0], xy[:, 1]) for b, xy in fronts.items()}

    # repo frontier (league-relative nats -> Elo), envelope-interpolated the
    # same way the committed fit was produced
    from boardlaw_tpu.scaling import data as sdata

    summary = {"calibration": cal,
               "ref_fits": {str(b): f for b, f in sorted(fits.items())}}
    comparisons = {}
    overlay = {}
    for b in (7, 9):
        csv = f"{OUT}/frontier_b{b}.csv"
        if not os.path.exists(csv):
            continue
        df = pd.read_csv(csv, index_col=0)
        fr = sdata.interp_frontier(df).reset_index()
        logf = np.log10(fr.train_flops.values)
        repo_elo = fr.elo.values * sdata.ELO
        ref = fronts[b]
        # least-squares vertical offset over the shared FLOP range
        mask = (logf >= ref[:, 0].min()) & (logf <= ref[:, 0].max())
        ref_interp = np.interp(logf[mask], ref[:, 0], ref[:, 1])
        offset = float(np.mean(ref_interp - repo_elo[mask]))
        resid = ref_interp - (repo_elo[mask] + offset)
        repo_fit = fit_changepoint(logf, repo_elo)
        comparisons[str(b)] = {
            "ref_slope_elo_per_decade": fits[b]["slope_elo_per_decade"],
            "repo_slope_elo_per_decade": repo_fit["slope_elo_per_decade"],
            "ref_changepoint_log10_flops": fits[b]["changepoint_log10_flops"],
            "repo_changepoint_log10_flops": repo_fit["changepoint_log10_flops"],
            "offset_elo_repo_to_ref": offset,
            "overlap_rmse_elo": float(np.sqrt(np.mean(resid ** 2))),
            "repo_flops_decades": float(logf.max() - logf.min()),
            "ref_flops_decades": float(ref[:, 0].max() - ref[:, 0].min()),
        }
        overlay[b] = (logf, repo_elo + offset, ref)
    summary["comparison"] = comparisons

    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    fig, axes = plt.subplots(1, len(overlay), figsize=(6 * len(overlay), 4.5),
                             squeeze=False)
    for ax, (b, (logf, repo_elo, ref)) in zip(axes[0], sorted(overlay.items())):
        ax.plot(ref[:, 0], ref[:, 1], color="0.3", lw=2,
                label="reference frontier (SVG)")
        ax.plot(logf, repo_elo, "-o", ms=3, color="#2468a8",
                label="this repo (offset-aligned)")
        ax.set_title(f"{b}x{b} Hex: Elo vs train compute")
        ax.set_xlabel("log10 train FLOPs")
        ax.set_ylabel("Elo (reference scale: vs perfect play)")
        ax.legend(fontsize=8)
        ax.grid(alpha=0.3)
    fig.tight_layout()
    fig.savefig(f"{OUT}/ref_overlay_b9.png", dpi=150)

    with open(f"{OUT}/ref_overlay_b9.json", "w") as f:
        json.dump(summary, f, indent=2)
    print(json.dumps(summary["comparison"], indent=2))


if __name__ == "__main__":
    main()
