"""Live run monitors: terminal tree view and matplotlib charts.

Reference counterpart: pavlov/stats/monitoring.py (tree-formatted live stat
display, :75-117) and stats/plotting.py (live Bokeh charts) — rendered here
as a refreshing text monitor and matplotlib figure grids grouped by channel
prefix.
"""
from __future__ import annotations

import time

from . import logs, stats


def tree_view(run, rule="60s"):
    """Stats grouped by dotted-prefix into an indented tree (reference
    monitoring.py:75-117)."""
    lines = []
    groups = {}
    for c in stats.channels(run):
        head, _, tail = c.partition(".")
        groups.setdefault(head, []).append((tail or head, c))
    for head in sorted(groups):
        lines.append(head)
        for tail, channel in sorted(groups[head]):
            try:
                r = stats.resampled(run, channel, rule).dropna()
                val = r.iloc[-1] if len(r) else float("nan")
                if hasattr(val, "items"):
                    val = " ".join(f"{k}={v:.4g}" for k, v in val.items())
                else:
                    val = f"{val:.6g}"
            except Exception as e:
                val = f"<{e}>"
            lines.append(f"  {tail:<28} {val}")
    return "\n".join(lines)


def monitor(run, rule="60s", interval=10, iterations=None):
    """Refreshing terminal monitor: stats tree + log tail (reference
    stats/monitoring.py + logs tailer)."""
    i = 0
    while iterations is None or i < iterations:
        print("\x1b[2J\x1b[H", end="")  # clear screen
        print(tree_view(run, rule))
        print("\n--- logs ---")
        print(logs.tail(run, 8))
        time.sleep(interval)
        i += 1


def plot(run, channels=None, rule="60s"):
    """Matplotlib grid of resampled channels grouped by prefix (reference
    stats/plotting.py)."""
    import matplotlib.pyplot as plt

    channels = channels or stats.channels(run)
    n = len(channels)
    if n == 0:
        return None
    cols = min(3, n)
    rows = -(-n // cols)
    fig, axes = plt.subplots(rows, cols, figsize=(4 * cols, 2.5 * rows), squeeze=False)
    for ax, c in zip(axes.flat, channels):
        try:
            r = stats.resampled(run, c, rule).dropna()
            r.plot(ax=ax)
        except Exception:
            pass
        ax.set_title(c, fontsize=8)
        ax.grid(alpha=0.25)
    for ax in axes.flat[n:]:
        ax.axis("off")
    fig.tight_layout()
    return fig
