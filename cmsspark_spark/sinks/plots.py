"""Driver-side plot mile: aggregated DataFrame → SVG chart files.

Replicates the reference's matplotlib report plots — the stacked
month×tier event-count bars (dbs_event_count_plot.py:52-107,214-253),
the multi-series time lines (hpc_running_cores_and_corehr.py /
condor_hs06coreHrPlot.py), and the per-site PB pies
(reports/visualize_campaigns.py:105-117) — as self-contained SVG
written from scratch (matplotlib is not in this container; SVG is a
plain-text vector format, so the plot mile needs no native deps).

Scale note: like the HTML report sink (report.py), this is BY
DEFINITION driver-side and only for aggregated results — ``max_rows``
guards against pulling an unaggregated table through ``toPandas``.
"""

from __future__ import annotations

import html as _html
from typing import Sequence

import pandas as pd
from pyspark.sql import DataFrame

#: Default categorical palette (12 distinguishable hues).
PALETTE = [
    "#4269d0", "#efb118", "#ff725c", "#6cc5b0", "#3ca951", "#ff8ab7",
    "#a463f2", "#97bbf5", "#9c6b4e", "#9498a0", "#2c7fb8", "#d6616b",
]

_MAX_ROWS_DEFAULT = 10_000


class PlotTooLargeError(ValueError):
    pass


def _bounded_pandas(df: DataFrame, max_rows: int) -> pd.DataFrame:
    pdf = df.limit(max_rows + 1).toPandas()
    if len(pdf) > max_rows:
        raise PlotTooLargeError(
            f"plot input exceeds max_rows={max_rows}; aggregate first"
        )
    return pdf


def _esc(s: object) -> str:
    return _html.escape(str(s), quote=True)


def _fmt_val(v: float) -> str:
    a = abs(v)
    for div, suf in ((1e12, "T"), (1e9, "G"), (1e6, "M"), (1e3, "k")):
        if a >= div:
            return f"{v / div:.4g}{suf}"
    return f"{v:.4g}"


def _frame(width: int, height: int, title: str, body: list[str]) -> str:
    head = [
        f'<svg xmlns="http://www.w3.org/2000/svg" width="{width}" '
        f'height="{height}" viewBox="0 0 {width} {height}" '
        'font-family="sans-serif">',
        f'<rect width="{width}" height="{height}" fill="white"/>',
        f'<text x="{width / 2:.1f}" y="22" text-anchor="middle" '
        f'font-size="16">{_esc(title)}</text>',
    ]
    return "\n".join(head + body + ["</svg>"])


def _y_ticks(vmax: float, n: int = 5) -> list[float]:
    if vmax <= 0:
        return [0.0]
    step = vmax / n
    return [step * i for i in range(n + 1)]


def _axes(
    left: float, top: float, w: float, h: float, vmax: float,
    x_labels: Sequence[str], x_pos: Sequence[float], ylabel: str,
) -> list[str]:
    out = [
        f'<line x1="{left}" y1="{top}" x2="{left}" y2="{top + h}" '
        'stroke="#333"/>',
        f'<line x1="{left}" y1="{top + h}" x2="{left + w}" '
        f'y2="{top + h}" stroke="#333"/>',
        f'<text x="14" y="{top + h / 2:.1f}" font-size="11" '
        f'text-anchor="middle" transform="rotate(-90 14 '
        f'{top + h / 2:.1f})">{_esc(ylabel)}</text>',
    ]
    for tv in _y_ticks(vmax):
        y = top + h - (tv / vmax * h if vmax else 0)
        out.append(
            f'<line x1="{left - 4}" y1="{y:.1f}" x2="{left}" y2="{y:.1f}" '
            'stroke="#333"/>'
            f'<text x="{left - 7}" y="{y + 3.5:.1f}" font-size="10" '
            f'text-anchor="end">{_fmt_val(tv)}</text>'
        )
    # thin x labels to ≤ ~20 so long month axes stay readable
    stride = max(1, len(x_labels) // 20)
    for i, (lbl, x) in enumerate(zip(x_labels, x_pos)):
        if i % stride:
            continue
        out.append(
            f'<text x="{x:.1f}" y="{top + h + 14:.1f}" font-size="10" '
            f'text-anchor="middle" class="xtick">{_esc(lbl)}</text>'
        )
    return out


def _legend(names: Sequence[str], left: float, top: float) -> list[str]:
    # right-hand legend, one swatch per series (the reference anchors
    # its legend at center-left outside the axes, :107)
    out = []
    for i, name in enumerate(names):
        c = PALETTE[i % len(PALETTE)]
        y = top + 18 * i
        out.append(
            f'<rect x="{left}" y="{y}" width="12" height="12" fill="{c}"/>'
            f'<text x="{left + 17}" y="{y + 10}" font-size="11" '
            f'class="legend">{_esc(name)}</text>'
        )
    return out


def bar_svg(
    pdf: pd.DataFrame, x: str, y_cols: Sequence[str], *,
    title: str = "", ylabel: str = "", stacked: bool = True,
    width: int = 960, height: int = 420,
) -> str:
    """Stacked (default) or grouped bar chart — the
    dbs_event_count_plot month×tier shape (pivot_df.plot.bar(
    stacked=True), :107). One ``<rect class="bar" data-series=…>``
    per cell, so tests and tools can read the geometry back."""
    left, top, right_pad, bottom = 70.0, 40.0, 150.0, 50.0
    w, h = width - left - right_pad, height - top - bottom
    vals = pdf[list(y_cols)].fillna(0.0)
    vmax = float(
        vals.sum(axis=1).max() if stacked else vals.max().max()
    ) if len(pdf) else 0.0
    vmax = vmax or 1.0
    n = max(len(pdf), 1)
    slot = w / n
    bar_w = slot * 0.8 if stacked else slot * 0.8 / max(len(y_cols), 1)
    body: list[str] = []
    x_pos = [left + slot * (i + 0.5) for i in range(len(pdf))]
    for i in range(len(pdf)):
        acc = 0.0
        for j, c in enumerate(y_cols):
            v = float(vals.iloc[i][c])
            bh = v / vmax * h
            if stacked:
                bx = left + slot * i + slot * 0.1
                by = top + h - acc / vmax * h - bh
                acc += v
            else:
                bx = left + slot * i + slot * 0.1 + bar_w * j
                by = top + h - bh
            body.append(
                f'<rect class="bar" data-series="{_esc(c)}" '
                f'data-x="{_esc(pdf.iloc[i][x])}" data-value="{v!r}" '
                f'x="{bx:.2f}" y="{by:.2f}" width="{bar_w:.2f}" '
                f'height="{bh:.2f}" fill="{PALETTE[j % len(PALETTE)]}"/>'
            )
    body += _axes(left, top, w, h, vmax,
                  [str(v) for v in pdf[x]], x_pos, ylabel)
    body += _legend(y_cols, width - right_pad + 10, top)
    return _frame(width, height, title, body)


def line_svg(
    pdf: pd.DataFrame, x: str, y_cols: Sequence[str], *,
    title: str = "", ylabel: str = "",
    width: int = 960, height: int = 420,
) -> str:
    """Multi-series line chart (the hpc/condor core-hour time-series
    shape). One ``<polyline class="series" data-series=…>`` per
    column."""
    left, top, right_pad, bottom = 70.0, 40.0, 150.0, 50.0
    w, h = width - left - right_pad, height - top - bottom
    vals = pdf[list(y_cols)].fillna(0.0)
    vmax = float(vals.max().max()) if len(pdf) else 0.0
    vmax = vmax or 1.0
    n = max(len(pdf) - 1, 1)
    x_pos = [left + w * (i / n) for i in range(len(pdf))]
    body: list[str] = []
    for j, c in enumerate(y_cols):
        pts = " ".join(
            f"{x_pos[i]:.2f},{top + h - float(vals.iloc[i][c]) / vmax * h:.2f}"
            for i in range(len(pdf))
        )
        body.append(
            f'<polyline class="series" data-series="{_esc(c)}" '
            f'points="{pts}" fill="none" '
            f'stroke="{PALETTE[j % len(PALETTE)]}" stroke-width="2"/>'
        )
    body += _axes(left, top, w, h, vmax,
                  [str(v) for v in pdf[x]], x_pos, ylabel)
    body += _legend(y_cols, width - right_pad + 10, top)
    return _frame(width, height, title, body)


def pie_svg(
    pdf: pd.DataFrame, label_col: str, value_col: str, *,
    title: str = "", width: int = 420, height: int = 420,
) -> str:
    """Pie chart — the visualize_campaigns per-site PB share shape
    (ax.pie with percent+absolute labels, :110). One
    ``<path class="slice" data-label=… data-value=…>`` per slice."""
    import math

    cx, cy = width / 2, height / 2 + 10
    r = min(width, height) / 2 - 60
    total = float(pdf[value_col].sum()) or 1.0
    ang = -90.0  # start at 12 o'clock like matplotlib's default-ish
    body: list[str] = []
    for i in range(len(pdf)):
        v = float(pdf.iloc[i][value_col])
        frac = v / total
        a0, a1 = ang, ang + frac * 360.0
        ang = a1
        large = 1 if (a1 - a0) > 180 else 0
        x0 = cx + r * math.cos(math.radians(a0))
        y0 = cy + r * math.sin(math.radians(a0))
        x1 = cx + r * math.cos(math.radians(a1))
        y1 = cy + r * math.sin(math.radians(a1))
        lbl = pdf.iloc[i][label_col]
        if frac >= 0.999999:  # single-slice degenerate: full circle
            body.append(
                f'<circle class="slice" data-label="{_esc(lbl)}" '
                f'data-value="{v!r}" cx="{cx}" cy="{cy}" r="{r}" '
                f'fill="{PALETTE[i % len(PALETTE)]}"/>'
            )
        else:
            body.append(
                f'<path class="slice" data-label="{_esc(lbl)}" '
                f'data-value="{v!r}" d="M{cx:.2f},{cy:.2f} '
                f'L{x0:.2f},{y0:.2f} A{r:.2f},{r:.2f} 0 {large} 1 '
                f'{x1:.2f},{y1:.2f} Z" '
                f'fill="{PALETTE[i % len(PALETTE)]}"/>'
            )
        mid = math.radians((a0 + a1) / 2)
        lx = cx + (r + 24) * math.cos(mid)
        ly = cy + (r + 24) * math.sin(mid)
        body.append(
            f'<text x="{lx:.1f}" y="{ly:.1f}" font-size="10" '
            f'text-anchor="middle" class="slice-label">'
            f"{_esc(lbl)} {frac * 100:.1f}%</text>"
        )
    return _frame(width, height, title, body)


def write_plot(
    df: DataFrame, path: str, *, kind: str, x: str | None = None,
    y_cols: Sequence[str] | None = None, label_col: str | None = None,
    value_col: str | None = None, title: str = "", ylabel: str = "",
    stacked: bool = True, max_rows: int = _MAX_ROWS_DEFAULT,
) -> str:
    """Render an aggregated DataFrame to an SVG file (the reference's
    ``savefig`` mile, dbs_event_count_plot.py:253). ``kind`` ∈
    {'bar', 'line', 'pie'}. Returns the path written."""
    pdf = _bounded_pandas(df, max_rows)
    if kind == "bar":
        svg = bar_svg(pdf, x, y_cols, title=title, ylabel=ylabel,
                      stacked=stacked)
    elif kind == "line":
        svg = line_svg(pdf, x, y_cols, title=title, ylabel=ylabel)
    elif kind == "pie":
        svg = pie_svg(pdf, label_col, value_col, title=title)
    else:
        raise ValueError(f"unknown plot kind: {kind!r}")
    with open(path, "w", encoding="utf-8") as fh:
        fh.write(svg)
    return path
