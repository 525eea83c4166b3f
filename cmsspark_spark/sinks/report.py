"""Driver-side report mile (K7): aggregated DataFrame → pandas →
CSV + self-contained HTML table page.

Replicates the shape of the reference's report writers
(degraded/condor_cpu_efficiency.py:398-445 — grouped Spark aggs pulled
to pandas, ``to_html(escape=False, index=False)`` with the table tag
rewritten for a datatable, wrapped in a header/footer page;
hpc_running_cores_and_corehr.py:688-742 writes the same pair of
artifacts). External CDN/Kibana links are out of scope — the page is
self-contained CSS.

Scale note: ONLY for aggregated results (this is the driver-side
mile by definition). ``max_rows`` guards against accidentally pulling
an unaggregated table through ``toPandas``.
"""

from __future__ import annotations

import html as _html
import os
from typing import Mapping

import pandas as pd
from pyspark.sql import DataFrame

_PAGE = """<!DOCTYPE html>
<html>
<head>
<meta charset="utf-8">
<title>{title}</title>
<style>
body {{ font-family: arial, sans-serif; margin: 2em; }}
h1 {{ font-size: 1.4em; }}
.meta {{ color: #555; margin-bottom: 1em; }}
table#dataframe {{ border-collapse: collapse; width: 100%; }}
table#dataframe td, table#dataframe th {{
  border: 1px solid #dddddd; text-align: left; padding: 6px;
  word-break: break-all;
}}
table#dataframe tr:nth-child(even) {{ background-color: #f6f6f6; }}
</style>
</head>
<body>
<h1>{title}</h1>
<div class="meta">{subtitle} &mdash; {nrows} rows</div>
{plots}
{table}
</body>
</html>
"""


def format_pandas(pdf: pd.DataFrame, percent_cols: Mapping[str, str] | None = None) -> pd.DataFrame:
    """Reference-style column formatting (condor_cpu_efficiency.py:
    92-104): selected float columns rendered as '12.3%' strings with
    NaN shown as '-'. ``percent_cols`` maps column → format spec
    (default '{:,.1f}%')."""
    out = pdf.copy()
    for col, spec in (percent_cols or {}).items():
        fmt = spec or "{:,.1f}%"
        out[col] = out[col].map(
            lambda x: "-" if pd.isna(x) else fmt.format(x)
        )
    return out


def render_html_table(pdf: pd.DataFrame) -> str:
    """``to_html(escape=False, index=False)`` with the reference's
    table-tag rewrite (condor_cpu_efficiency.py:195-201) so the page
    CSS targets ``table#dataframe``."""
    html = pdf.to_html(escape=False, index=False)
    html = html.replace(
        'table border="1" class="dataframe"',
        'table id="dataframe" class="display compact" style="width:100%;"',
    )
    return html.replace(' style="text-align: right;"', "")


def write_report(
    df: DataFrame,
    out_dir: str,
    name: str,
    title: str,
    subtitle: str = "",
    percent_cols: Mapping[str, str] | None = None,
    max_rows: int = 100_000,
    plots: list[str] | None = None,
) -> pd.DataFrame:
    """Write ``{out_dir}/{name}.csv`` + ``{out_dir}/{name}.html`` from
    an aggregated DataFrame; returns the driver-side pandas frame.

    The CSV carries raw values (machine-facing, like the reference's
    side-channel CSVs); the HTML applies ``percent_cols`` formatting
    (human-facing table page). ``plots`` — SVG strings from
    sinks/plots.py — embed inline above the table, the reference's
    report_builder pages (plot + datatable in one artifact) without
    separate image files."""
    pdf = df.limit(max_rows + 1).toPandas()
    if len(pdf) > max_rows:
        raise ValueError(
            f"report '{name}' exceeds max_rows={max_rows}; "
            "aggregate before reporting (K7 is the driver-side mile)"
        )
    os.makedirs(out_dir, exist_ok=True)
    pdf.to_csv(os.path.join(out_dir, f"{name}.csv"), index=False)
    page = _PAGE.format(
        title=_html.escape(title),
        subtitle=_html.escape(subtitle),
        nrows=len(pdf),
        plots="\n".join(
            f'<div class="plot">{svg}</div>' for svg in (plots or [])
        ),
        table=render_html_table(format_pandas(pdf, percent_cols)),
    )
    with open(os.path.join(out_dir, f"{name}.html"), "w") as fh:
        fh.write(page)
    return pdf
