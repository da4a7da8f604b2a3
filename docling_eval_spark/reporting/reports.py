"""Report sinks (SURVEY S10-S12 analogs).

The reference renders evaluation JSON, cumulative-bin text tables
(`evaluators/stats.py:28-50` + tabulate), matplotlib histogram PNGs,
and GT-vs-pred comparison HTML (`visualisation/visualisations.py`).
Aggregates here are tiny (≤ dozens of rows), so rendering is
driver-side after collect(); matplotlib/tabulate are not in this
container, so the table renderer is self-contained github-markdown
text (same shape as the reference's `to_table`) and the histogram is
an SVG writer (no binary deps). Comparison HTML is produced from a
sampled sub-DataFrame — debug path, bounded rows.
"""

from __future__ import annotations

import html as _html
import json
from pathlib import Path
from typing import Any

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

from docling_eval_spark.evaluators.stats import N_BINS, compute_stats


def stats_to_table_text(stats_row: dict[str, Any], metric_name: str) -> str:
    """Reference ``DatasetStatistics.to_table`` rendering: one row per
    bin: range, prob%, cumulative acc%, 1-acc%, count."""
    headers = [metric_name, "prob [%]", "acc [%]", "1-acc [%]", "total"]
    total = stats_row["total"] or 1
    hist = stats_row["hist"]
    bins = stats_row["bins"]
    lines = ["| " + " | ".join(headers) + " |",
             "|" + "|".join(["---"] * len(headers)) + "|"]
    cumsum = 0.0
    for i in range(len(bins) - 1):
        lines.append(
            f"| ({bins[i]:.3f}, {bins[i+1]:.3f}] "
            f"| {100.0 * hist[i] / total:.2f} "
            f"| {100.0 * cumsum:.2f} "
            f"| {100.0 * (1.0 - cumsum):.2f} "
            f"| {hist[i]} |"
        )
        cumsum += hist[i] / total
    return "\n".join(lines)


def histogram_svg(stats_row: dict[str, Any], title: str = "") -> str:
    """Histogram as standalone SVG (stand-in for the reference's
    matplotlib PNG, `stats.py:52-73`)."""
    hist = stats_row["hist"]
    w, h, pad = 640, 320, 40
    peak = max(hist) or 1
    bar_w = (w - 2 * pad) / N_BINS
    bars = []
    for i, c in enumerate(hist):
        bh = (h - 2 * pad) * c / peak
        bars.append(
            f'<rect x="{pad + i * bar_w:.1f}" y="{h - pad - bh:.1f}" '
            f'width="{bar_w - 1:.1f}" height="{bh:.1f}" fill="#4878a8"/>'
        )
    label = (
        f"{title} (mean {stats_row['mean']:.2f}, median {stats_row['median']:.2f}, "
        f"std {stats_row['std']:.2f}, total {stats_row['total']})"
    )
    return (
        f'<svg xmlns="http://www.w3.org/2000/svg" width="{w}" height="{h}">'
        f'<text x="{pad}" y="20" font-size="13">{_html.escape(label)}</text>'
        + "".join(bars)
        + f'<line x1="{pad}" y1="{h-pad}" x2="{w-pad}" y2="{h-pad}" stroke="#000"/>'
        "</svg>"
    )


def write_metric_report(
    df: DataFrame, value_col: str, out_dir: str, metric_name: str
) -> dict[str, Any]:
    """compute_stats → {name}.json + {name}.md + {name}.svg (the
    reference's evaluate/visualize sink pair, `cli/main.py:252-310` +
    `70-112`)."""
    row = compute_stats(df, value_col).collect()[0].asDict()
    out = Path(out_dir)
    out.mkdir(parents=True, exist_ok=True)
    (out / f"{metric_name}.json").write_text(json.dumps(row, default=list))
    (out / f"{metric_name}.md").write_text(stats_to_table_text(row, metric_name))
    (out / f"{metric_name}.svg").write_text(histogram_svg(row, metric_name))
    return row


def save_comparison_html(
    df: DataFrame,
    out_path: str,
    gt_col: str = "text",
    pred_col: str = "extracted_text",
    key_col: str = "url",
    max_rows: int = 50,
) -> int:
    """GT-vs-pred side-by-side HTML for a bounded sample
    (`visualisations.py:21-67` analog; deterministic sample = first
    max_rows by key)."""
    rows = (
        df.select(key_col, gt_col, pred_col)
        .orderBy(key_col)
        .limit(max_rows)
        .collect()
    )
    cells = []
    for r in rows:
        match = r[gt_col] == r[pred_col]
        color = "#e8ffe8" if match else "#ffe8e8"
        cells.append(
            f'<tr style="background:{color}"><td>{_html.escape(str(r[key_col]))}</td>'
            f"<td><pre>{_html.escape(str(r[gt_col]))}</pre></td>"
            f"<td><pre>{_html.escape(str(r[pred_col]))}</pre></td></tr>"
        )
    doc = (
        "<html><head><meta charset='utf-8'><style>"
        "table{border-collapse:collapse;width:100%}td{border:1px solid #ccc;"
        "vertical-align:top;padding:4px;width:45%}td:first-child{width:10%}"
        "</style></head><body><table>"
        "<tr><th>key</th><th>ground truth</th><th>prediction</th></tr>"
        + "".join(cells)
        + "</table></body></html>"
    )
    Path(out_path).parent.mkdir(parents=True, exist_ok=True)
    Path(out_path).write_text(doc)
    return len(rows)


def delta_row_col_report(teds_df: DataFrame) -> DataFrame:
    """Δrows/Δcols histogram (SURVEY A6, `table_evaluator.py:42-81`)."""
    return (
        teds_df.select(
            (F.col("true_nrows") - F.col("pred_nrows")).alias("delta_rows"),
            (F.col("true_ncols") - F.col("pred_ncols")).alias("delta_cols"),
        )
        .groupBy("delta_rows", "delta_cols")
        .agg(F.count("*").alias("n"))
    )
