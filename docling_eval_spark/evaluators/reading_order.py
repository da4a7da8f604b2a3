"""Reading-order ARD metric (reference
`evaluators/base_readingorder_evaluator.py:126-168`).

ARD      = Σ_k |pred_order[k] − k|          (k = ground-truth index)
ARD_norm = 1 − ARD / n²                     (n = #items; 0 items → 0.0)
wARD     = Σ_k |pred_order[k] − k| · w_k,   w_k = area_k / Σ areas
wARD_norm = 1 − wARD / n²

Fully expressible in Spark SQL higher-order array functions — no UDF,
whole-stage codegen end to end (SURVEY §2.4 A7). The per-document
arrays live in one row, so the metric is a narrow map: no shuffle.

Pure-Python twin (`ard_norm_py`) is the parity oracle.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame


def ard_norm_py(pred_order: list[int], areas: list[float] | None = None) -> tuple[float, float]:
    n = len(pred_order)
    if n == 0:
        return 0.0, 0.0
    ard = sum(abs(p - k) for k, p in enumerate(pred_order))
    if areas:
        total = sum(areas)
        w_ard = sum(
            abs(p - k) * (areas[k] / total) for k, p in enumerate(pred_order)
        )
    else:
        w_ard = 0.0
    return 1 - ard / (n * n), 1 - w_ard / (n * n)


def ard_norm_col(pred_order: Column | str) -> Column:
    po = F.col(pred_order) if isinstance(pred_order, str) else pred_order
    n = F.size(po)
    ard = F.aggregate(
        F.transform(po, lambda x, i: F.abs(x.cast("double") - i)),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    return F.when(n == 0, F.lit(0.0)).otherwise(1.0 - ard / (n * n).cast("double"))


def weighted_ard_norm_col(pred_order: Column | str, areas: Column | str) -> Column:
    po = F.col(pred_order) if isinstance(pred_order, str) else pred_order
    ar = F.col(areas) if isinstance(areas, str) else areas
    n = F.size(po)
    total = F.aggregate(ar, F.lit(0.0), lambda acc, x: acc + x)
    w_ard = F.aggregate(
        F.zip_with(po, ar, lambda p, a: F.struct(p.alias("p"), a.alias("a"))),
        F.struct(F.lit(0.0).alias("acc"), F.lit(0).alias("i")),
        lambda st, x: F.struct(
            (
                st["acc"]
                + F.abs(x["p"].cast("double") - st["i"]) * (x["a"] / total)
            ).alias("acc"),
            (st["i"] + 1).alias("i"),
        ),
        lambda st: st["acc"],
    )
    return F.when(n == 0, F.lit(0.0)).otherwise(
        1.0 - w_ard / (n * n).cast("double")
    )


def ard_stage(
    df: DataFrame,
    pred_order_col: str = "pred_order",
    areas_col: str | None = "areas",
) -> DataFrame:
    """Append ard_norm (+ w_ard_norm when an areas column is given)."""
    out = df.withColumn("ard_norm", ard_norm_col(pred_order_col))
    if areas_col is not None:
        out = out.withColumn(
            "w_ard_norm", weighted_ard_norm_col(pred_order_col, areas_col)
        )
    return out
