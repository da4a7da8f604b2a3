"""Key-value graph operators (FUNSD-style forms, SURVEY K3/J-family).

The reference builds GraphData {cells, links} per document
(`benchmarks/funsd/create.py:256-279,437-439`: question/answer cells,
directed links on cell ids). The evaluation-side primitive is link-set
agreement: precision/recall/F1 of predicted (src,dst) pairs against
ground truth — pure relational algebra (two hash joins on the pair
key), no UDF.

Scale: links explode to slim (doc, src, dst) rows; one shuffle per
side on the composite key; per-doc rollup is a hash agg.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame

from docling_eval_spark.functions.let import let_col


def link_rows(df: DataFrame, links_col: str = "links", key: str = "url") -> DataFrame:
    """(key, links: array<struct<src,dst>>) → one row per link."""
    return df.select(
        F.col(key).alias("key"), F.explode(links_col).alias("l")
    ).select("key", F.col("l.src").alias("src"), F.col("l.dst").alias("dst"))


def kv_link_metrics(
    gt: DataFrame, pred: DataFrame, key: str = "key"
) -> DataFrame:
    """Per-key link precision/recall/F1 from two (key, src, dst) sets.

    P = |∩|/|pred|, R = |∩|/|gt| — the same set-metric convention as
    the token metrics (SURVEY U1). Inner join on the full link triple
    counts the intersection; distinct applied to both sides first.
    """
    g = gt.select(key, "src", "dst").distinct()
    p = pred.select(key, "src", "dst").distinct()
    inter = g.join(p, [key, "src", "dst"]).groupBy(key).agg(
        F.count("*").alias("n_inter")
    )
    g_n = g.groupBy(key).agg(F.count("*").alias("n_gt"))
    p_n = p.groupBy(key).agg(F.count("*").alias("n_pred"))
    out = (
        g_n.join(p_n, key, "full")
        .join(inter, key, "left")
        .fillna(0, ["n_inter", "n_gt", "n_pred"])
    )
    prec = F.when(F.col("n_pred") > 0, F.col("n_inter") / F.col("n_pred")).otherwise(
        F.lit(0.0)
    )
    rec = F.when(F.col("n_gt") > 0, F.col("n_inter") / F.col("n_gt")).otherwise(
        F.lit(0.0)
    )
    f1 = F.when(prec + rec > 0, 2 * prec * rec / (prec + rec)).otherwise(F.lit(0.0))
    return out.select(
        key,
        F.col("n_gt").cast("bigint").alias("n_gt"),
        F.col("n_pred").cast("bigint").alias("n_pred"),
        F.col("n_inter").cast("bigint").alias("n_inter"),
        F.round(prec, 6).alias("precision"),
        F.round(rec, 6).alias("recall"),
        F.round(f1, 6).alias("f1"),
    )


def consecutive_links(ids: Column) -> Column:
    """array<id> (in reading order) → array<struct<src,dst>> of
    consecutive pairs. Let-bound so the (possibly expensive) ids
    expression evaluates once per row, not once per reference."""
    return let_col(
        ids,
        lambda v: F.zip_with(
            F.slice(v, 1, F.greatest(F.size(v) - 1, F.lit(0))),
            F.slice(v, 2, F.greatest(F.size(v) - 1, F.lit(0))),
            lambda a, b: F.struct(a.alias("src"), b.alias("dst")),
        ),
    )


def kv_link_metrics_arrays(
    df: DataFrame,
    key: str = "key",
    gt_links_col: str = "gt_links",
    pred_links_col: str = "pred_links",
) -> DataFrame:
    """Per-row link P/R/F1 when BOTH link sets already sit on the row
    as arrays (the per-document KV-graph case, where graphs are
    bounded): pure array algebra, ZERO shuffles of its own — the
    caller's per-doc aggregation is the only exchange. This is the
    single-pass twin of ``kv_link_metrics``, which keeps the fully
    relational shape for unbounded link sets."""
    # NULL link arrays count as empty sets (F.size(NULL) is -1, which
    # would otherwise emit corrupt negative counts)
    stage1 = df.select(
        key,
        F.array_distinct(F.coalesce(F.col(gt_links_col), F.array())).alias("__g"),
        F.array_distinct(F.coalesce(F.col(pred_links_col), F.array())).alias("__p"),
    )
    stage2 = stage1.select(
        key,
        F.size("__g").cast("bigint").alias("n_gt"),
        F.size("__p").cast("bigint").alias("n_pred"),
        F.size(F.array_intersect("__g", "__p")).cast("bigint").alias("n_inter"),
    )
    prec = F.when(F.col("n_pred") > 0, F.col("n_inter") / F.col("n_pred")).otherwise(
        F.lit(0.0)
    )
    rec = F.when(F.col("n_gt") > 0, F.col("n_inter") / F.col("n_gt")).otherwise(
        F.lit(0.0)
    )
    f1 = F.when(prec + rec > 0, 2 * prec * rec / (prec + rec)).otherwise(F.lit(0.0))
    return stage2.select(
        key,
        "n_gt",
        "n_pred",
        "n_inter",
        F.round(prec, 6).alias("precision"),
        F.round(rec, 6).alias("recall"),
        F.round(f1, 6).alias("f1"),
    )
