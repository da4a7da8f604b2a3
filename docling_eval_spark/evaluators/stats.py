"""Dataset statistics aggregation (reference `evaluators/stats.py:76-90`).

Semantics matched exactly:
- mean  = statistics.mean
- median = statistics.median  (exact; Spark `percentile`, NOT approx —
  SURVEY §7 risk item)
- std   = statistics.stdev    (sample std; -1.0 sentinel when empty,
  like the reference)
- hist  = np.histogram(values, bins=20, range=(0, 1)) — 20 uniform
  bins over [0,1], right-exclusive except the last bin which includes
  1.0; out-of-range values count toward total but not the histogram.

Executed as ONE hash aggregation (partial + final, map-side combine);
the 20-bin histogram rides along as a pivoted conditional count so no
second shuffle is needed. The cumulative to_table (reference
`stats.py:28-50`) is a window cum-sum over the 20-row bins frame.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Window

N_BINS = 20


def _bin_expr(value_col: str):
    """np.histogram bin index over [0,1]: right-exclusive, last bin
    closed. Values outside [0,1] → NULL (excluded from hist)."""
    v = F.col(value_col)
    raw = F.floor(v * N_BINS).cast("int")
    return (
        F.when((v < 0) | (v > 1), F.lit(None))
        .when(raw >= N_BINS, F.lit(N_BINS - 1))
        .otherwise(raw)
    )


def compute_stats(
    df: DataFrame, value_col: str, group_cols: list[str] | None = None
) -> DataFrame:
    """→ one row (per group): total, mean, median, std, hist[20], bins[21]."""
    group_cols = group_cols or []
    binned = df.withColumn("__bin", _bin_expr(value_col))
    hist_aggs = [
        F.sum(F.when(F.col("__bin") == b, 1).otherwise(0)).alias(f"__h{b}")
        for b in range(N_BINS)
    ]
    agg = binned.groupBy(*group_cols).agg(
        F.count(value_col).alias("total"),
        F.avg(value_col).alias("mean"),
        F.expr(f"percentile({value_col}, 0.5)").alias("median"),
        F.stddev_samp(value_col).alias("std"),
        *hist_aggs,
    )
    # empty-input sentinels match the reference (-1 for mean/median/std)
    agg = agg.select(
        *group_cols,
        "total",
        F.coalesce("mean", F.lit(-1.0)).alias("mean"),
        F.coalesce("median", F.lit(-1.0)).alias("median"),
        F.coalesce("std", F.lit(-1.0)).alias("std"),
        F.array(*[F.col(f"__h{b}") for b in range(N_BINS)]).alias("hist"),
        F.array(*[F.lit(b / N_BINS) for b in range(N_BINS + 1)]).alias("bins"),
    )
    return agg


def histogram_table(stats_row_df: DataFrame, group_cols: list[str] | None = None) -> DataFrame:
    """Explode a compute_stats row into the reference's cumulative
    table (`stats.py:28-50`): one row per bin with prob / acc / 1-acc.

    ``acc`` is the cum-sum of probabilities of STRICTLY EARLIER bins
    (the reference adds the current bin after emitting the row).
    """
    group_cols = group_cols or []
    e = stats_row_df.select(
        *group_cols,
        "total",
        F.posexplode("hist").alias("bin", "count"),
    )
    w = (
        Window.partitionBy(*group_cols)
        .orderBy("bin")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    return e.select(
        *group_cols,
        "bin",
        (F.col("bin") / N_BINS).alias("bin_lo"),
        ((F.col("bin") + 1) / N_BINS).alias("bin_hi"),
        F.col("count"),
        (100.0 * F.col("count") / F.col("total")).alias("prob_pct"),
        F.coalesce(
            100.0 * F.sum(F.col("count") / F.col("total")).over(w), F.lit(0.0)
        ).alias("acc_pct"),
        (
            100.0
            - F.coalesce(
                100.0 * F.sum(F.col("count") / F.col("total")).over(w), F.lit(0.0)
            )
        ).alias("inv_acc_pct"),
    )
