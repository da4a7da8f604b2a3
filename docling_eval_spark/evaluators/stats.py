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
    df: DataFrame,
    value_col: str,
    group_cols: list[str] | None = None,
    scale_mode: bool = False,
) -> DataFrame:
    """→ one row (per group): total, mean, median, std, hist[20], bins[21].

    ``scale_mode=True`` switches the exact median from
    ``percentile(col, 0.5)`` (which buffers the whole per-group value
    list in one task — fine at report scale, a single-node sort at
    10^12 rows) to a counting-histogram median: metric values are
    3-decimal-rounded, so a (value → count) hash aggregation has at
    most ~2001 distinct rows per group and the exact interpolated
    median falls out of the cumulative counts. Everything (mean, std,
    hist, total) is derived from the same bounded count table, so the
    whole rollup is two hash aggregations with map-side combine and no
    unbounded group anywhere. Median is exact-identical to the default
    path; mean/std agree to float associativity."""
    group_cols = group_cols or []
    if scale_mode:
        return _compute_stats_counting(df, value_col, group_cols)
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


def _compute_stats_counting(
    df: DataFrame, value_col: str, group_cols: list[str]
) -> DataFrame:
    """Counting-histogram stats (see compute_stats scale_mode).

    Agg 1: (group, value) → count — bounded by the value quantization.
    Agg 2: per group, sorted (value, count) pairs → all stats via SQL
    higher-order functions over the ≤~2001-element array. Note: unlike
    the default path, a group with zero non-null values yields no row
    (there is nothing to anchor it); callers needing sentinel rows for
    empty groups join them in (pipelines._ensure_groups)."""
    v = F.col(value_col)
    counted = (
        df.filter(v.isNotNull())
        .groupBy(*group_cols, v.alias("__v"))
        .agg(F.count("*").alias("__c"))
    )
    g = counted.groupBy(*group_cols).agg(
        F.sort_array(
            F.collect_list(F.struct(F.col("__v").alias("v"), F.col("__c").alias("c")))
        ).alias("__pairs")
    )
    pairs = F.col("__pairs")
    g = g.withColumn(
        "total",
        F.aggregate(pairs, F.lit(0).cast("long"), lambda a, x: a + x["c"]),
    )
    # interpolated median == percentile(col, 0.5) == statistics.median:
    # mean of the values at 1-based positions ceil(n/2) and n/2 + 1
    # capped into range (equal for odd n)
    p1 = ((F.col("total") + 1) / 2).cast("long")
    p2 = (F.col("total") / 2 + 1).cast("long")
    acc0 = F.struct(
        F.lit(0).cast("long").alias("seen"),
        F.lit(None).cast("double").alias("m1"),
        F.lit(None).cast("double").alias("m2"),
    )
    med = F.aggregate(
        pairs,
        acc0,
        lambda a, x: F.struct(
            (a["seen"] + x["c"]).alias("seen"),
            F.when(a["m1"].isNull() & (a["seen"] + x["c"] >= p1), x["v"])
            .otherwise(a["m1"])
            .alias("m1"),
            F.when(a["m2"].isNull() & (a["seen"] + x["c"] >= p2), x["v"])
            .otherwise(a["m2"])
            .alias("m2"),
        ),
    )
    g = g.withColumn("__med", med)
    sum_v = F.aggregate(
        pairs, F.lit(0.0), lambda a, x: a + x["v"] * x["c"]
    )
    sum_v2 = F.aggregate(
        pairs, F.lit(0.0), lambda a, x: a + x["v"] * x["v"] * x["c"]
    )
    g = g.withColumn("__sum", sum_v).withColumn("__sum2", sum_v2)
    # guarded division: an UNGROUPED aggregation over empty/all-null
    # input yields one row with total=0, and ANSI mode turns a bare
    # __sum/total into a DIVIDE_BY_ZERO task failure
    mean = F.when(F.col("total") > 0, F.col("__sum") / F.col("total"))
    # constant groups (one distinct value) are exactly 0 — the
    # uncentered formula lands epsilon-off-zero either way: negative
    # rounding would make sqrt NaN (and coalesce does NOT replace NaN),
    # positive rounding would leak a ~1e-9 std; clamp the rest at 0
    var = F.when(
        F.col("total") > 1,
        F.when(F.size(pairs) == 1, F.lit(0.0)).otherwise(
            F.greatest(
                (F.col("__sum2") - F.col("total") * mean * mean)
                / (F.col("total") - 1),
                F.lit(0.0),
            )
        ),
    )
    hist_bin = lambda x: (  # noqa: E731  — np.histogram bin of a pair value
        F.when((x["v"] < 0) | (x["v"] > 1), F.lit(-1))
        .when(F.floor(x["v"] * N_BINS) >= N_BINS, F.lit(N_BINS - 1))
        .otherwise(F.floor(x["v"] * N_BINS).cast("int"))
    )
    def _bin_sum(b: int):
        # factory (not a default-arg closure): PySpark counts the
        # lambda's parameters to bind HOF variables, so the merge
        # lambda must take exactly (acc, x)
        return F.aggregate(
            pairs,
            F.lit(0).cast("long"),
            lambda a, x: a + F.when(hist_bin(x) == b, x["c"]).otherwise(0),
        )

    hist = F.array(*[_bin_sum(b) for b in range(N_BINS)])
    return g.select(
        *group_cols,
        "total",
        F.coalesce(mean, F.lit(-1.0)).alias("mean"),
        F.coalesce(
            (F.col("__med.m1") + F.col("__med.m2")) / 2, F.lit(-1.0)
        ).alias("median"),
        F.coalesce(F.sqrt(var), F.lit(-1.0)).alias("std"),
        hist.alias("hist"),
        F.array(*[F.lit(b / N_BINS) for b in range(N_BINS + 1)]).alias("bins"),
    )


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
