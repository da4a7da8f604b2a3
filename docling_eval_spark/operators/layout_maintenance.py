"""Lakehouse layout maintenance: compaction planning and Z-order keys.

At 100 TB the table layout IS a performance feature: a crawl that
appends per-fetch parquet files degrades into the small-files problem
(10^7 files → listing, scheduling and open() dominate scans), and
single-column sort keys can't serve two-dimensional pruning (host AND
time). Two deterministic planners, both pure integer column algebra a
DuckDB oracle replays bit-for-bit:

- ``compaction_plan`` — greedy size-ordered binning of files into
  target-sized merge groups per table partition: one window cumsum per
  partition (bounded by files-per-partition, never data), integer
  group ids. The plan is data for a compactor job — planning is
  separated from execution exactly so the plan itself is testable.
- ``morton_key`` — bit-interleaved (Morton / Z-order) composite key of
  two integer columns; sorting or range-partitioning by it co-locates
  rows close in BOTH dimensions, so min/max file statistics prune on
  either predicate (the technique behind Delta/Iceberg Z-ORDER).

Reference scope: DS4SD/docling-eval has no storage-layout tooling;
this is Spark-scale capability beyond the reference surface.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame, Window


def compaction_plan(
    files: DataFrame,
    partition_cols: list[str],
    file_col: str = "file",
    size_col: str = "size_bytes",
    target_bytes: int = 128 * 1024 * 1024,
    min_group_files: int = 2,
) -> DataFrame:
    """Assign files to merge groups: ``(partition..., file, size_bytes,
    grp, grp_files)``.

    Files order smallest-first within their partition (compacting tiny
    files is the payoff; a file already near target lands alone in a
    tail group and is dropped by the ``min_group_files`` filter), then
    ``grp = floor((cumsum - size) / target)`` — the classic cumsum
    binning: every group's total is < target + its last file, groups
    are contiguous in the ordering, and the whole plan is one window
    over each partition's FILE LIST (metadata rows, never data bytes).
    Only groups that actually merge something (>= min_group_files)
    survive — the rest of the table is already compact.

    Deterministic: ties in size order break on the file name."""
    w = Window.partitionBy(*partition_cols).orderBy(size_col, file_col)
    cum = F.sum(size_col).over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    planned = files.select(
        *partition_cols,
        F.col(file_col).alias("file"),
        F.col(size_col).cast("long").alias("size_bytes"),
        F.floor((cum - F.col(size_col)) / F.lit(target_bytes))
        .cast("long")
        .alias("grp"),
    )
    wg = Window.partitionBy(*partition_cols, "grp")
    return planned.withColumn(
        "grp_files", F.count("*").over(wg)
    ).filter(F.col("grp_files") >= min_group_files)


def morton_key(x: Column, y: Column, bits: int = 16) -> Column:
    """Bit-interleaved Z-order key of two nonneg integer columns:
    bit i of ``x`` lands at position 2i, bit i of ``y`` at 2i+1 —
    ``interleave(x=0b11, y=0b01) = 0b0111``. ``bits`` bits are taken
    from each input (callers bucket/clamp wider domains first; 16+16
    -> a 32-bit key). Pure shift-mask-sum, exact on any engine.

    Sorting or range-partitioning by the key gives every output file a
    tight min/max envelope in BOTH dimensions — predicates on either
    column prune files, which a single-column sort only provides for
    its leading column."""
    if not 1 <= bits <= 31:
        raise ValueError(f"bits must be 1..31, got {bits}")
    terms = []
    for i in range(bits):
        xbit = F.shiftright(x.cast("long"), i).bitwiseAND(F.lit(1))
        ybit = F.shiftright(y.cast("long"), i).bitwiseAND(F.lit(1))
        terms.append(
            F.shiftleft(xbit, 2 * i) + F.shiftleft(ybit, 2 * i + 1)
        )
    out = terms[0]
    for t in terms[1:]:
        out = out + t
    return out


def morton_key_sql(x_expr: str, y_expr: str, bits: int = 16) -> str:
    """DuckDB twin of :func:`morton_key`, generated from the same
    constants so oracle and engine cannot drift."""
    terms = []
    for i in range(bits):
        terms.append(f"((({x_expr} >> {i}) & 1) << {2 * i})")
        terms.append(f"((({y_expr} >> {i}) & 1) << {2 * i + 1})")
    return "(" + " + ".join(terms) + ")"
