"""Resume-by-anti-join: a failed run restarts without recomputing
completed buckets (SURVEY §5.2.5)."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from docling_eval_spark.datagen.pages import pages_dataframe
from docling_eval_spark.extraction.stage import extract_text_stage
from docling_eval_spark.plans.lineage import pending_buckets, run_resumable

N_BUCKETS = 8


def test_kill_and_resume(spark, tmp_path):
    out = str(tmp_path / "out")
    lin = str(tmp_path / "lineage")
    pages = pages_dataframe(spark, 160, partitions=4)

    # first run dies at bucket 5
    with pytest.raises(RuntimeError, match="injected failure"):
        run_resumable(
            spark,
            pages,
            extract_text_stage,
            out,
            lin,
            num_buckets=N_BUCKETS,
            run_id="run1",
            fail_on_bucket=5,
        )
    done_first = set(
        r["bucket"] for r in spark.read.parquet(lin).collect()
    )
    assert 5 not in done_first
    assert len(done_first) > 0

    # restart: only the missing buckets are pending
    pend = pending_buckets(spark, list(range(N_BUCKETS)), lin)
    assert set(pend) == set(range(N_BUCKETS)) - done_first

    processed = run_resumable(
        spark, pages, extract_text_stage, out, lin, num_buckets=N_BUCKETS, run_id="run2"
    )
    assert set(processed) == set(pend)  # nothing recomputed

    lineage = spark.read.parquet(lin)
    # buckets from run1 still attributed to run1 (not rewritten)
    runs = {r["bucket"]: r["run_id"] for r in lineage.collect()}
    for b in done_first:
        assert runs[b] == "run1"
    # all buckets now complete, doc counts add up, output readable
    assert set(runs) == set(range(N_BUCKETS))
    total = spark.read.parquet(out).count()
    assert total == 160
    assert lineage.agg(F.sum("doc_count")).collect()[0][0] == 160
    # third invocation: nothing pending, no-op
    assert (
        run_resumable(spark, pages, extract_text_stage, out, lin, num_buckets=N_BUCKETS)
        == []
    )


def test_snapshot_as_of_reads(spark, tmp_path):
    """Iceberg-style manifest snapshots: read_as_of(seq) sees exactly
    the buckets committed by that commit; later commits are invisible."""
    import pytest

    from docling_eval_spark.datagen.pages import write_pages_parquet
    from docling_eval_spark.plans.lineage import (
        latest_snapshot,
        read_as_of,
        run_resumable,
    )

    pages_dir = str(tmp_path / "pages")
    out = str(tmp_path / "out")
    lin = str(tmp_path / "lineage")
    write_pages_parquet(spark, pages_dir, 120, partitions=4)
    pages = spark.read.parquet(pages_dir)

    # first invocation dies at bucket 5 → partial manifest
    with pytest.raises(RuntimeError):
        run_resumable(
            spark, pages, lambda d: d.select("url", "text"), out, lin,
            num_buckets=8, run_id="r1", fail_on_bucket=5,
        )
    snap_partial = latest_snapshot(spark, lin)
    assert 0 < snap_partial < 8
    partial_docs = read_as_of(spark, out, lin).count()

    # resume completes the rest
    run_resumable(
        spark, pages, lambda d: d.select("url", "text"), out, lin,
        num_buckets=8, run_id="r2",
    )
    assert latest_snapshot(spark, lin) == 8
    assert read_as_of(spark, out, lin).count() == 120
    # time travel: the partial snapshot still reads the old view
    assert read_as_of(spark, out, lin, snapshot=snap_partial).count() == partial_docs
    assert partial_docs < 120
    # basePath: the bucket partition column survives a manifest read
    assert "bucket" in read_as_of(spark, out, lin).columns


def test_lineage_metric_rollups(spark, tmp_path):
    """North-rule 'per-partition lineage + metrics': run_resumable
    rolls per-bucket means of requested metric columns into the
    lineage row's metrics JSON, readable straight off the manifest."""
    import json

    import pyspark.sql.functions as F

    from docling_eval_spark.datagen.pages import write_pages_parquet
    from docling_eval_spark.plans.lineage import manifest_as_of, run_resumable

    pages_dir = str(tmp_path / "pages")
    write_pages_parquet(spark, pages_dir, 80, partitions=4)
    pages = spark.read.parquet(pages_dir)
    run_resumable(
        spark,
        pages,
        lambda d: d.select("url", F.length("text").alias("chars"),
                           F.lit(1.0).alias("match")),
        str(tmp_path / "out"),
        str(tmp_path / "lin"),
        num_buckets=4,
        metric_cols=["match", "chars", "absent_col"],
    )
    rows = manifest_as_of(spark, str(tmp_path / "lin")).collect()
    assert len(rows) == 4
    for r in rows:
        m = json.loads(r["metrics"])
        assert m["match"] == 1.0
        assert m["chars"] > 0
        assert "absent_col" not in m  # missing columns skipped, not null


def test_lineage_mixed_schema_generations(spark, tmp_path):
    """A lineage dir mixing pre-migration rows (no seq/data_path/
    metrics) with new-schema appends must serve the manifest with
    EVERY committed bucket: mergeSchema read + NULL-seq coalesce, no
    bucket silently dropped and no '{out}/None' paths."""
    import pyspark.sql.functions as F

    from docling_eval_spark.datagen.pages import write_pages_parquet
    from docling_eval_spark.plans.lineage import (
        manifest_as_of,
        read_as_of,
        run_resumable,
    )

    out = str(tmp_path / "out")
    lin = str(tmp_path / "lin")
    # legacy generation: bucket 0 committed by a pre-seq writer
    spark.range(3).selectExpr(
        "CAST(id AS STRING) AS url", "'x' AS text"
    ).write.parquet(f"{out}/bucket=0")
    spark.createDataFrame(
        [(0, "SUCCESS", 3, 3, 0, 1, "legacy")],
        "bucket int, status string, doc_count long, ok_count long, "
        "bytes_in long, wall_ms long, run_id string",
    ).write.parquet(lin)
    # new generation appends buckets 1..3 via run_resumable
    pages_dir = str(tmp_path / "pages")
    write_pages_parquet(spark, pages_dir, 40, partitions=2)
    pages = spark.read.parquet(pages_dir).withColumn(
        "url", F.concat(F.lit("u"), F.col("url"))
    )
    run_resumable(
        spark, pages, lambda d: d.select("url", "text"), out, lin, num_buckets=4
    )
    m = {r["bucket"]: r for r in manifest_as_of(spark, lin).collect()}
    assert set(m) == {0, 1, 2, 3}
    assert m[0]["data_path"] == "bucket=0"  # legacy NULL coalesced
    snap = read_as_of(spark, out, lin)
    assert snap.filter(F.col("bucket") == 0).count() == 3


def test_manifest_pre_migration_lineage_without_seq(spark, tmp_path):
    """A lineage table written before the seq/data_path columns existed
    must still serve manifest reads (fall back to all SUCCESS rows)
    instead of raising AnalysisException."""
    from docling_eval_spark.plans.lineage import manifest_as_of, read_as_of

    out = str(tmp_path / "out")
    lin = str(tmp_path / "lineage")
    for b, n in ((0, 3), (1, 2)):
        spark.range(n).selectExpr("id AS url", "'x' AS text").write.parquet(
            f"{out}/bucket={b}"
        )
    old_rows = [(b, "SUCCESS", n, n, 0, 1, "legacy") for b, n in ((0, 3), (1, 2))]
    spark.createDataFrame(
        old_rows,
        "bucket int, status string, doc_count long, ok_count long, "
        "bytes_in long, wall_ms long, run_id string",
    ).write.parquet(lin)
    m = manifest_as_of(spark, lin)
    assert sorted(r["bucket"] for r in m.collect()) == [0, 1]
    got = read_as_of(spark, out, lin)
    assert got.count() == 5 and "bucket" in got.columns
