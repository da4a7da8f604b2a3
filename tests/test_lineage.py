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
