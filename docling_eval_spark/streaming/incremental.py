"""Incremental (streaming) processing of newly-landed page shards.

The reference's only "incremental" mechanism is a manual shard loop
with no restart (`doclaynet_v1/create.py:292-301`). Spark-native
replacement: Structured Streaming file source over the pages
directory with ``trigger(availableNow=True)`` + checkpoint — each
invocation processes exactly the files not yet seen by the
checkpoint, then stops. Exactly-once output via the file-sink commit
log. This complements plans/lineage.py (bucket-level batch resume)
with file-level streaming resume.

Also provided: a windowed quality-metric stream (watermark + tumbling
window over warc_ts) as the streaming analog of the evaluator
aggregations — late pages beyond the watermark are dropped instead of
re-opening closed windows.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from docling_eval_spark.datagen.pages import PAGES_SCHEMA
from docling_eval_spark.extraction.stage import extract_stage


def incremental_extract(
    spark: SparkSession,
    pages_dir: str,
    out_dir: str,
    checkpoint_dir: str,
) -> int:
    """Process all unseen page files, append extracted docs to
    ``out_dir``; returns rows written this increment."""
    stream = (
        spark.readStream.schema(PAGES_SCHEMA)
        .option("maxFilesPerTrigger", 64)
        .parquet(pages_dir)
    )
    extracted = extract_stage(stream)
    counter = {"rows": 0}

    def sink(batch_df: DataFrame, epoch_id: int) -> None:
        n = batch_df.count()
        counter["rows"] += n
        if n:
            batch_df.write.mode("append").parquet(out_dir)

    q = (
        extracted.writeStream.foreachBatch(sink)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return counter["rows"]


def windowed_match_rate(
    spark: SparkSession,
    pages_dir: str,
    checkpoint_dir: str,
    window: str = "1 hour",
    watermark: str = "2 hours",
) -> DataFrame:
    """Streaming tumbling-window extraction-match-rate by lang;
    returns the complete result table after draining available data
    (memory sink, availableNow)."""
    stream = spark.readStream.schema(PAGES_SCHEMA).parquet(pages_dir)
    # GT columns ride through the extraction kernel (no stream-stream
    # self-join needed — a narrow map keeps the plan append-only)
    from docling_eval_spark.extraction.kernel import extract_text as _xt

    def kernel(batches):
        for pdf in batches:
            out = pdf[["url", "warc_ts", "lang"]].copy()
            out["is_match"] = [
                int(_xt(h) == t) for h, t in zip(pdf["html"], pdf["text"])
            ]
            yield out

    matched = stream.select("url", "warc_ts", "lang", "html", "text").mapInPandas(
        kernel, schema="url string, warc_ts timestamp, lang string, is_match int"
    )
    agg = (
        matched.withWatermark("warc_ts", watermark)
        .groupBy(F.window("warc_ts", window), "lang")
        .agg(
            F.count("*").alias("docs"),
            F.avg("is_match").alias("match_rate"),
        )
    )
    name = f"wmr_{abs(hash(pages_dir)) % 10**8}"
    q = (
        agg.writeStream.outputMode("complete")
        .format("memory")
        .queryName(name)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.sql(f"SELECT window.start AS ws, lang, docs, match_rate FROM {name}")
