"""Incremental processing via Structured Streaming availableNow +
checkpoint (SURVEY §2.10)."""

from __future__ import annotations

from docling_eval_spark.datagen.pages import pages_dataframe
from docling_eval_spark.streaming.incremental import (
    incremental_extract,
    windowed_match_rate,
)


def test_incremental_extract_processes_only_new_files(spark, tmp_path):
    pages_dir = str(tmp_path / "pages")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")

    pages_dataframe(spark, 60, partitions=2).write.mode("append").parquet(pages_dir)
    n1 = incremental_extract(spark, pages_dir, out, ckpt)
    assert n1 == 60
    assert spark.read.parquet(out).count() == 60

    # second increment: only the new shard is processed
    pages_dataframe(spark, 40, seed=43, partitions=2).write.mode("append").parquet(
        pages_dir
    )
    n2 = incremental_extract(spark, pages_dir, out, ckpt)
    assert n2 == 40
    assert spark.read.parquet(out).count() == 100

    # third: nothing new
    assert incremental_extract(spark, pages_dir, out, ckpt) == 0


def test_windowed_match_rate(spark, tmp_path):
    pages_dir = str(tmp_path / "pages")
    ckpt = str(tmp_path / "ckpt2")
    pages_dataframe(spark, 50, partitions=2).write.mode("append").parquet(pages_dir)
    res = windowed_match_rate(spark, pages_dir, ckpt, window="1 hour")
    rows = res.collect()
    assert len(rows) > 0
    assert sum(r["docs"] for r in rows) == 50
    assert all(r["match_rate"] == 1.0 for r in rows)


def test_incremental_dedup_flow(spark, tmp_path):
    """Continuous-ingest dedup story: batch pass writes a signature
    store; each new shard joins only (new x all) and appends its own
    signatures — old x old never recomputed."""
    from docling_eval_spark.operators.dedup import (
        minhash_incremental_pairs,
        minhash_signatures,
    )

    store_dir = str(tmp_path / "sig_store")
    batch = spark.createDataFrame(
        [
            (0, "the quick brown fox jumps over the lazy dog"),
            (1, "completely unrelated text about spark engines and shuffles"),
        ],
        "doc_id long, text string",
    )
    minhash_signatures(batch, "doc_id").write.mode("overwrite").parquet(store_dir)

    for shard_id, rows in enumerate(
        [
            [(10, "the quick brown fox jumps over the lazy dog")],  # dup of 0
            [(20, "fresh novel material"), (21, "fresh novel material")],
        ]
    ):
        new = spark.createDataFrame(rows, "doc_id long, text string")
        new_sigs = minhash_signatures(new, "doc_id")
        store = spark.read.parquet(store_dir)
        pairs = {
            (r["id_l"], r["id_r"])
            for r in minhash_incremental_pairs(new_sigs, store).collect()
        }
        if shard_id == 0:
            assert (0, 10) in pairs and all(l != 1 for l, _ in pairs)
        else:
            assert (20, 21) in pairs
            assert all({l, r} & {20, 21} for l, r in pairs)  # only new-x-*
        new_sigs.write.mode("append").parquet(store_dir)

    assert spark.read.parquet(store_dir).count() == 5
