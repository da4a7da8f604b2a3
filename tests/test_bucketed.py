"""Bucketed co-located joins: the join-without-exchange contract."""

from __future__ import annotations

import pyspark.sql.functions as F

from docling_eval_spark.sources.bucketed import (
    cobucketed_join,
    read_table,
    write_bucketed,
)


def test_cobucketed_join_elides_both_exchanges(spark):
    # the fixture tables are tiny, so Spark would broadcast and hide
    # the bucket layout — disable auto-broadcast to plan the join the
    # way a 100 TB table pair would be planned
    old_thr = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        _run_cobucketed_join_case(spark)
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old_thr)


def _run_cobucketed_join_case(spark):
    left = spark.range(0, 1000).select(
        F.col("id").alias("k"), (F.col("id") * 2).alias("lv")
    )
    right = spark.range(0, 1000).select(
        F.col("id").alias("k"), (F.col("id") * 3).alias("rv")
    )
    write_bucketed(left, "bkt_left", "k", n_buckets=8)
    write_bucketed(right, "bkt_right", "k", n_buckets=8)
    joined = cobucketed_join(spark, "bkt_left", "bkt_right", "k")
    plan = joined._jdf.queryExecution().executedPlan().toString()
    # the whole point: NO shuffle on either side — bucket i joins
    # bucket i map-side (broadcast would also be exchange-free but
    # hides the bucket effect, so rule it out too)
    assert "Exchange hashpartitioning" not in plan
    assert "BroadcastExchange" not in plan
    # and the result is the plain join's result
    n = joined.count()
    assert n == 1000
    row = joined.filter(F.col("k") == 7).collect()[0]
    assert (row["lv"], row["rv"]) == (14, 21)

    # contrast: the same data joined WITHOUT bucketing shuffles —
    # proving the elision came from the bucket layout, not the size
    plain = left.join(right.withColumnRenamed("rv", "rv2"), "k")
    plain_plan = plan_of(plain)
    assert (
        "Exchange hashpartitioning" in plain_plan
        or "BroadcastExchange" in plain_plan
    )


def plan_of(df):
    return df._jdf.queryExecution().executedPlan().toString()


def test_bucketed_aggregation_no_exchange(spark):
    """A groupBy on the bucket key also rides the bucket layout —
    partial+final aggregation collapses with no exchange."""
    df = spark.range(0, 500).select(
        (F.col("id") % 50).alias("k"), F.col("id").alias("v")
    )
    write_bucketed(df, "bkt_agg", "k", n_buckets=4)
    agg = read_table(spark, "bkt_agg").groupBy("k").agg(F.sum("v").alias("s"))
    assert "Exchange hashpartitioning" not in plan_of(agg)
    got = {r["k"]: r["s"] for r in agg.collect()}
    assert got[0] == sum(i for i in range(500) if i % 50 == 0)
    assert len(got) == 50
