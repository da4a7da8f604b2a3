"""Weighted reservoir sampling + rendezvous sharding."""

from __future__ import annotations

import math
from collections import Counter

import pyspark.sql.functions as F

from docling_eval_spark.operators.web_ops import (
    rendezvous_assign,
    weighted_sample_topk,
)

MOD = 2_147_483_647


def _es_key(doc_id: int, w: int) -> int:
    u = ((doc_id * 1_000_003 + 12_345) % MOD + 1) / 2_147_483_648.0
    x = math.log(u) / w * 1e6
    return int(math.floor(x + 0.5)) if x >= 0 else int(math.ceil(x - 0.5))


def test_weighted_sample_matches_python_ranking(spark):
    rows = [(i, (i % 7) + 1) for i in range(1, 400)]
    df = spark.createDataFrame(rows, "id long, w long")
    got = [
        (r["id"], r["es_key_micro"])
        for r in weighted_sample_topk(df, "id", "w", 25).collect()
    ]
    expect = sorted(
        ((i, _es_key(i, w)) for i, w in rows),
        key=lambda t: (-t[1], t[0]),
    )[:25]
    assert got == expect


def test_weighted_sample_zero_weight_never_drawn(spark):
    df = spark.createDataFrame(
        [(1, 0), (2, -5), (3, 10)], "id long, w long"
    )
    got = weighted_sample_topk(df, "id", "w", 10).collect()
    assert [r["id"] for r in got] == [3]


def test_weighted_sample_is_weight_proportional(spark):
    """Statistical sanity: ids ≡ 0 (mod 2) get weight 9, others 1 —
    the heavy half must dominate a 200-of-2000 draw (its expected
    share is 9/10; the hash draw should land far above 1/2)."""
    rows = [(i, 9 if i % 2 == 0 else 1) for i in range(1, 2001)]
    df = spark.createDataFrame(rows, "id long, w long")
    got = [r["id"] for r in weighted_sample_topk(df, "id", "w", 200).collect()]
    heavy = sum(1 for i in got if i % 2 == 0)
    assert heavy > 140  # E≈180 under exact E-S; far from unweighted 100


def test_rendezvous_deterministic_and_balanced(spark):
    df = spark.createDataFrame([(i,) for i in range(1, 2001)], "k long")
    shards = [f"s{i}" for i in range(8)]
    a = {r["k"]: r["shard"] for r in rendezvous_assign(df, "k", shards).collect()}
    b = {
        r["k"]: r["shard"]
        for r in rendezvous_assign(df.repartition(7), "k", shards).collect()
    }
    assert a == b
    counts = Counter(a.values())
    assert len(counts) == 8
    # rough balance: every shard within 3x of fair share
    assert max(counts.values()) < 3 * (2000 / 8)
    assert min(counts.values()) > (2000 / 8) / 3


def test_rendezvous_minimal_relocation_on_shard_add(spark):
    """THE rendezvous property: adding a 9th shard may move a key
    ONLY to the new shard — keys whose argmax was an old shard keep
    it (old scores are unchanged by the new entrant)."""
    df = spark.createDataFrame([(i,) for i in range(1, 2001)], "k long")
    old = [f"s{i}" for i in range(8)]
    new = old + ["s8"]
    before = {r["k"]: r["shard"] for r in rendezvous_assign(df, "k", old).collect()}
    after = {r["k"]: r["shard"] for r in rendezvous_assign(df, "k", new).collect()}
    moved = {k for k in before if before[k] != after[k]}
    assert all(after[k] == "s8" for k in moved)
    # and roughly 1/9 of keys move
    assert 2000 / 9 / 3 < len(moved) < 3 * 2000 / 9
