"""BFS crawl-depth: hand graphs, cap semantics, determinism."""

from __future__ import annotations

import pyspark.sql.functions as F

from docling_eval_spark.operators.web_ops import crawl_depth


def _run(spark, edges, seeds, max_hops=6):
    e = spark.createDataFrame(edges, "src string, dst string")
    s = spark.createDataFrame([(x,) for x in seeds], "node string")
    return {
        r["node"]: r["depth"]
        for r in crawl_depth(e, s, max_hops=max_hops).collect()
    }


def test_chain_depths(spark):
    edges = [("a", "b"), ("b", "c"), ("c", "d")]
    assert _run(spark, edges, ["a"]) == {"a": 0, "b": 1, "c": 2, "d": 3}


def test_diamond_takes_shortest_path(spark):
    # a→b→d and a→d: d must be 1, not 2
    edges = [("a", "b"), ("b", "d"), ("a", "d")]
    got = _run(spark, edges, ["a"])
    assert got["d"] == 1 and got["b"] == 1


def test_unreachable_absent_and_direction_respected(spark):
    # edge points INTO the seed: u stays unreachable
    edges = [("u", "a"), ("a", "b")]
    got = _run(spark, edges, ["a"])
    assert got == {"a": 0, "b": 1}


def test_multi_seed_min_and_duplicate_edges(spark):
    edges = [("a", "m"), ("a", "m"), ("z", "m"), ("m", "q")]
    got = _run(spark, edges, ["a", "z"])
    assert got == {"a": 0, "z": 0, "m": 1, "q": 2}


def test_hop_cap_truncates_frontier(spark):
    edges = [("a", "b"), ("b", "c"), ("c", "d")]
    got = _run(spark, edges, ["a"], max_hops=2)
    assert got == {"a": 0, "b": 1, "c": 2}  # d beyond the cap → absent


def test_cycle_terminates_with_settled_depths(spark):
    edges = [("a", "b"), ("b", "c"), ("c", "a")]
    got = _run(spark, edges, ["a"], max_hops=5)
    assert got == {"a": 0, "b": 1, "c": 2}


def test_frontier_bfs_matches_reference_on_random_graph(spark):
    """The frontier-joined loop (only depth==round-1 nodes probe the
    edge list) must equal a plain breadth-first reference exactly on
    a pseudorandom graph with cycles, shortcuts and unreachable
    nodes, at several hop caps."""
    n = 200
    edges = [
        (f"n{(7 * i) % n}", f"n{(11 * i + 3) % n}") for i in range(350)
    ] + [("iso_src", "iso_dst")]  # disconnected from the seeds
    seeds = ["n0", "n13"]

    def ref_bfs(edge_list, seed_list, max_hops):
        from collections import defaultdict

        adj = defaultdict(list)
        for s, t in edge_list:
            adj[s].append(t)
        depth = {s: 0 for s in seed_list}
        cur = set(seed_list)
        for d in range(1, max_hops + 1):
            nxt = set()
            for u in cur:
                for v in adj[u]:
                    if v not in depth:
                        depth[v] = d
                        nxt.add(v)
            cur = nxt
        return depth

    for hops in (1, 3, 6):
        got = _run(spark, edges, seeds, max_hops=hops)
        assert got == ref_bfs(edges, seeds, hops), f"hops={hops}"


def test_depth_partition_invariance(spark):
    li = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
    fwd = li.select(
        F.concat(F.lit("o"), F.col("l_orderkey").cast("string")).alias("src"),
        F.concat(F.lit("p"), F.col("l_partkey").cast("string")).alias("dst"),
    )
    edges = fwd.unionAll(
        fwd.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    )
    seeds = edges.select(F.col("src").alias("node")).filter(
        F.col("node") == "o1"
    )
    a = sorted(map(tuple, crawl_depth(edges, seeds, max_hops=3).collect()))
    b = sorted(
        map(
            tuple,
            crawl_depth(edges.repartition(13), seeds, max_hops=3).collect(),
        )
    )
    assert a == b and len(a) > 1
