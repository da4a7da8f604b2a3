"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS].

Prints ONE JSON line:
  {"metric": ..., "value": total_sec, "unit": "sec",
   "queries": {name: sec, ...}, "sf": ..., ...extras}

The headline number couples the two contract metrics: end-to-end
extraction wall time (render → kernel → match check) and the
relational/operator suite. Extraction docs/sec is reported as an
extra key. Scaling-efficiency evidence (local[8] vs local[32]) is
produced by scripts/scaling_bench.py into BENCH/BASELINE.md.
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))

import __spark_entry__ as entrymod  # noqa: E402
from docling_eval_spark.session import get_spark  # noqa: E402

BENCH_QUERIES = [
    "extract_match_stats",
    "extract_md5",
    "pricing_summary",
    "stats_discount",
    "histogram_cumsum",
    "revenue_by_nation",
    "topk_orders",
    "reading_order_ard",
    "token_set_metrics",
    "exact_dedup",
    "minhash_pairs",
    "simhash",
    "cosine_topk",
    "near_dup_pairs",
    "gopher_quality",
    "repetition_bigrams",
    "corpus_map",
    "teds_known_distance",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    sf = sf_dir.rstrip("/").split("sf")[-1]
    spark = get_spark("bench", cores=cpus, shuffle_partitions=cpus)
    qs = entrymod.queries()

    timings: dict[str, float] = {}
    n_docs = spark.read.parquet(f"{sf_dir}/documents.parquet").count()
    # untimed warm-up: spawn every Python worker (pandas + package
    # imports ~1-2 s each) and compile codegen so timings measure
    # steady-state, not first-job startup
    qs["extract_match_stats"](spark, sf_dir).write.format("noop").mode(
        "overwrite"
    ).save()
    warm: dict[str, float] = {}
    for name in BENCH_QUERIES:
        t0 = time.monotonic()
        df = qs[name](spark, sf_dir)
        # noop sink: forces EVERY output column to materialize —
        # count()-style forcing lets Catalyst prune computed columns
        # and under-measures
        df.write.format("noop").mode("overwrite").save()
        timings[name] = round(time.monotonic() - t0, 3)
        # second run: plan-compile amortized — the steady-state cost a
        # warehouse pays (cold-minus-warm ≈ Catalyst compile of the
        # wide expression trees, a per-query constant, not a per-row
        # cost; at this sf it dominates several queries)
        t0 = time.monotonic()
        qs[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
        warm[name] = round(time.monotonic() - t0, 3)

    extract_sec = timings["extract_match_stats"]
    total = round(sum(timings.values()), 3)
    print(
        json.dumps(
            {
                "metric": "headline suite wall time (extraction + eval + operators)",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "queries_warm": warm,
                "value_warm": round(sum(warm.values()), 3),
                "sf": sf,
                "cpus": cpus,
                "extraction_docs": n_docs,
                "extraction_docs_per_sec": round(n_docs / extract_sec, 2)
                if extract_sec > 0
                else None,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
