"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS].

Prints ONE JSON line:
  {"metric": ..., "value": total_sec, "unit": "sec",
   "queries": {name: sec, ...}, "sf": ..., ...extras}

The headline number couples the two contract metrics: end-to-end
extraction wall time (render → kernel → match check) and the
relational/operator suite. Scaling-efficiency evidence (local[8] vs
local[32]) is produced by scripts/scaling_bench.py into
BENCH/BASELINE.md.

Methodology (VERDICT r2 'What's wrong' #3 — this host's all-core
frequency drifts across consecutive saturating runs, so single-shot
fixed-order timings confound drift with regressions):

- one untimed global warm-up spawns Python workers + JIT.
- per query, ONE true-cold run (first execution in this JVM: includes
  Catalyst analysis + codegen compile; by definition unrepeatable in
  one process, kept for round-over-round continuity) ...
- ... then WARM_PASSES full passes over the query list in ALTERNATING
  order (forward / reverse / forward) with a cooldown between passes.
  Per query we report the warm MEDIAN and the spread (max−min)/median.
  The warm median in alternating order is the regression-detection
  number: host drift hits early and late list positions symmetrically
  across passes, so a >spread change between rounds is a plan change,
  not drift.

Every timed run forces materialization through the noop sink (count()
lets Catalyst prune computed columns and under-measures).
"""

from __future__ import annotations

import json
import os
import statistics
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
    "simhash_prod",
    "cosine_topk",
    "near_dup_pairs",
    "gopher_quality",
    "repetition_bigrams",
    "duplicate_spans",
    "corpus_map",
    "teds_known_distance",
    "ngram_lm",
    "page_rank",
    "tfidf_top_terms",
    "contamination",
    "chunk_documents",
]

WARM_PASSES = 3
COOLDOWN_SEC = 3.0


def _simhash_prod(spark, sf_dir):
    """Production simhash path (default xxhash64 token hash) — the
    contract query `simhash` runs portable=True for the DuckDB oracle;
    this entry times what a real corpus run pays."""
    from docling_eval_spark.operators.dedup import simhash

    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return simhash(d, "doc_id")


def _force(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    sf = sf_dir.rstrip("/").split("sf")[-1]
    spark = get_spark("bench", cores=cpus, shuffle_partitions=cpus)
    # a configured checkpoint dir is the scratch-space signal:
    # duplicate_spans materializes its postings there (write-once
    # instead of running the hashing kernel twice) — the production
    # configuration a real pipeline would use
    import shutil
    import tempfile

    ckpt_dir = tempfile.mkdtemp(prefix="bench_ckpt_")
    spark.sparkContext.setCheckpointDir(ckpt_dir)
    qs = dict(entrymod.queries())
    # same package-shipping wrapper as every contract query: the
    # mapInPandas kernel must not depend on another query having
    # installed the package on the session first
    qs["simhash_prod"] = entrymod._with_pkg(_simhash_prod)

    n_docs = spark.read.parquet(f"{sf_dir}/documents.parquet").count()
    # untimed warm-up: spawn every Python worker (pandas + package
    # imports ~1-2 s each) and compile codegen so timings measure
    # steady-state, not first-job startup
    _force(qs["extract_match_stats"](spark, sf_dir))

    cold: dict[str, float] = {}
    warm_samples: dict[str, list[float]] = {q: [] for q in BENCH_QUERIES}
    for name in BENCH_QUERIES:
        t0 = time.monotonic()
        _force(qs[name](spark, sf_dir))
        cold[name] = round(time.monotonic() - t0, 3)
    for p in range(WARM_PASSES):
        time.sleep(COOLDOWN_SEC)
        order = BENCH_QUERIES if p % 2 == 0 else list(reversed(BENCH_QUERIES))
        for name in order:
            t0 = time.monotonic()
            _force(qs[name](spark, sf_dir))
            warm_samples[name].append(time.monotonic() - t0)

    warm_med = {
        q: round(statistics.median(v), 3) for q, v in warm_samples.items()
    }
    spread_pct = {
        q: round(100.0 * (max(v) - min(v)) / statistics.median(v), 1)
        if statistics.median(v) > 0
        else 0.0
        for q, v in warm_samples.items()
    }

    extract_sec = cold["extract_match_stats"]
    total = round(sum(cold.values()), 3)
    print(
        json.dumps(
            {
                "metric": "headline suite wall time (extraction + eval + operators)",
                "value": total,
                "unit": "sec",
                "queries": cold,
                "queries_warm_med": warm_med,
                "queries_spread_pct": spread_pct,
                "value_warm_med": round(sum(warm_med.values()), 3),
                "warm_passes": WARM_PASSES,
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
    shutil.rmtree(ckpt_dir, ignore_errors=True)


if __name__ == "__main__":
    main()
