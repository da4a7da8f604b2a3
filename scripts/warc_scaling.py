"""Scaling evidence for the WARC ingest path (BENCH/BASELINE.md §WARC).

Same two-cluster-size criterion as scripts/scaling_bench.py, applied
to the true Common-Crawl ingest shape:

    .warc.gz files → read_warc (per-file gzip-member parse)
      → warc_to_pages → extraction kernel → byte-identity aggregate

Parallelism here is PER FILE (gzip members are not splittable), so the
fixture packs the corpus into many small .warc.gz files — the
small-scale twin of Common Crawl's ~100k × 1 GiB layout. Files are
written in parallel by a Spark foreachPartition pass (one file per
partition, partition id in the name).

Methodology matches scaling_bench.py: separate fresh-JVM child per
level, all-core warm-up before the timed window, best-of-3 with
cooldowns, identity hash outside the timed window.

Usage: python3 scripts/warc_scaling.py [n_docs] [n_files] [draws] [cooldown_sec]
       (defaults 50000, 128, 2, 120) — draws = full 4-level sweeps
       (best throughput per level across draws is reported); cooldown
       = idle seconds between child JVMs (host-thermal methodology)
"""

from __future__ import annotations

import json
import subprocess
import sys
import tempfile
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent

CHILD = r"""
import json, sys, time
sys.path.insert(0, "@REPO@")
from pyspark.sql import SparkSession
import pyspark.sql.functions as F
from docling_eval_spark.sources.warc import read_warc, warc_to_pages
from docling_eval_spark.extraction.stage import extract_text_stage

cores = int(sys.argv[1]); warc_dir = sys.argv[2]; pages_dir = sys.argv[3]
spark = (SparkSession.builder.appName(f"warc-scale-{cores}")
         .master(f"local[{cores}]")
         .config("spark.sql.shuffle.partitions", str(cores))
         .config("spark.sql.adaptive.coalescePartitions.enabled", "false")
         .config("spark.driver.memory", "16g")
         .config("spark.ui.enabled", "false")
         .getOrCreate())

def pipeline():
    pages = warc_to_pages(read_warc(spark, warc_dir))
    return (extract_text_stage(pages)
            .select("url", F.md5("extracted_text").alias("ex_md5"))
            .join(spark.read.parquet(pages_dir)
                  .select("url", F.md5("text").alias("gt_md5"))
                  .coalesce(cores).hint("shuffle_hash"), "url")
            .agg(F.count("*").alias("docs"),
                 F.sum(F.when(F.col("ex_md5") == F.col("gt_md5"), 1)
                       .otherwise(0)).alias("identical")))

# warm-up: spin every Python worker + compile before the timed window
warc_to_pages(read_warc(spark, warc_dir)).limit(cores * 8).write.format("noop").mode("overwrite").save()

walls = []
res = None
for _ in range(3):
    time.sleep(5)
    t0 = time.monotonic()
    res = pipeline().collect()[0]
    walls.append(time.monotonic() - t0)

wall = min(walls)
print("RESULT " + json.dumps({
    "cores": cores, "docs": res["docs"], "identical": res["identical"],
    "sec": round(wall, 2),
    "docs_per_sec": round(res["docs"] / wall, 1)}))
spark.stop()
"""


def main() -> None:
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 50000
    n_files = int(sys.argv[2]) if len(sys.argv) > 2 else 128
    work = tempfile.mkdtemp(prefix="warc_scaling_")
    warc_dir = f"{work}/warc"
    pages_dir = f"{work}/pages"
    script = f"{work}/child.py"
    Path(script).write_text(CHILD.replace("@REPO@", str(REPO)))
    Path(warc_dir).mkdir()

    sys.path.insert(0, str(REPO))
    from docling_eval_spark.datagen.pages import write_pages_parquet
    from docling_eval_spark.session import get_spark

    spark = get_spark("warc-datagen", cores=16, shuffle_partitions=16)
    write_pages_parquet(spark, pages_dir, n_docs, partitions=n_files)
    pages = spark.read.parquet(pages_dir)

    def write_partition(rows) -> None:
        from pyspark import TaskContext

        from docling_eval_spark.sources.warc import encode_warc
        pid = TaskContext.get().partitionId()
        chunk = [
            {"url": r["url"], "warc_ts": r["warc_ts"], "html": bytes(r["html"])}
            for r in rows
        ]
        if chunk:
            Path(f"{warc_dir}/crawl-{pid:05d}.warc.gz").write_bytes(
                encode_warc(chunk)
            )

    pages.repartition(n_files).foreachPartition(write_partition)
    spark.stop()
    time.sleep(2)

    # host-thermal methodology (BENCH/BASELINE.md cross-draw note):
    # the host's absolute speed drifts under sustained saturation, so a
    # single 4→8→16→32 sweep systematically penalizes the later
    # (hotter) levels. Run DRAWS full sweeps with inter-child
    # cooldowns and take each level's best throughput across draws.
    draws = int(sys.argv[3]) if len(sys.argv) > 3 else 2
    cooldown = int(sys.argv[4]) if len(sys.argv) > 4 else 120
    levels = [4, 8, 16, 32]
    per_draw: list[dict[int, dict]] = []
    for d in range(draws):
        results = {}
        for n in levels:
            out = subprocess.run(
                [sys.executable, script, str(n), warc_dir, pages_dir],
                capture_output=True, text=True, timeout=1800,
            )
            line = [
                ln for ln in out.stdout.splitlines() if ln.startswith("RESULT ")
            ]
            if not line:
                print(out.stdout[-2000:], out.stderr[-2000:], file=sys.stderr)
                raise SystemExit(f"child local[{n}] failed")
            results[n] = json.loads(line[0][len("RESULT "):])
            time.sleep(cooldown)
        per_draw.append(results)

    best = {
        n: max((d[n] for d in per_draw), key=lambda r: r["docs_per_sec"])
        for n in levels
    }

    def eff(res: dict, lo: int, hi: int) -> float:
        return (res[hi]["docs_per_sec"] / res[lo]["docs_per_sec"]) / (hi / lo)

    print(json.dumps({
        "n_docs": n_docs, "n_files": n_files, "draws": draws,
        "levels_best": {str(n): best[n] for n in levels},
        "per_draw_eff": [
            {"eff_4_16": round(eff(d, 4, 16), 3),
             "eff_8_32": round(eff(d, 8, 32), 3)}
            for d in per_draw
        ],
        "eff_4_16": round(eff(best, 4, 16), 3),
        "eff_8_32": round(eff(best, 8, 32), 3),
        "identical_ok": all(
            r["identical"] == r["docs"] == n_docs
            for d in per_draw for r in d.values()
        ),
    }))


if __name__ == "__main__":
    main()
