"""SparkSession factory with scale-appropriate defaults.

Local testing runs ``local[N]`` in one JVM; the configs below are the
ones that matter identically on a 1000-executor cluster:

- AQE on (runtime coalescing + skew-join splitting),
- Arrow on with a bounded batch size (extraction rows carry whole HTML
  documents, so records/batch is tuned down from the 10k default),
- shuffle partitions sized to cores locally (set explicitly per-job at
  cluster scale),
- UTC session timezone so results compare bit-for-bit against the
  DuckDB oracle.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

# Columns carrying whole HTML pages make the default 10k-row Arrow batch
# too large; 1k keeps executor-side pandas frames ~tens of MB.
ARROW_BATCH_ROWS = 1024


def get_spark(
    app_name: str = "docling-eval-spark",
    cores: int | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) a SparkSession tuned for this engine.

    ``cores=None`` honors $SPARK_GRAFT_CPUS, defaulting to local[*].
    """
    if cores is None:
        env = os.environ.get("SPARK_GRAFT_CPUS")
        master = f"local[{env}]" if env else "local[*]"
    else:
        master = f"local[{cores}]"
    if shuffle_partitions is None:
        shuffle_partitions = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))

    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config(
            "spark.sql.execution.arrow.maxRecordsPerBatch", str(ARROW_BATCH_ROWS)
        )
        .config("spark.sql.session.timeZone", "UTC")
        # CPU-bound Python kernels need task counts set by rows-worth-
        # of-work, not bytes: 32 MB of page HTML ≈ 15k docs ≈ 30 s of
        # kernel time per task — fine-grained enough to keep all cores
        # busy, coarse enough to amortize Arrow batch setup. (The
        # 128 MB default produced 3 tasks for a 76 MB corpus.)
        .config("spark.sql.files.maxPartitionBytes", str(32 * 1024 * 1024))
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    return builder.getOrCreate()
