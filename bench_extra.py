"""Per-query isolation bench + plan dumper (guide §1.4/§1.5).

NOT the contract bench — bench.py is frozen for measurement; this file
exists so optimization work can time one query at a time through the
noop sink and capture `.explain("formatted")` without touching the
driver's methodology.

Usage:
  python bench_extra.py [--warm N] [--plans DIR] [--sf DIR] q1 q2 ...

Prints one JSON line {"queries": {name: {"cold": s, "warm": [...]}},
"sf": ..., "cpus": ...}. With --plans DIR, writes DIR/<q>.txt with the
formatted plan of each query (analyzed, pre-execution — same output the
committed plans/r06/*_before.txt / _after.txt files carry).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))

import __spark_entry__ as entrymod  # noqa: E402
from docling_eval_spark.session import get_spark  # noqa: E402


def _force(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--warm", type=int, default=2)
    ap.add_argument("--plans", default=None)
    ap.add_argument("--sf", default=None)
    ap.add_argument("queries", nargs="+")
    args = ap.parse_args()

    sf_dir = args.sf or os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"
    )
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = get_spark("bench-extra", cores=cpus, shuffle_partitions=cpus)
    import shutil
    import tempfile

    ckpt_dir = tempfile.mkdtemp(prefix="bench_extra_ckpt_")
    spark.sparkContext.setCheckpointDir(ckpt_dir)
    qs = dict(entrymod.queries())

    # untimed warm-up (python workers + codegen), same as bench.py
    _force(qs["extract_match_stats"](spark, sf_dir))

    out: dict[str, dict] = {}
    for name in args.queries:
        if name not in qs:
            print(f"unknown query {name!r}", file=sys.stderr)
            continue
        if args.plans:
            Path(args.plans).mkdir(parents=True, exist_ok=True)
            df = qs[name](spark, sf_dir)
            plan = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
            (Path(args.plans) / f"{name}.txt").write_text(plan)
        spark.sparkContext.setJobDescription(f"bench_extra: {name} cold")
        t0 = time.monotonic()
        _force(qs[name](spark, sf_dir))
        cold = round(time.monotonic() - t0, 3)
        warms = []
        for i in range(args.warm):
            spark.sparkContext.setJobDescription(
                f"bench_extra: {name} warm{i}"
            )
            t0 = time.monotonic()
            _force(qs[name](spark, sf_dir))
            warms.append(round(time.monotonic() - t0, 3))
        spark.sparkContext.setJobDescription(None)
        out[name] = {"cold": cold, "warm": warms}
        print(f"{name}: cold={cold} warm={warms}", file=sys.stderr)

    print(json.dumps({"queries": out, "sf": sf_dir, "cpus": cpus}))
    spark.stop()
    shutil.rmtree(ckpt_dir, ignore_errors=True)


if __name__ == "__main__":
    main()
