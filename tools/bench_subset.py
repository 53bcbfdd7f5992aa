#!/usr/bin/env python
"""Time an arbitrary subset of registered queries at an arbitrary SF dir.

Usage: python tools/bench_subset.py --sf-dir .scaledata/sf10 q1 q2 ...

Same protocol as bench.py (warm-up pass, then min-of-N with a noop sink),
but parameterized so scaling waves (sf1.0 / sf10, VERDICT r6 item 1) don't
need one-off scripts. Prints one JSON line {query: sec} plus a total.
"""

from __future__ import annotations

import argparse
import gc
import json
import time

from pyspark.sql import SparkSession


def _force(df) -> None:
    try:
        df.write.mode("overwrite").format("noop").save()
    except Exception:
        df.count()


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("names", nargs="+")
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    ap.add_argument("--cpus", default="32")
    ap.add_argument("--runs", type=int, default=3)
    ap.add_argument("--warmup", type=int, default=1)
    args = ap.parse_args()

    spark = (
        SparkSession.builder.master(f"local[{args.cpus}]")
        .appName("bench-subset")
        .config("spark.sql.shuffle.partitions", str(max(int(args.cpus), 8)))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.driver.memory", "24g")
        .config("spark.driver.extraJavaOptions",
                "-XX:ReservedCodeCacheSize=512m")
        .config("spark.sql.autoBroadcastJoinThreshold",
                str(64 * 1024 * 1024))
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    from pyvectorsearch_spark.queries import all_queries

    registry = all_queries()
    missing = [n for n in args.names if n not in registry]
    if missing:
        raise SystemExit(f"unknown queries: {missing}")

    for _ in range(args.warmup):
        for name in args.names:
            gc.collect()
            _force(registry[name](spark, args.sf_dir))

    runs: dict[str, list[float]] = {n: [] for n in args.names}
    for _ in range(args.runs):
        for name in args.names:
            gc.collect()
            t0 = time.perf_counter()
            _force(registry[name](spark, args.sf_dir))
            runs[name].append(round(time.perf_counter() - t0, 3))

    timings = {n: min(ts) for n, ts in runs.items()}
    print(json.dumps({
        "queries": timings,
        "total_sec": round(sum(timings.values()), 3),
        "runs": runs,
        "sf_dir": args.sf_dir,
    }))
    spark.stop()


if __name__ == "__main__":
    main()
