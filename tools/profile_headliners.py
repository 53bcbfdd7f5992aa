#!/usr/bin/env python
"""Round-8 bench hygiene (VERDICT r7 ask #6): isolate the top headline
rows and split their wall time into (a) fresh-plan/codegen overhead, (b)
steady-state execution, on an otherwise QUIET host.

Protocol per query: one fresh-session first run (cold: plan + codegen +
index-artifact load), then N timed steady-state runs in the same session
(the bench's own regime — it warms up first and reports min-of-3). The
gap between cold and steady is fixed session overhead a long-running
engine amortizes; the steady min is the real work. Compare steady mins
against the committed bench rows to decide "host band" vs regression.

Usage: PYTHONPATH=/root/repo python tools/profile_headliners.py [q1 q2 ...]
Prints ONE JSON line.
"""

from __future__ import annotations

import gc
import json
import os
import sys
import time

from pyspark.sql import SparkSession

DEFAULT = ["dedup_clusters", "knn_grid_query_table", "dedup_simhash",
           "dedup_minhash_lsh", "knn_bruteforce"]


def _force(df) -> None:
    try:
        df.write.mode("overwrite").format("noop").save()
    except Exception:
        df.count()


def main() -> None:
    names = sys.argv[1:] or DEFAULT
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .config("spark.sql.shuffle.partitions", str(max(int(cpus), 8)))
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
    out = {}
    for name in names:
        fn = registry[name]
        gc.collect()
        t0 = time.perf_counter()
        _force(fn(spark, sf_dir))
        cold = time.perf_counter() - t0
        steady = []
        for _ in range(5):
            gc.collect()
            t0 = time.perf_counter()
            _force(fn(spark, sf_dir))
            steady.append(round(time.perf_counter() - t0, 3))
        out[name] = {
            "cold_sec": round(cold, 3),
            "steady": steady,
            "steady_min": min(steady),
            "steady_median": sorted(steady)[len(steady) // 2],
            "overhead_sec": round(cold - min(steady), 3),
        }
    print(json.dumps({"sf_dir": sf_dir, "profile": out}))
    spark.stop()


if __name__ == "__main__":
    main()
