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

Round-10 (VERDICT r9 ask #7): the r9 steady runs spread 5.6-9.1 s on
`dedup_clusters` — useless for drift attribution. Every steady pass is now
BRACKETED by the bench's fixed-seed calibration trial (`bench.run_calibration`
— engine-independent GEMM), and each query gets a `steady_min_normalized`
column: steady_min divided by the run-window host band, so per-query noise
divides out and a real plan regression shows as normalized drift.

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

    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    from bench import SPARK_CALIB_REF_SEC, spark_calibration_trial

    registry = all_queries()
    spark_calibration_trial(spark)  # codegen warm-up for the calib shape
    out = {}
    for name in names:
        fn = registry[name]
        gc.collect()
        t0 = time.perf_counter()
        _force(fn(spark, sf_dir))
        cold = time.perf_counter() - t0
        steady, calib = [], [round(spark_calibration_trial(spark), 3)]
        for _ in range(5):
            gc.collect()
            t0 = time.perf_counter()
            _force(fn(spark, sf_dir))
            steady.append(round(time.perf_counter() - t0, 3))
            calib.append(round(spark_calibration_trial(spark), 3))
        band = round(min(calib) / SPARK_CALIB_REF_SEC, 3)
        out[name] = {
            "cold_sec": round(cold, 3),
            "steady": steady,
            "steady_min": min(steady),
            "steady_median": sorted(steady)[len(steady) // 2],
            "overhead_sec": round(cold - min(steady), 3),
            # interleaved engine-independent calibration: the host band
            # DURING this query's steady passes, and the noise-normalized
            # steady min (divide only when the host is slow, never inflate)
            "calib": calib,
            "host_band": band,
            "steady_min_normalized": round(min(steady) / max(band, 1.0), 3),
        }
    print(json.dumps({
        "sf_dir": sf_dir, "spark_calib_ref_sec": SPARK_CALIB_REF_SEC,
        "profile": out,
    }))
    spark.stop()


if __name__ == "__main__":
    main()
