#!/usr/bin/env python
"""Round-8 soak of the streamed-ingest WRITE path (VERDICT r7 ask #1).

The read path carried sf10 measurements since round 7; this drives the
write path (`stream_index_ingest` + per-batch incremental K-instantiation
+ the r8 compactor) through a long many-micro-batch drain and reports:

- per-batch end-to-end latency (first/median/p90/max) and its TREND across
  the drain — the cascade re-runs over the full fine-cell count table every
  batch, so per-batch cost should grow with #cells, not with corpus rows;
- sidecar version churn (the pointer GC must leave exactly one live
  version triple however many batches ran);
- the small-files story: data-file count at end of drain with and without
  the size-based compaction trigger;
- a search spot-check: the served index must equal brute force.

Usage:
  PYTHONPATH=/root/repo python tools/soak_ingest.py <sf_dir> <n_batches> \
      [--compact N] [--occ K] [--probes P] [--out-root DIR]

Prints ONE JSON line.
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import shutil
import statistics
import tempfile
import time

from pyspark.sql import SparkSession
from pyspark.sql import functions as F


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("sf_dir")
    ap.add_argument("n_batches", type=int)
    ap.add_argument("--compact", type=int, default=None,
                    help="compact_min_batches trigger (default: off)")
    ap.add_argument("--layout", default="sorted", choices=["sorted", "cells"])
    ap.add_argument("--occ", type=int, default=16)
    ap.add_argument("--run-merge-k", type=int, default=None,
                    help="leveled-fold fan-in (0 = r9 fold-to-base, for "
                         "A/B cost measurement; default: module default)")
    ap.add_argument("--probes", type=int, default=5)
    ap.add_argument("--out-root", default=None)
    ap.add_argument("--cpus", type=int, default=int(
        os.environ.get("SPARK_GRAFT_CPUS", "32")))
    ap.add_argument("--synth-cells", type=int, default=None,
                    help="ignore sf_dir's embeddings and drain a synthetic "
                         "deep lattice of ~this many fine cells (1 row/cell "
                         "+ rank-sized jitter clusters every 16th cell — "
                         "the 500k-cell regime of VERDICT r8 ask #4)")
    args = ap.parse_args()

    spark = (
        SparkSession.builder.master(f"local[{args.cpus}]")
        .config("spark.sql.shuffle.partitions", str(args.cpus))
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "16g")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    from pyvectorsearch_spark.index.grid import GridIndex
    from pyvectorsearch_spark.index.incremental import (
        load_rebalanced_index,
        read_pointer,
    )
    from pyvectorsearch_spark.operators.knn import knn_join
    from pyvectorsearch_spark.sources.tables import load_table
    from pyvectorsearch_spark.streaming.ingest import (
        COMPACT_BASE_ID,
        INGEST_BATCH_COL,
        stream_index_ingest,
    )

    if args.synth_cells:
        # deep lattice (the stress_grid_1e6 geometry): one point per fine
        # cell at spacing 8, 1e-4 jitter — drives the sidecar's state table
        # to ~synth_cells rows, the regime where the r7 full-republish
        # design cost O(cells) of driver work per batch
        side = int(args.synth_cells ** 0.5)
        emb = spark.range(side * side).select(
            F.col("id").alias("vec_id"),
            F.array(
                (F.col("id") % side).cast("double") * 8.0
                + (F.col("id") % 3).cast("double") * 1e-4,
                (F.col("id") / side).cast("long").cast("double") * 8.0,
            ).cast("array<float>").alias("p2"),
        )
    else:
        emb = (
            load_table(spark, args.sf_dir, "embeddings")
            .withColumn("p2", F.slice("embedding", 1, 2))
            .select("vec_id", "p2")
        )
    n_rows = emb.count()
    geom = GridIndex.build(
        emb, vec_col="p2", id_col="vec_id", target_occupancy=args.occ
    )
    n_cells = geom.stats_df.count()

    root = args.out_root or tempfile.mkdtemp(prefix="pvs_soak_")
    landing = os.path.join(root, "landing")
    if not os.path.isdir(landing):
        emb.repartition(args.n_batches).write.parquet(landing)
    out, ck, meta = (
        os.path.join(root, "out"), os.path.join(root, "ck"),
        os.path.join(root, "meta"),
    )
    for d in (out, ck, meta):
        shutil.rmtree(d, ignore_errors=True)

    # capture EVERY micro-batch duration (recentProgress caps at 100)
    from pyspark.sql.streaming import StreamingQueryListener

    durations: list[float] = []

    class _L(StreamingQueryListener):
        def onQueryStarted(self, event):
            pass

        def onQueryProgress(self, event):
            p = event.progress
            if p.numInputRows > 0 or p.batchId == 0:
                durations.append(p.durationMs.get("triggerExecution", 0) / 1e3)

        def onQueryIdle(self, event):
            pass

        def onQueryTerminated(self, event):
            pass

    listener = _L()
    spark.streams.addListener(listener)

    schema = spark.read.parquet(landing).schema
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(landing)
    )
    assign = lambda df: df.withColumn(  # noqa: E731
        "cell",
        GridIndex._cell_expr(
            "p2", geom.origin, geom.width, geom.fine_level,
            geom.dim, geom.rr, geom.ratio, clamp=False,
        ),
    )
    t0 = time.time()
    q = stream_index_ingest(
        stream, assign=assign, out_path=out, checkpoint=ck,
        layout=args.layout,
        compact_min_batches=args.compact,
        rebalance=dict(
            meta_path=meta, fine_level=geom.fine_level, dim=geom.dim,
            rr=geom.rr, ratio=geom.ratio, rank=geom.rank,
            **(
                {} if args.run_merge_k is None
                else {"run_merge_k": args.run_merge_k}
            ),
        ),
    )
    if not q.awaitTermination(3600):
        q.stop()
        raise TimeoutError("soak drain exceeded 3600 s")
    wall = time.time() - t0
    spark.streams.removeListener(listener)

    files = glob.glob(os.path.join(out, "*", "cell=*", "part-*")) + glob.glob(
        os.path.join(out, "*", "part-*")
    )
    batch_dirs = [
        d for d in glob.glob(os.path.join(out, f"{INGEST_BATCH_COL}=*"))
        if not d.endswith(f"={COMPACT_BASE_ID}")
    ]
    ptr = read_pointer(meta)
    versions = {
        kind: {
            "bases": len(
                [d for d in os.listdir(os.path.join(meta, kind))
                 if d.startswith("base_v")]
            ),
            "deltas": len(
                [d for d in os.listdir(os.path.join(meta, kind))
                 if d.startswith("b=")]
            ),
        }
        for kind in ("state", "mapping")
        if os.path.isdir(os.path.join(meta, kind))
    }

    idx = load_rebalanced_index(
        spark, data_path=out, meta_path=meta,
        origin=geom.origin, width=geom.width, dim=geom.dim,
        rank=geom.rank, rr=geom.rr, ratio=geom.ratio,
        fine_level=geom.fine_level, id_col="vec_id", vec_col="p2",
    )
    probes = emb.filter(F.col("vec_id") < args.probes).select(
        F.col("vec_id").alias("query_id"), F.col("p2").alias("qvec")
    )
    got = sorted(map(tuple, idx.knn(probes, 5).select(
        "query_id", "neighbor_id", "rank").collect()))
    exp = sorted(map(tuple, knn_join(
        emb, probes, 5, data_id="vec_id", data_vec="p2"
    ).select("query_id", "neighbor_id", "rank").collect()))

    ds = sorted(durations)
    head = durations[:5]
    tail = durations[-5:]
    print(json.dumps({
        "sf_dir": args.sf_dir,
        "n_rows": n_rows,
        "n_cells_fine_batch_build": n_cells,
        "n_batches_requested": args.n_batches,
        "n_batches_ran": len(durations),
        "layout": args.layout,
        "compact_min_batches": args.compact,
        "wall_sec": round(wall, 1),
        "batch_sec": {
            "first5_avg": round(sum(head) / max(len(head), 1), 2),
            "median": round(ds[len(ds) // 2], 2) if ds else None,
            "p90": round(ds[int(len(ds) * 0.9)], 2) if ds else None,
            "max": round(max(ds), 2) if ds else None,
            "last5_avg": round(sum(tail) / max(len(tail), 1), 2),
        },
        "data_files_end": len(files),
        "live_batch_dirs_end": len(batch_dirs),
        "meta_versions_live": versions,
        "pointer_batch_id": None if ptr is None else ptr["batch_id"],
        "search_matches_bruteforce": got == exp,
    }))
    spark.stop()


if __name__ == "__main__":
    main()
