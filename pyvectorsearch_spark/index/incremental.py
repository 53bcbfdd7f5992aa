"""Incremental K-instantiation for streamed grid-index ingest.

The reference rebalances on every ``insert`` (dissolve/instantiate cascade,
``/root/reference/include/pktree.hpp:587-929,1262-1355``). The Spark batch
build replays that cascade over the fine-cell COUNT table; streamed ingest
previously restored the invariant only when the periodic compactor re-ran
the batch build over the accumulated data — between compactions the index
served honest-but-uncoalesced fine cells (correct results, weaker pruning).

This module closes that gap with the observation that K-instantiation is a
PURE FUNCTION of the fine-cell count table: re-running the cascade after
every micro-batch costs O(#fine cells) — ~n/occupancy rows, independent of
data size — and the DATA NEVER MOVES. The on-disk layout stays append-only
fine-cell-partitioned parquet forever; the coalesced assignment lives in a
small sidecar mapping (fine cell → instantiated cell) that search joins at
read time. At 100 TB the per-batch cost is one merge of the batch's count
delta (batch-sized) plus the cascade over the count table (the same
DataFrame loop the batch build runs, measured at seconds for 10⁵ cells) —
versus a compactor that rewrites the corpus.

Exactly-once: ``foreachBatch`` can replay a batch after a failure; BOTH
sinks are idempotent under replay (the standard idempotent-sink pattern).
The meta update is guarded by a per-batch pointer marker, so a replayed
batch never double-counts its delta; the data write lands each batch under
its own ``ingest_batch=<id>`` directory in overwrite mode
(``streaming/ingest.py``), so a replayed batch overwrites its own rows
instead of appending duplicates — the served index stays row-for-row equal
to a batch build even across failures (ADVICE r7 closed the append-mode
gap). Each meta batch publishes a new immutable version directory and
flips a pointer file — readers always see a complete, consistent
(counts, mapping, stats) triple.
"""

from __future__ import annotations

import json
import os
import shutil

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pyvectorsearch_spark.index.grid import (
    CELL_SEP,
    STATS_SCHEMA,
    GridIndex,
    _kinstantiate_distributed,
    _kinstantiate_driver,
)

_POINTER = "LATEST.json"


def _meta_dirs(meta_path: str, version: int) -> dict[str, str]:
    v = f"v{version:09d}"
    return {
        "counts": os.path.join(meta_path, "fine_counts", v),
        "mapping": os.path.join(meta_path, "mapping", v),
        "stats": os.path.join(meta_path, "stats", v),
    }


def read_pointer(meta_path: str) -> dict | None:
    """Current published meta version, or None before the first batch."""
    p = os.path.join(meta_path, _POINTER)
    if not os.path.exists(p):
        return None
    with open(p) as fh:
        return json.load(fh)


def _publish_pointer(meta_path: str, version: int, batch_id: int) -> None:
    p = os.path.join(meta_path, _POINTER)
    tmp = p + ".tmp"
    with open(tmp, "w") as fh:
        json.dump({"version": version, "batch_id": batch_id}, fh)
    os.replace(tmp, p)  # atomic flip: readers never see a partial triple


def apply_batch_rebalance(
    spark: SparkSession,
    *,
    assigned_batch: DataFrame,
    batch_id: int,
    meta_path: str,
    fine_level: int,
    dim: int,
    rr: int,
    ratio: int,
    rank: int,
    cell_col: str = "cell",
    driver_cell_limit: int = 200_000,
) -> None:
    """Merge one micro-batch's fine-cell count delta into the sidecar and
    re-run the K-instantiation cascade — the per-batch incremental
    rebalance. Idempotent under batch replay (pointer records the last
    applied ``batch_id``; a replay is a no-op).

    The cascade runs on the driver when the count table is small (the same
    ``driver_cell_limit`` rule as ``GridIndex.build``) and falls back to
    the distributed DataFrame cascade above it — identical results either
    way (both are the batch build's own code paths)."""
    cur = read_pointer(meta_path)
    if cur is not None and cur["batch_id"] >= batch_id:
        return  # replayed batch: delta already applied
    version = 0 if cur is None else cur["version"] + 1
    dirs = _meta_dirs(meta_path, version)

    delta = (
        assigned_batch.groupBy(F.col(cell_col).alias("_fine"))
        .agg(F.count("*").alias("count"))
    )
    if cur is not None:
        old = spark.read.parquet(_meta_dirs(meta_path, cur["version"])["counts"])
        merged = (
            old.unionByName(delta)
            .groupBy("_fine")
            .agg(F.sum("count").alias("count"))
        )
    else:
        merged = delta
    merged.write.mode("overwrite").parquet(dirs["counts"])
    counts_df = spark.read.parquet(dirs["counts"])

    # Same auto rule as the batch build: bounded collect decides the path
    # and already supplies the driver cascade's input on the small side.
    head = counts_df.limit(driver_cell_limit + 1).collect()
    if len(head) <= driver_cell_limit:
        counts = {r["_fine"]: int(r["count"]) for r in head}
        assign, stats = _kinstantiate_driver(
            counts, fine_level=fine_level, dim=dim, rr=rr, ratio=ratio,
            rank=rank,
        )
        mapping_df = spark.createDataFrame(
            [(k, v) for k, v in assign.items()], "_fine string, cell string"
        )
        stats_df = spark.createDataFrame(
            [(cid, lvl, list(cds), cnt) for cid, lvl, cds, cnt in stats],
            STATS_SCHEMA,
        )
    else:
        checkpointed = counts_df.localCheckpoint(eager=True)
        mapping_df, stats_df = _kinstantiate_distributed(
            checkpointed, fine_level=fine_level, dim=dim, rr=rr,
            ratio=ratio, rank=rank,
        )
    mapping_df.write.mode("overwrite").parquet(dirs["mapping"])
    stats_df.write.mode("overwrite").parquet(dirs["stats"])
    _publish_pointer(meta_path, version, batch_id)

    # retire superseded versions (keep the published one only)
    if cur is not None:
        for d in _meta_dirs(meta_path, cur["version"]).values():
            shutil.rmtree(d, ignore_errors=True)


def load_rebalanced_index(
    spark: SparkSession,
    *,
    data_path: str,
    meta_path: str,
    origin: list[float],
    width: float,
    dim: int,
    rank: int,
    rr: int,
    ratio: int,
    fine_level: int,
    id_col: str,
    vec_col: str,
) -> GridIndex:
    """Assemble a searchable ``GridIndex`` from append-only fine-partitioned
    data plus the maintained sidecar: rows re-label via one broadcast-sized
    equi-join on the fine cell (no data movement — the join column is the
    partition directory name), stats come straight from the sidecar. The
    result is indistinguishable from a batch build over the same rows."""
    cur = read_pointer(meta_path)
    if cur is None:
        raise ValueError(f"no published rebalance meta under {meta_path}")
    dirs = _meta_dirs(meta_path, cur["version"])
    from pyvectorsearch_spark.streaming.ingest import INGEST_BATCH_COL

    mapping = spark.read.parquet(dirs["mapping"])
    stats_df = spark.read.parquet(dirs["stats"])
    rows = spark.read.parquet(data_path).drop(INGEST_BATCH_COL)
    relabeled = (
        rows.withColumnRenamed("cell", "_fine")
        .join(F.broadcast(mapping), "_fine")
        .drop("_fine")
    )
    return GridIndex(
        df=relabeled,
        stats_df=stats_df,
        origin=origin,
        width=width,
        dim=dim,
        rank=rank,
        rr=rr,
        ratio=ratio,
        fine_level=fine_level,
        id_col=id_col,
        vec_col=vec_col,
    )
