"""Build-or-load caching for persistent index artifacts.

An index is a durable dataset, not a per-query temporary: build it once,
write it (cell-partitioned parquet + descriptor), and let every subsequent
query load it — the same lifecycle a 100 TB deployment has, where the index
build is a scheduled batch job and queries only ever read. (The reference
has no index persistence at all — its tree dies with the process,
``/root/reference/include/pktree.hpp:1211-1214`` — so this surface is
Spark-native, not parity.)

Writes are atomic: build into a temp directory next to the target, then
``os.rename`` into place; a concurrent builder that loses the race just
loads the winner's artifact. Cache keys are caller-chosen names that must
encode every build parameter + the source dataset identity; the default
root lives under the system temp dir and is versioned so format changes
never read stale layouts.
"""

from __future__ import annotations

import os
import shutil
import tempfile
import uuid
from typing import Callable, TypeVar

from pyspark.sql import SparkSession

FORMAT_VERSION = 2

T = TypeVar("T")


def cache_root() -> str:
    return os.environ.get(
        "PYVECTORSEARCH_INDEX_CACHE",
        os.path.join(tempfile.gettempdir(), f"pyvectorsearch_index_v{FORMAT_VERSION}"),
    )


def cache_path(name: str) -> str:
    return os.path.join(cache_root(), name)


def read_small_sidecar(path: str, columns: list[str] | None = None):
    """Driver-side pyarrow read of a SMALL index sidecar (meta/centroids/
    codebook tables — tens of rows to a few thousand), returning a list of
    plain-dict rows.

    Index ``load()`` paths used to fetch these with ``spark.read.parquet(...)
    .collect()`` / ``.first()`` — one or two full Spark jobs (scheduler +
    task launch + Python round trip) per *query invocation* just to move a
    handful of rows to the driver (measured 0.2-0.4 s per load on local[32],
    r10 optimization round). A local columnar read is microseconds and
    byte-identical. Returns ``None`` when the path is not a local directory
    (object-store / HDFS deployments) so callers can keep the Spark read as
    the fallback; the big ``data`` table is NEVER read this way.
    """
    local = path[len("file:"):] if path.startswith("file:") else path
    if not os.path.isdir(local):
        return None
    try:
        import pyarrow.parquet as pq

        return pq.read_table(local, columns=columns).to_pylist()
    except Exception:
        return None


def _local_parquet_files(path: str) -> list[str] | None:
    local = path[len("file:"):] if path.startswith("file:") else path
    if not os.path.isdir(local):
        return None
    files = sorted(
        os.path.join(local, f)
        for f in os.listdir(local)
        if f.endswith(".parquet") and not f.startswith(("_", "."))
    )
    return files or None


def sidecar_num_rows(path: str) -> int | None:
    """Row count of a local parquet directory from FOOTER METADATA only —
    no data pages are read, so this is safe on arbitrarily large tables.
    None when the path is not a local parquet directory."""
    files = _local_parquet_files(path)
    if files is None:
        return None
    try:
        import pyarrow.parquet as pq

        return sum(pq.ParquetFile(f).metadata.num_rows for f in files)
    except Exception:
        return None


def read_sidecar_head(path: str, columns: list[str] | None = None):
    """First row of a local parquet directory as a plain dict, reading one
    row group of one file — the bounded replacement for ``df.first()`` on
    tables whose every row carries the same descriptor columns. None when
    unavailable (caller falls back to the Spark read)."""
    files = _local_parquet_files(path)
    if files is None:
        return None
    try:
        import pyarrow.parquet as pq

        for f in files:
            pf = pq.ParquetFile(f)
            if pf.metadata.num_rows == 0:
                continue
            rows = pf.read_row_group(0, columns=columns).slice(0, 1).to_pylist()
            if rows:
                return rows[0]
        return None
    except Exception:
        return None


def build_or_load(
    spark: SparkSession,
    name: str,
    *,
    load: Callable[[SparkSession, str], T],
    build: Callable[[], T],
    write: Callable[[T, str], None] | None = None,
) -> T:
    """Return ``load(spark, path)`` for the cached artifact ``name``,
    building (and atomically publishing) it first on a cache miss.

    ``write`` defaults to ``lambda idx, path: idx.write(path)``.
    """
    path = cache_path(name)
    if os.path.isdir(path):
        return load(spark, path)
    idx = build()
    os.makedirs(cache_root(), exist_ok=True)
    tmp = f"{path}.tmp-{uuid.uuid4().hex[:8]}"
    try:
        (write or (lambda i, p: i.write(p)))(idx, tmp)
        os.rename(tmp, path)
    except OSError:
        # lost a publish race (or cannot rename): drop our copy, use winner's
        shutil.rmtree(tmp, ignore_errors=True)
        if not os.path.isdir(path):
            raise
    return load(spark, path)
