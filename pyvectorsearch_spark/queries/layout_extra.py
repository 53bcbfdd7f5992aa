"""Data-layout queries (outside the driver's pinned 50-entry window; covered
by tests/test_oracle_parity.py against the same DuckDB oracles).

Operators exercised: `operators/layout.py::zorder_key` / `zorder_layout_stats`
(Morton-order multi-column clustering for zone-map data skipping) and
`operators/sampling.py::shuffle_deterministic` (reproducible corpus order for
training).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pyvectorsearch_spark.operators.layout import duckdb_zorder, zorder_layout_stats
from pyvectorsearch_spark.sources.tables import load_table, spread

Z_BITS = 10
Z_FILE_BITS = 4
Z_MOD = 1 << Z_BITS
SHUF_SALT = "shuffle"
SHUF_HEAD = 20


def q_layout_zorder_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Z-range file cuts over (l_partkey, l_suppkey) mod 1024: per-file row
    counts and per-dimension min/max — the zone-map spans a scan would
    prune with after a Z-order re-layout."""
    li = spread(load_table(spark, sf_dir, "lineitem")).select(
        (F.col("l_partkey") % Z_MOD).alias("x"),
        (F.col("l_suppkey") % Z_MOD).alias("y"),
    )
    return zorder_layout_stats(li, ["x", "y"], bits=Z_BITS, file_bits=Z_FILE_BITS)


_ZK = duckdb_zorder(["x", "y"], bits=Z_BITS)

ORACLE_LAYOUT_ZORDER = f"""
WITH d AS (
  SELECT l_partkey % {Z_MOD} AS x, l_suppkey % {Z_MOD} AS y FROM lineitem
),
z AS (SELECT x, y, {_ZK} AS zk FROM d)
SELECT (zk >> {2 * Z_BITS - Z_FILE_BITS})::INT AS file_id,
       count(*)::BIGINT AS n_rows,
       min(x)::BIGINT AS min_x, max(x)::BIGINT AS max_x,
       min(y)::BIGINT AS min_y, max(y)::BIGINT AS max_y
FROM z GROUP BY file_id ORDER BY file_id
"""


def q_sample_shuffle_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic global corpus shuffle (order by md5(salt || id) — the
    reproducible training-order primitive): the first 20 rows of the
    shuffled order pin the semantics."""
    from pyvectorsearch_spark.operators.sampling import shuffle_deterministic

    docs = spread(load_table(spark, sf_dir, "documents")).select("doc_id")
    return shuffle_deterministic(docs, id_col="doc_id", salt=SHUF_SALT).limit(
        SHUF_HEAD
    )


ORACLE_SHUFFLE_ORDER = f"""
SELECT doc_id, md5('{SHUF_SALT}' || doc_id::VARCHAR) AS skey
FROM documents ORDER BY skey, doc_id LIMIT {SHUF_HEAD}
"""


QUERIES = {
    "layout_zorder_stats": q_layout_zorder_stats,
    "sample_shuffle_order": q_sample_shuffle_order,
}
ORACLES = {
    "layout_zorder_stats": ORACLE_LAYOUT_ZORDER,
    "sample_shuffle_order": ORACLE_SHUFFLE_ORDER,
}
