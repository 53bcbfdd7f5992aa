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


# --- rendezvous (HRW) shard assignment ---------------------------------------

HRW_NODES = 8
HRW_SALT = "hrw-v1"


def q_layout_rendezvous(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rendezvous (highest-random-weight) shard assignment balance report:
    every document goes to the node whose md5(salt || node || id) score is
    highest (Thaler–Ravishankar 1996) — the consistent-placement scheme
    where removing one node remaps ONLY that node's keys (vs mod-N, which
    reshuffles everything). The report proves the placement is balanced:
    per-node key counts, share, and byte load.

    Determinism: the score is the same md5→48-bit integer construction the
    sampling family uses — a pure function of (salt, node, id) — and the
    argmax tie-breaks on the lowest node id, so the assignment is
    engine-exact and reproducible forever.

    Scale: the node axis is a tiny broadcast fan-out (N rows per key
    map-side, no shuffle until the per-node rollup); at 100 TB this is the
    shard router you'd run per batch — no global state, no coordination,
    and adding node N+1 moves exactly ~1/(N+1) of keys."""
    from pyvectorsearch_spark.operators.layout import hrw_assign

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "n_chars")
    assigned = hrw_assign(docs, id_col="doc_id", n_nodes=HRW_NODES, salt=HRW_SALT)
    tot = docs.agg(F.count("*").cast("bigint").alias("_n")).select("_n")
    return (
        assigned.groupBy("node")
        .agg(
            F.count("*").cast("bigint").alias("n_keys"),
            F.sum("n_chars").cast("bigint").alias("bytes_load"),
        )
        .crossJoin(F.broadcast(tot))
        .select(
            "node",
            "n_keys",
            F.round(F.col("n_keys") / F.col("_n").cast("double"), 6).alias(
                "share_r"
            ),
            "bytes_load",
        )
        .orderBy("node")
    )


ORACLE_LAYOUT_RENDEZVOUS = f"""
WITH nodes AS (SELECT unnest(range({HRW_NODES}))::INT AS node),
scored AS (
  SELECT d.doc_id, d.n_chars, n.node,
         ('0x' || substr(md5('{HRW_SALT}#' || n.node::VARCHAR || '#'
                             || d.doc_id::VARCHAR), 1, 12))::BIGINT AS s
  FROM documents d CROSS JOIN nodes n
),
assigned AS (
  SELECT doc_id, n_chars, node,
         row_number() OVER (PARTITION BY doc_id
                            ORDER BY s DESC, node ASC) AS rk
  FROM scored
),
tot AS (SELECT count(*)::BIGINT AS n FROM documents)
SELECT a.node, count(*)::BIGINT AS n_keys,
       round(count(*) / CAST(t.n AS DOUBLE), 6) AS share_r,
       sum(a.n_chars)::BIGINT AS bytes_load
FROM assigned a CROSS JOIN tot t
WHERE a.rk = 1
GROUP BY a.node, t.n ORDER BY a.node
"""

QUERIES.update({"layout_rendezvous": q_layout_rendezvous})
ORACLES.update({"layout_rendezvous": ORACLE_LAYOUT_RENDEZVOUS})
