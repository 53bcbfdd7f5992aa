"""Audit / migration-parity queries (registered OUTSIDE the driver's pinned
50-entry window; covered by tests/test_oracle_parity.py).

Order-independent table checksums: the "did the 100 TB copy/migration/
engine-swap preserve every row?" primitive. Each row hashes to a 52-bit
md5 value (the same engine-exact hash family as the KMV/CMS sketches) and
the table checksum is the XOR of row hashes — commutative and overflow-free
at any row count (a SUM would overflow bigint beyond ~2^11 rows of 52-bit
hashes), so it needs no sort, distributes as a map-side-combined aggregate,
and two engines (or two clusters) can compare fingerprints without moving
data. A flipped byte in any row changes the checksum; the classic XOR blind
spot (a row duplicated an even number of times) is covered by the row count
that rides alongside.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from pyvectorsearch_spark.operators.sketches import HEX_DIGITS
from pyvectorsearch_spark.sources.tables import load_table, spread


def _row_hash(*cols: Column) -> Column:
    h = F.md5(F.concat_ws("\x1f", *cols))
    return F.conv(F.substring(h, 1, HEX_DIGITS), 16, 10).cast("bigint")


def table_checksum(df: DataFrame, *, cols: list[str], label: str) -> DataFrame:
    """(table, n_rows, checksum): sum of per-row 52-bit md5 hashes over the
    given columns cast to string and joined with a 0x1f separator, combined
    with bit_xor. The only shuffle is the 1-row final combine."""
    rh = _row_hash(*[F.col(c).cast("string") for c in cols])
    return df.select(rh.alias("_rh")).agg(
        F.lit(label).alias("table"),
        F.count("*").cast("bigint").alias("n_rows"),
        F.expr("bit_xor(_rh)").cast("bigint").alias("checksum"),
    ).select("table", "n_rows", "checksum")


def _duck_row_hash(cols: list[str]) -> str:
    joined = ", ".join(f"CAST({c} AS VARCHAR)" for c in cols)
    return (
        f"('0x' || substr(md5(concat_ws(chr(31), {joined})), 1, "
        f"{HEX_DIGITS}))::BIGINT"
    )


_TABLES = {
    "orders": ["o_orderkey", "o_custkey", "o_orderstatus", "o_orderpriority"],
    "customer": ["c_custkey", "c_name", "c_nationkey", "c_mktsegment"],
    "nation": ["n_nationkey", "n_name", "n_regionkey"],
}


def q_audit_checksums(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order-independent XOR row-hash checksums of three tables (stable-typed
    key/category columns — float columns are excluded by design: a
    checksum over value-rounded floats belongs to the producer contract,
    not the audit)."""
    outs = []
    for name, cols in _TABLES.items():
        df = spread(load_table(spark, sf_dir, name))
        outs.append(table_checksum(df, cols=cols, label=name))
    out = outs[0]
    for o in outs[1:]:
        out = out.unionByName(o)
    return out.orderBy("table")


ORACLE_AUDIT_CHECKSUMS = " UNION ALL ".join(
    f"""
SELECT '{name}' AS "table", count(*)::BIGINT AS n_rows,
       bit_xor({_duck_row_hash(cols)})::BIGINT AS checksum
FROM {name}"""
    for name, cols in _TABLES.items()
)


QUERIES = {"audit_checksums": q_audit_checksums}
ORACLES = {"audit_checksums": ORACLE_AUDIT_CHECKSUMS}


def q_delete_propagation_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Right-to-erasure / retention delete propagation: a deterministic
    delete set of customers (custkey % 10 = 7 — the "erasure request"
    stand-in) cascades through the star schema with anti-joins — customers
    drop directly, their orders drop by key, and the orders' line items
    drop transitively. One row per table: kept vs dropped counts plus a
    kept-key checksum, the audit a compliance pipeline has to produce.

    Scale shape: each fact table anti-joins ONE ancestor key set (the
    orders key set is itself pairs-of-keys-sized, not fact-sized, and
    AQE broadcasts the small side); no collects, no windows."""
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    doomed_c = cust.filter(F.col("c_custkey") % 10 == 7).select(
        F.col("c_custkey").alias("k")
    )
    kept_c = cust.join(doomed_c, cust["c_custkey"] == doomed_c["k"], "left_anti")
    kept_o = orders.join(
        doomed_c, orders["o_custkey"] == doomed_c["k"], "left_anti"
    )
    doomed_o = orders.join(
        doomed_c, orders["o_custkey"] == doomed_c["k"], "left_semi"
    ).select(F.col("o_orderkey").alias("ok"))
    kept_l = li.join(doomed_o, li["l_orderkey"] == doomed_o["ok"], "left_anti")

    def _row(name, total_df, kept_df, key):
        t = total_df.agg(F.count("*").cast("bigint").alias("n_total"))
        k = kept_df.agg(
            F.count("*").cast("bigint").alias("n_kept"),
            F.sum(F.col(key)).cast("bigint").alias("kept_key_sum"),
        )
        return t.crossJoin(k).select(
            F.lit(name).alias("tbl"),
            "n_total",
            "n_kept",
            (F.col("n_total") - F.col("n_kept")).alias("n_dropped"),
            "kept_key_sum",
        )

    return (
        _row("customer", cust, kept_c, "c_custkey")
        .unionByName(_row("orders", orders, kept_o, "o_orderkey"))
        .unionByName(_row("lineitem", li, kept_l, "l_orderkey"))
        .orderBy("tbl")
    )


ORACLE_DELETE_PROPAGATION = """
WITH doomed_c AS (SELECT c_custkey AS k FROM customer WHERE c_custkey % 10 = 7),
doomed_o AS (SELECT o_orderkey AS ok FROM orders WHERE o_custkey IN (SELECT k FROM doomed_c)),
rows AS (
  SELECT 'customer' AS tbl,
         (SELECT count(*) FROM customer)::BIGINT AS n_total,
         count(*)::BIGINT AS n_kept,
         sum(c_custkey)::BIGINT AS kept_key_sum
  FROM customer WHERE c_custkey NOT IN (SELECT k FROM doomed_c)
  UNION ALL
  SELECT 'orders',
         (SELECT count(*) FROM orders)::BIGINT,
         count(*)::BIGINT,
         sum(o_orderkey)::BIGINT
  FROM orders WHERE o_custkey NOT IN (SELECT k FROM doomed_c)
  UNION ALL
  SELECT 'lineitem',
         (SELECT count(*) FROM lineitem)::BIGINT,
         count(*)::BIGINT,
         sum(l_orderkey)::BIGINT
  FROM lineitem WHERE l_orderkey NOT IN (SELECT ok FROM doomed_o)
)
SELECT tbl, n_total, n_kept, (n_total - n_kept)::BIGINT AS n_dropped, kept_key_sum
FROM rows ORDER BY tbl
"""

QUERIES.update({"delete_propagation_stats": q_delete_propagation_stats})
ORACLES.update({"delete_propagation_stats": ORACLE_DELETE_PROPAGATION})
