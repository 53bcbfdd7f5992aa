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
