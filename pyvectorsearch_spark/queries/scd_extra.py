"""SCD2 dimension-merge query (outside the driver's pinned 50-entry window;
covered by tests/test_oracle_parity.py).

Operator exercised: `operators/scd.py::scd2_merge` (Kimball Type-2 merge).
The query synthesizes a deterministic "previous state + new snapshot" pair
from the customer table (closed history for every 7th key, an attribute
change for every 5th, a deletion for every 11th, a brand-new key for every
13th) and reports the merged table grouped by validity interval with a
row-content checksum — pinning exactly which keys ended up open, closed,
inserted, and passed through.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pyvectorsearch_spark.operators.scd import scd2_merge
from pyvectorsearch_spark.sources.tables import load_table, spread

T0, T1, T2 = 0, 500, 2000
NEW_KEY_OFFSET = 1_000_000


def _state_and_snapshot(spark: SparkSession, sf_dir: str) -> tuple[DataFrame, DataFrame]:
    cust = spread(load_table(spark, sf_dir, "customer")).select(
        F.col("c_custkey").alias("k"), F.col("c_mktsegment").alias("seg")
    )
    k = F.col("k")
    # previous SCD state: every 7th key has one closed epoch [0, 500) with a
    # planted old segment, then its open row starts at 500; others open at 0
    closed = cust.filter(k % 7 == 0).select(
        "k",
        F.lit("OLDSEG").alias("seg"),
        F.lit(T0).cast("bigint").alias("valid_from"),
        F.lit(T1).cast("bigint").alias("valid_to"),
    )
    open_rows = cust.select(
        "k",
        "seg",
        F.when(k % 7 == 0, F.lit(T1)).otherwise(F.lit(T0)).cast("bigint").alias(
            "valid_from"
        ),
        F.lit(None).cast("bigint").alias("valid_to"),
    )
    current = closed.unionByName(open_rows)
    # incoming snapshot: every 5th key changes segment, every 11th is gone,
    # every 13th also appears as a brand-new key
    snap_existing = cust.filter(k % 11 != 0).select(
        "k",
        F.when(k % 5 == 0, F.lit("CHANGED")).otherwise(F.col("seg")).alias("seg"),
    )
    snap_new = cust.filter(k % 13 == 0).select(
        (k + NEW_KEY_OFFSET).alias("k"), F.lit("NEWSEG").alias("seg")
    )
    return current, snap_existing.unionByName(snap_new)


def q_scd2_merge_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Type-2 merge of the synthesized snapshot at t=2000, grouped by
    validity interval with key/content checksums."""
    current, snapshot = _state_and_snapshot(spark, sf_dir)
    merged = scd2_merge(current, snapshot, key="k", tracked=["seg"], batch_ts=T2)
    chk = (
        F.conv(
            F.substring(
                F.md5(F.concat_ws("|", F.col("k").cast("string"), "seg")), 1, 12
            ),
            16,
            10,
        ).cast("bigint")
        % 1_000_000_007
    )
    return (
        merged.groupBy(
            "valid_from", F.coalesce("valid_to", F.lit(-1)).alias("valid_to")
        )
        .agg(
            F.count("*").cast("bigint").alias("n_rows"),
            F.count_distinct("k").cast("bigint").alias("n_keys"),
            F.sum(chk).cast("bigint").alias("content_checksum"),
        )
        .orderBy("valid_from", "valid_to")
    )


# Reusable CTE chain producing the merged SCD2 dimension as `merged`
# (k, seg, vf, vt) — shared by the merge-stats oracle and the as-of
# enrichment oracle so both replay the IDENTICAL merge.
_SCD2_MERGED_CTES = f"""
WITH cust AS (SELECT c_custkey AS k, c_mktsegment AS seg FROM customer),
closed AS (
  SELECT k, 'OLDSEG' AS seg, {T0}::BIGINT AS vf, {T1}::BIGINT AS vt
  FROM cust WHERE k % 7 = 0
),
open_rows AS (
  SELECT k, seg,
         (CASE WHEN k % 7 = 0 THEN {T1} ELSE {T0} END)::BIGINT AS vf,
         NULL::BIGINT AS vt
  FROM cust
),
current AS (SELECT * FROM closed UNION ALL SELECT * FROM open_rows),
snap AS (
  SELECT k, CASE WHEN k % 5 = 0 THEN 'CHANGED' ELSE seg END AS seg
  FROM cust WHERE k % 11 <> 0
  UNION ALL
  SELECT k + {NEW_KEY_OFFSET}, 'NEWSEG' FROM cust WHERE k % 13 = 0
),
cur_open AS (SELECT * FROM current WHERE vt IS NULL),
cur_closed AS (SELECT * FROM current WHERE vt IS NOT NULL),
j AS (
  SELECT coalesce(c.k, s.k) AS k, c.seg AS cseg, s.seg AS nseg, c.vf,
         (c.k IS NOT NULL) AS in_cur, (s.k IS NOT NULL) AS in_new
  FROM cur_open c FULL OUTER JOIN snap s ON c.k = s.k
),
merged AS (
  SELECT k, seg, vf, vt FROM cur_closed
  UNION ALL
  SELECT k, cseg, vf, NULL::BIGINT FROM j
  WHERE in_cur AND in_new AND cseg IS NOT DISTINCT FROM nseg
  UNION ALL
  SELECT k, cseg, vf, {T2}::BIGINT FROM j
  WHERE in_cur AND ((in_new AND cseg IS DISTINCT FROM nseg) OR NOT in_new)
  UNION ALL
  SELECT k, nseg, {T2}::BIGINT, NULL::BIGINT FROM j
  WHERE in_new AND (NOT in_cur OR cseg IS DISTINCT FROM nseg)
)
"""

ORACLE_SCD2 = f"""
{_SCD2_MERGED_CTES}
SELECT vf AS valid_from, coalesce(vt, -1) AS valid_to,
       count(*)::BIGINT AS n_rows,
       count(DISTINCT k)::BIGINT AS n_keys,
       sum(('0x' || substr(md5(k::VARCHAR || '|' || seg), 1, 12))::BIGINT
           % 1000000007)::BIGINT AS content_checksum
FROM merged
GROUP BY vf, vt ORDER BY valid_from, valid_to
"""


def q_snapshot_diff_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CDC between the synthesized old/new customer snapshots: per
    change-type counts plus a key checksum pinning exactly which keys
    changed."""
    from pyvectorsearch_spark.operators.scd import snapshot_diff

    cust = spread(load_table(spark, sf_dir, "customer")).select(
        F.col("c_custkey").alias("k"), F.col("c_mktsegment").alias("seg")
    )
    k = F.col("k")
    new = cust.filter(k % 11 != 0).select(
        "k", F.when(k % 5 == 0, F.lit("CHANGED")).otherwise(F.col("seg")).alias("seg")
    ).unionByName(
        cust.filter(k % 13 == 0).select(
            (k + NEW_KEY_OFFSET).alias("k"), F.lit("NEWSEG").alias("seg")
        )
    )
    diff = snapshot_diff(cust, new, key="k", tracked=["seg"])
    chk = (
        F.conv(F.substring(F.md5(F.col("k").cast("string")), 1, 12), 16, 10)
        .cast("bigint")
        % 1_000_000_007
    )
    return (
        diff.groupBy("change_type")
        .agg(
            F.count("*").cast("bigint").alias("n"),
            F.sum(chk).cast("bigint").alias("key_checksum"),
        )
        .orderBy("change_type")
    )


ORACLE_SNAPSHOT_DIFF = f"""
WITH cust AS (SELECT c_custkey AS k, c_mktsegment AS seg FROM customer),
neww AS (
  SELECT k, CASE WHEN k % 5 = 0 THEN 'CHANGED' ELSE seg END AS seg
  FROM cust WHERE k % 11 <> 0
  UNION ALL
  SELECT k + {NEW_KEY_OFFSET}, 'NEWSEG' FROM cust WHERE k % 13 = 0
),
j AS (
  SELECT coalesce(o.k, n.k) AS k, o.seg AS oseg, n.seg AS nseg,
         (o.k IS NOT NULL) AS in_o, (n.k IS NOT NULL) AS in_n
  FROM cust o FULL OUTER JOIN neww n ON o.k = n.k
),
d AS (
  SELECT k,
         CASE WHEN in_o AND NOT in_n THEN 'removed'
              WHEN in_n AND NOT in_o THEN 'added'
              WHEN oseg IS DISTINCT FROM nseg THEN 'changed'
         END AS change_type
  FROM j
)
SELECT change_type, count(*)::BIGINT AS n,
       sum(('0x' || substr(md5(k::VARCHAR), 1, 12))::BIGINT
           % 1000000007)::BIGINT AS key_checksum
FROM d WHERE change_type IS NOT NULL
GROUP BY change_type ORDER BY change_type
"""


QUERIES = {
    "scd2_merge_stats": q_scd2_merge_stats,
    "snapshot_diff_stats": q_snapshot_diff_stats,
}
ORACLES = {
    "scd2_merge_stats": ORACLE_SCD2,
    "snapshot_diff_stats": ORACLE_SNAPSHOT_DIFF,
}


# --- as-of enrichment against the SCD2 dimension -------------------------------

ASOF_TS_MOD = 2500


def q_scd2_asof_enrich(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temporal dimension lookup — the reason SCD2 exists: each fact joins
    to the customer-segment VERSION valid at its event time (vf ≤ ts < vt,
    open rows unbounded), so facts before a segment change enrich with the
    OLD segment and facts after with the new. Facts are orders with a
    deterministic event time (o_orderkey mod 2500, spanning all three
    version epochs); the dimension is the same merged SCD2 table
    `scd2_merge_stats` pins, so the two queries share one truth.

    Determinism: integer times, one interval match per fact by
    construction (version intervals partition each key's timeline — the
    n_facts total proves no fact matched twice or vanished).

    Scale: an equi-join on the customer key with a residual interval
    filter — versions per key are bounded (here ≤ 3), so this is the
    standard bounded-fan-out dimension lookup, broadcast-able when the
    dimension fits."""
    current, snapshot = _state_and_snapshot(spark, sf_dir)
    dim = scd2_merge(current, snapshot, key="k", tracked=["seg"], batch_ts=T2)
    facts = spread(load_table(spark, sf_dir, "orders")).select(
        F.col("o_custkey").alias("k"),
        (F.col("o_orderkey") % ASOF_TS_MOD).cast("bigint").alias("_ts"),
    )
    j = facts.join(
        dim,
        (facts.k == dim.k)
        & (F.col("_ts") >= F.col("valid_from"))
        & (F.col("valid_to").isNull() | (F.col("_ts") < F.col("valid_to"))),
        "left",
    )
    return (
        j.groupBy(F.coalesce("seg", F.lit("UNMATCHED")).alias("segment"))
        .agg(
            F.count("*").cast("bigint").alias("n_facts"),
            F.countDistinct(facts.k).cast("bigint").alias("n_keys"),
            F.min("_ts").cast("bigint").alias("min_ts"),
            F.max("_ts").cast("bigint").alias("max_ts"),
        )
        .orderBy("segment")
    )


ORACLE_SCD2_ASOF = f"""
{_SCD2_MERGED_CTES},
facts AS (
  SELECT o_custkey AS k, (o_orderkey % {ASOF_TS_MOD})::BIGINT AS ts
  FROM orders
),
jf AS (
  SELECT f.k, f.ts, m.seg
  FROM facts f LEFT JOIN merged m
    ON f.k = m.k AND f.ts >= m.vf AND (m.vt IS NULL OR f.ts < m.vt)
)
SELECT coalesce(seg, 'UNMATCHED') AS segment, count(*)::BIGINT AS n_facts,
       count(DISTINCT k)::BIGINT AS n_keys,
       min(ts)::BIGINT AS min_ts, max(ts)::BIGINT AS max_ts
FROM jf GROUP BY 1 ORDER BY segment
"""

QUERIES.update({"scd2_asof_enrich": q_scd2_asof_enrich})
ORACLES.update({"scd2_asof_enrich": ORACLE_SCD2_ASOF})
