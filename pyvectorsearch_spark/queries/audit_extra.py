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


# --- schema discovery: foreign-key / inclusion-dependency profiling --------

FK_CANDIDATES = [
    # (child table, child col, parent table, parent col)
    ("orders", "o_custkey", "customer", "c_custkey"),
    ("lineitem", "l_orderkey", "orders", "o_orderkey"),
    ("lineitem", "l_partkey", "part", "p_partkey"),
    ("lineitem", "l_suppkey", "supplier", "s_suppkey"),
    ("customer", "c_nationkey", "nation", "n_nationkey"),
    ("events", "user_id", "customer", "c_custkey"),  # expected NON-fk probe
]
FK_THRESHOLD = 0.99


def q_fk_discovery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inclusion-dependency (foreign-key) discovery — the schema-inference
    profiler data-lake catalogs run: for each candidate (child.col ->
    parent.col), the containment ratio |distinct(child) ∩ distinct(parent)|
    / |distinct(child)| and an is_fk verdict at 0.99. The five real TPC-H
    FKs confirm; the events.user_id -> customer probe is the planted
    negative. Scale shape: each side reduces to its distinct key set
    map-side (the same exact-distinct reduction as the sketches); the
    containment join moves key sets, never rows."""
    parts = []
    for ct, cc, pt, pc in FK_CANDIDATES:
        child = (
            spread(load_table(spark, sf_dir, ct))
            .select(F.col(cc).cast("bigint").alias("k"))
            .filter(F.col("k").isNotNull())
            .distinct()
        )
        parent = (
            load_table(spark, sf_dir, pt)
            .select(F.col(pc).cast("bigint").alias("k"))
            .distinct()
        )
        matched = child.join(parent, "k", "left_semi")
        n_child = child.agg(F.count("*").cast("bigint").alias("n")).select(
            F.lit(f"{ct}.{cc}->{pt}.{pc}").alias("candidate"),
            F.col("n").alias("n_child_keys"),
        )
        n_match = matched.agg(F.count("*").cast("bigint").alias("n_matched"))
        parts.append(n_child.crossJoin(n_match))
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    ratio = F.round(F.col("n_matched") / F.col("n_child_keys"), 6)
    return out.select(
        "candidate",
        "n_child_keys",
        "n_matched",
        ratio.alias("containment_r"),
        (ratio >= FK_THRESHOLD).alias("is_fk"),
    ).orderBy("candidate")


def _fk_oracle() -> str:
    sels = []
    for ct, cc, pt, pc in FK_CANDIDATES:
        sels.append(f"""
SELECT '{ct}.{cc}->{pt}.{pc}' AS candidate,
       (SELECT count(DISTINCT {cc}) FROM {ct} WHERE {cc} IS NOT NULL)::BIGINT
         AS n_child_keys,
       (SELECT count(*) FROM
          (SELECT DISTINCT {cc} AS k FROM {ct} WHERE {cc} IS NOT NULL) c
          WHERE k IN (SELECT {pc} FROM {pt}))::BIGINT AS n_matched""")
    u = "\nUNION ALL".join(sels)
    return f"""
WITH base AS ({u})
SELECT candidate, n_child_keys, n_matched,
       round(n_matched / CAST(n_child_keys AS DOUBLE), 6) AS containment_r,
       (round(n_matched / CAST(n_child_keys AS DOUBLE), 6) >= {FK_THRESHOLD})
         AS is_fk
FROM base ORDER BY candidate
"""


ORACLE_FK_DISCOVERY = _fk_oracle()


# --- functional-dependency check ------------------------------------------

FD_CANDIDATES = [
    # (table, determinant, dependent)
    ("orders", "o_orderkey", "o_custkey"),       # key -> anything: holds
    ("customer", "c_custkey", "c_nationkey"),    # key -> attr: holds
    ("lineitem", "l_orderkey", "l_suppkey"),     # multi-line orders: violated
    ("events", "user_id", "event_type"),         # users do many things: violated
]


def q_fd_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Functional-dependency profiling (A -> B): for each candidate, the
    number of determinant groups, the groups carrying >1 distinct dependent
    (violations), and the holds verdict — the normalization /
    data-contract check. One map-side-combined distinct + one groups-sized
    aggregate per candidate; no joins."""
    parts = []
    for t, a, b in FD_CANDIDATES:
        # NULL dependents are excluded so the distinct-count semantics match
        # SQL COUNT(DISTINCT b) (which ignores NULLs) — a {x, NULL} group is
        # one distinct dependent, not a violation
        g = (
            spread(load_table(spark, sf_dir, t))
            .select(F.col(a).alias("_a"), F.col(b).alias("_b"))
            .filter(F.col("_b").isNotNull())
            .distinct()
            .groupBy("_a")
            .agg(F.count("*").alias("_nb"))
        )
        parts.append(
            g.agg(
                F.lit(f"{t}: {a}->{b}").alias("candidate"),
                F.count("*").cast("bigint").alias("n_groups"),
                F.sum((F.col("_nb") > 1).cast("bigint"))
                .cast("bigint")
                .alias("n_violating_groups"),
            )
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out.select(
        "candidate",
        "n_groups",
        "n_violating_groups",
        (F.col("n_violating_groups") == 0).alias("holds"),
    ).orderBy("candidate")


def _fd_oracle() -> str:
    sels = []
    for t, a, b in FD_CANDIDATES:
        sels.append(f"""
SELECT '{t}: {a}->{b}' AS candidate,
       count(*)::BIGINT AS n_groups,
       sum(CASE WHEN nb > 1 THEN 1 ELSE 0 END)::BIGINT AS n_violating_groups
FROM (SELECT {a} AS a, count(DISTINCT {b}) AS nb FROM {t} GROUP BY {a})""")
    u = "\nUNION ALL".join(sels)
    return f"""
WITH base AS ({u})
SELECT candidate, n_groups, n_violating_groups,
       (n_violating_groups = 0) AS holds
FROM base ORDER BY candidate
"""


ORACLE_FD_CHECK = _fd_oracle()


# --- Benford first-digit audit --------------------------------------------

import math as _math

BENFORD = {d: round(_math.log10(1 + 1 / d), 6) for d in range(1, 10)}


def q_audit_benford(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benford's-law first-digit audit over order totals — the classic
    fabricated-numbers screen for financial columns: observed first-digit
    shares vs log10(1 + 1/d), with per-digit absolute deviation. One
    map-side-combined 9-row aggregate; the verdict (total variation
    distance) is a trivial fold over the result. Shares and deviations are
    rounded so the report is engine-exact."""
    o = spread(load_table(spark, sf_dir, "orders"))
    d1 = F.substring(
        F.round(F.col("o_totalprice") * 100).cast("bigint").cast("string"), 1, 1
    ).cast("int")
    counts = (
        o.filter(F.col("o_totalprice") > 0)
        .select(d1.alias("digit"))
        .groupBy("digit")
        .agg(F.count("*").cast("bigint").alias("n"))
    )
    tot = counts.agg(F.sum("n").cast("bigint").alias("_t"))
    exp = F.create_map(
        *[x for d, v in BENFORD.items() for x in (F.lit(d), F.lit(v))]
    )
    share = F.round(F.col("n") / F.col("_t"), 6)
    return (
        counts.crossJoin(F.broadcast(tot))
        .select(
            "digit",
            "n",
            share.alias("share_r"),
            F.element_at(exp, F.col("digit")).alias("benford_r"),
            F.round(F.abs(share - F.element_at(exp, F.col("digit"))), 6).alias(
                "abs_dev_r"
            ),
        )
        .orderBy("digit")
    )


_BENFORD_SQL_CASE = "CASE digit WHEN 1 THEN 0.30103 WHEN 2 THEN 0.176091 WHEN 3 THEN 0.124939 WHEN 4 THEN 0.09691 WHEN 5 THEN 0.079181 WHEN 6 THEN 0.066947 WHEN 7 THEN 0.057992 WHEN 8 THEN 0.051153 WHEN 9 THEN 0.045757 END"

ORACLE_AUDIT_BENFORD = f"""
WITH c AS (
  SELECT CAST(substr(CAST(CAST(round(o_totalprice * 100) AS BIGINT) AS VARCHAR),
              1, 1) AS INT) AS digit,
         count(*)::BIGINT AS n
  FROM orders WHERE o_totalprice > 0 GROUP BY digit
),
t AS (SELECT sum(n)::BIGINT AS tt FROM c)
SELECT digit, n, round(n / CAST(tt AS DOUBLE), 6) AS share_r,
       CAST({_BENFORD_SQL_CASE} AS DOUBLE) AS benford_r,
       round(abs(round(n / CAST(tt AS DOUBLE), 6)
                 - CAST({_BENFORD_SQL_CASE} AS DOUBLE)), 6) AS abs_dev_r
FROM c CROSS JOIN t ORDER BY digit
"""

QUERIES.update({
    "fk_discovery": q_fk_discovery,
    "fd_check": q_fd_check,
    "audit_benford": q_audit_benford,
})
ORACLES.update({
    "fk_discovery": ORACLE_FK_DISCOVERY,
    "fd_check": ORACLE_FD_CHECK,
    "audit_benford": ORACLE_AUDIT_BENFORD,
})


# --- privacy: k-anonymity / l-diversity profile ----------------------------

KANON_K = 5
KANON_L = 2


def q_privacy_k_anonymity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-anonymity / l-diversity profile (Sweeney 2002 / Machanavajjhala
    2007) over the customer quasi-identifier (nation, market segment,
    account-balance band): per QI group size, distinct sensitive values
    (the balance itself as the sensitive attribute), and the k=5 / l=2
    verdicts — the re-identification-risk screen run before releasing any
    joined extract. One map-side-combined rollup; the report is
    QI-cardinality-sized."""
    c = spread(load_table(spark, sf_dir, "customer"))
    band = (F.floor(F.col("c_acctbal") / 1000.0)).cast("bigint")
    g = (
        c.select(
            F.col("c_nationkey").alias("nation"),
            F.col("c_mktsegment").alias("segment"),
            band.alias("bal_band"),
            F.round(F.col("c_acctbal") * 100).cast("bigint").alias("_sv"),
        )
        .groupBy("nation", "segment", "bal_band")
        .agg(
            F.count("*").cast("bigint").alias("group_size"),
            F.countDistinct("_sv").cast("bigint").alias("n_sensitive"),
        )
    )
    return g.select(
        "nation",
        "segment",
        "bal_band",
        "group_size",
        "n_sensitive",
        (F.col("group_size") >= KANON_K).alias("k_anonymous"),
        (F.col("n_sensitive") >= KANON_L).alias("l_diverse"),
    ).orderBy("nation", "segment", "bal_band")


ORACLE_PRIVACY_K_ANONYMITY = f"""
WITH g AS (
  SELECT c_nationkey AS nation, c_mktsegment AS segment,
         CAST(floor(c_acctbal / 1000.0) AS BIGINT) AS bal_band,
         count(*)::BIGINT AS group_size,
         count(DISTINCT CAST(round(c_acctbal * 100) AS BIGINT))::BIGINT
           AS n_sensitive
  FROM customer GROUP BY nation, segment, bal_band
)
SELECT nation, segment, bal_band, group_size, n_sensitive,
       (group_size >= {KANON_K}) AS k_anonymous,
       (n_sensitive >= {KANON_L}) AS l_diverse
FROM g ORDER BY nation, segment, bal_band
"""

QUERIES.update({"privacy_k_anonymity": q_privacy_k_anonymity})
ORACLES.update({"privacy_k_anonymity": ORACLE_PRIVACY_K_ANONYMITY})


# --- data repair: group-mean imputation ------------------------------------


def q_repair_impute(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Missing-value repair by group-mean imputation: event values are
    deterministically nulled (event_id % 7 == 0 — the planted-defect
    pattern) then imputed with their event type's mean over the SURVIVING
    values (integer-cents sums ⇒ the mean is an exact rational, rounded
    once). Per type: row/null counts, the imputed fill value, and the
    post-repair total — repair provably changed only what it claimed.
    One map-side rollup computes the fill values; the repair itself is a
    types-sized broadcast join onto the scan."""
    ev = spread(load_table(spark, sf_dir, "events"))
    holed = ev.select(
        "event_id",
        "event_type",
        F.when(F.col("event_id") % 7 == 0, F.lit(None))
        .otherwise(F.round(F.col("value") * 100).cast("bigint"))
        .alias("_vc"),
    )
    fill = holed.groupBy("event_type").agg(
        F.count("*").cast("bigint").alias("n_rows"),
        F.sum(F.col("_vc").isNull().cast("bigint")).cast("bigint").alias("n_nulls"),
        F.round(F.sum("_vc") / F.count("_vc"), 2).alias("fill_r"),
    )
    repaired = (
        holed.join(F.broadcast(fill), "event_type")
        .select(
            "event_type",
            F.coalesce(
                F.col("_vc").cast("double") / 100.0, F.col("fill_r") / 100.0
            ).alias("_v"),
        )
    )
    total = repaired.groupBy("event_type").agg(
        F.round(F.sum(F.round(F.col("_v"), 6)), 2).alias("repaired_total_r")
    )
    return (
        fill.join(total, "event_type")
        .select(
            "event_type",
            "n_rows",
            "n_nulls",
            F.round(F.col("fill_r") / 100.0, 4).alias("fill_value_r"),
            "repaired_total_r",
        )
        .orderBy("event_type")
    )


ORACLE_REPAIR_IMPUTE = """
WITH holed AS (
  SELECT event_id, event_type,
         CASE WHEN event_id % 7 = 0 THEN NULL
              ELSE CAST(round(value * 100) AS BIGINT) END AS vc
  FROM events
),
fill AS (
  SELECT event_type, count(*)::BIGINT AS n_rows,
         sum(CASE WHEN vc IS NULL THEN 1 ELSE 0 END)::BIGINT AS n_nulls,
         round(sum(vc) / CAST(count(vc) AS DOUBLE), 2) AS fill_r
  FROM holed GROUP BY event_type
),
rep AS (
  SELECT h.event_type,
         coalesce(CAST(h.vc AS DOUBLE) / 100.0, f.fill_r / 100.0) AS v
  FROM holed h JOIN fill f ON h.event_type = f.event_type
),
tot AS (
  SELECT event_type, round(sum(round(v, 6)), 2) AS repaired_total_r
  FROM rep GROUP BY event_type
)
SELECT fill.event_type, n_rows, n_nulls,
       round(fill_r / 100.0, 4) AS fill_value_r, repaired_total_r
FROM fill JOIN tot ON fill.event_type = tot.event_type
ORDER BY fill.event_type
"""

QUERIES.update({"repair_impute": q_repair_impute})
ORACLES.update({"repair_impute": ORACLE_REPAIR_IMPUTE})


# --- chi-square independence test --------------------------------------------


def q_audit_chi2_independence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chi-square test of independence between `source` and `lang` over the
    document corpus: is language composition uniform across sources, or do
    some crawls skew (the stratification check a sampling plan depends on —
    if lang ⊥̸ source, a per-source sample is NOT language-balanced)?
    Reports X², degrees of freedom, and the worst cell by contribution.
    The categorical sibling of `events_mi`'s mutual information.

    Determinism: observed counts and margins are bigints; each expected
    value is one double division of bigints; per-cell contributions round
    to 6 dp, fix to integer micro-units, and the global sum is an exact
    bigint — no float accumulation order anywhere.

    Scale: one map-side contingency rollup (sources×langs cells), two
    margin rollups of that, and an argmax over cells — nothing bigger
    than the cell table ever shuffles."""
    from pyspark.sql import Window

    docs = load_table(spark, sf_dir, "documents")
    obs = docs.groupBy("source", "lang").agg(
        F.count("*").cast("bigint").alias("o")
    )
    rt = obs.groupBy("source").agg(F.sum("o").cast("bigint").alias("_rt"))
    ct = obs.groupBy("lang").agg(F.sum("o").cast("bigint").alias("_ct"))
    n = obs.agg(F.sum("o").cast("bigint").alias("_n"))
    cells = (
        obs.join(rt, "source")
        .join(ct, "lang")
        .crossJoin(F.broadcast(n))
        .withColumn(
            "_e", (F.col("_rt") * F.col("_ct")) / F.col("_n").cast("double")
        )
        .withColumn(
            "_t",
            F.round(
                (F.col("o") - F.col("_e")) * (F.col("o") - F.col("_e"))
                / F.col("_e"),
                6,
            ),
        )
        .withColumn("_tu", F.round(F.col("_t") * 1000000).cast("bigint"))
    )
    nr = rt.agg(F.count("*").cast("bigint").alias("_nr"))
    nc = ct.agg(F.count("*").cast("bigint").alias("_nc"))
    wmax = Window.orderBy(F.desc("_tu"), F.asc("source"), F.asc("lang"))
    top = cells.withColumn("_rk", F.row_number().over(wmax)).filter(
        F.col("_rk") == 1
    )
    agg = cells.agg(
        F.count("*").cast("bigint").alias("n_cells"),
        F.sum("_tu").cast("bigint").alias("_chi_u"),
    )
    return (
        agg.crossJoin(F.broadcast(nr))
        .crossJoin(F.broadcast(nc))
        .crossJoin(
            F.broadcast(
                top.select(
                    F.col("source").alias("worst_source"),
                    F.col("lang").alias("worst_lang"),
                    F.round(F.col("_tu") / 1000000.0, 4).alias(
                        "worst_contrib_r"
                    ),
                )
            )
        )
        .select(
            "n_cells",
            ((F.col("_nr") - 1) * (F.col("_nc") - 1)).cast("bigint").alias("df"),
            F.round(F.col("_chi_u") / 1000000.0, 4).alias("chi2_r"),
            "worst_source",
            "worst_lang",
            "worst_contrib_r",
        )
    )


ORACLE_AUDIT_CHI2 = """
WITH obs AS (
  SELECT source, lang, count(*)::BIGINT AS o
  FROM documents GROUP BY source, lang
),
rt AS (SELECT source, sum(o)::BIGINT AS rt FROM obs GROUP BY source),
ct AS (SELECT lang, sum(o)::BIGINT AS ct FROM obs GROUP BY lang),
n AS (SELECT sum(o)::BIGINT AS n FROM obs),
cells AS (
  SELECT obs.source, obs.lang,
         CAST(round(round((obs.o - (rt.rt * ct.ct) / CAST(n.n AS DOUBLE))
                          * (obs.o - (rt.rt * ct.ct) / CAST(n.n AS DOUBLE))
                          / ((rt.rt * ct.ct) / CAST(n.n AS DOUBLE)), 6)
                    * 1000000) AS BIGINT) AS tu
  FROM obs JOIN rt ON obs.source = rt.source
  JOIN ct ON obs.lang = ct.lang CROSS JOIN n
),
agg AS (
  SELECT count(*)::BIGINT AS n_cells, sum(tu)::BIGINT AS chi_u FROM cells
),
dims AS (
  SELECT (SELECT count(*) FROM rt)::BIGINT AS nr,
         (SELECT count(*) FROM ct)::BIGINT AS nc
),
top AS (
  SELECT source AS worst_source, lang AS worst_lang,
         round(tu / 1000000.0, 4) AS worst_contrib_r
  FROM cells ORDER BY tu DESC, source ASC, lang ASC LIMIT 1
)
SELECT agg.n_cells, ((dims.nr - 1) * (dims.nc - 1))::BIGINT AS df,
       round(agg.chi_u / 1000000.0, 4) AS chi2_r,
       top.worst_source, top.worst_lang, top.worst_contrib_r
FROM agg, dims, top
"""

QUERIES.update({"audit_chi2_independence": q_audit_chi2_independence})
ORACLES.update({"audit_chi2_independence": ORACLE_AUDIT_CHI2})


# --- Merkle-style range checksums --------------------------------------------

MERKLE_RANGES = 16


def q_audit_merkle_ranges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Range-level Merkle layer under `audit_checksums`' single root: the
    orders key space splits into 16 contiguous o_orderkey ranges, each with
    its own XOR row-hash checksum — two clusters compare 16 fingerprints
    and re-scan ONLY the ranges that disagree (log-style drill-down instead
    of a 100 TB full rescan; contiguous ranges, unlike mod-N buckets, mean
    the re-scan is one key-range predicate that prunes at the parquet
    level).

    Determinism: the range width derives from max(o_orderkey) by exact
    integer division; row hashes are the shared 52-bit md5 construction;
    XOR is order-independent, so shuffles/partitioning can't change any
    fingerprint.

    Scale: one map-side-combined aggregate (count + bit_xor per range);
    the width lookup is a 1-row broadcast, not a driver round-trip."""
    o = spread(load_table(spark, sf_dir, "orders"))
    rh = _row_hash(
        *[F.col(c).cast("string")
          for c in ["o_orderkey", "o_custkey", "o_orderstatus",
                    "o_orderpriority"]]
    )
    mx = o.agg(F.max("o_orderkey").cast("bigint").alias("_mx"))
    w = (F.col("_mx") + MERKLE_RANGES) / MERKLE_RANGES
    ranged = o.crossJoin(F.broadcast(mx)).select(
        F.floor(F.col("o_orderkey") / F.floor(w)).cast("int").alias("range_id"),
        F.col("o_orderkey").alias("_k"),
        rh.alias("_rh"),
    )
    return (
        ranged.groupBy("range_id")
        .agg(
            F.count("*").cast("bigint").alias("n_rows"),
            F.min("_k").cast("bigint").alias("key_lo"),
            F.max("_k").cast("bigint").alias("key_hi"),
            F.expr("bit_xor(_rh)").cast("bigint").alias("checksum"),
        )
        .orderBy("range_id")
    )


ORACLE_AUDIT_MERKLE = f"""
WITH mx AS (SELECT max(o_orderkey)::BIGINT AS mx FROM orders),
ranged AS (
  SELECT CAST(floor(o.o_orderkey
              / floor((mx.mx + {MERKLE_RANGES}) / {MERKLE_RANGES}.0)) AS INT)
           AS range_id,
         o.o_orderkey AS k,
         {_duck_row_hash(["o_orderkey", "o_custkey", "o_orderstatus",
                          "o_orderpriority"])} AS rh
  FROM orders o CROSS JOIN mx
)
SELECT range_id, count(*)::BIGINT AS n_rows,
       min(k)::BIGINT AS key_lo, max(k)::BIGINT AS key_hi,
       bit_xor(rh)::BIGINT AS checksum
FROM ranged GROUP BY range_id ORDER BY range_id
"""

QUERIES.update({"audit_merkle_ranges": q_audit_merkle_ranges})
ORACLES.update({"audit_merkle_ranges": ORACLE_AUDIT_MERKLE})


# --- price last-digit preference ------------------------------------------------


def q_audit_price_digits(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Digit-preference audit on order totals: the distribution of the
    CENTS residue bucketed by its tens digit (…x0–…x9) with a chi-square
    against uniform — human-entered or rule-generated prices pile on .00 /
    .99 ("psychological pricing"); organically-computed totals don't.
    First-digit Benford (`audit_benford`) screens magnitudes; last-digit
    preference screens the other end of the number.

    Determinism: residues and counts are bigints; the per-bucket chi²
    terms micro-fix before the sum.

    Scale: one map-side 10-cell rollup; the report is 10 rows + the
    stat."""
    o = spread(load_table(spark, sf_dir, "orders")).select(
        F.floor(
            (F.round(F.col("o_totalprice") * 100).cast("bigint") % 100) / 10
        )
        .cast("int")
        .alias("digit")
    )
    obs = o.groupBy("digit").agg(F.count("*").cast("bigint").alias("n"))
    tot = obs.agg(F.sum("n").cast("bigint").alias("_t"))
    scored = obs.crossJoin(F.broadcast(tot)).select(
        "digit",
        "n",
        F.round(F.col("n") / F.col("_t").cast("double"), 6).alias("share_r"),
        F.round(
            (F.col("n") - F.col("_t") / 10.0)
            * (F.col("n") - F.col("_t") / 10.0)
            / (F.col("_t") / 10.0)
            * 1000000
        )
        .cast("bigint")
        .alias("_cu"),
    )
    chi = scored.agg(
        F.round(F.sum("_cu") / 1000000.0, 4).alias("_chi")
    )
    return (
        scored.crossJoin(F.broadcast(chi))
        .select(
            "digit",
            "n",
            "share_r",
            F.round(F.col("_cu") / 1000000.0, 4).alias("chi2_contrib_r"),
            F.col("_chi").alias("chi2_total_r"),
        )
        .orderBy("digit")
    )


ORACLE_AUDIT_PRICE_DIGITS = """
WITH o AS (
  SELECT CAST((CAST(round(o_totalprice * 100) AS BIGINT) % 100) // 10 AS INT)
           AS digit
  FROM orders
),
obs AS (SELECT digit, count(*)::BIGINT AS n FROM o GROUP BY digit),
tot AS (SELECT sum(n)::BIGINT AS t FROM obs),
sc AS (
  SELECT obs.digit, obs.n,
         round(obs.n / CAST(t.t AS DOUBLE), 6) AS share_r,
         CAST(round((obs.n - t.t / 10.0) * (obs.n - t.t / 10.0)
                    / (t.t / 10.0) * 1000000) AS BIGINT) AS cu
  FROM obs CROSS JOIN tot t
),
chi AS (SELECT round(sum(cu) / 1000000.0, 4) AS chi FROM sc)
SELECT sc.digit, sc.n, sc.share_r,
       round(sc.cu / 1000000.0, 4) AS chi2_contrib_r,
       chi.chi AS chi2_total_r
FROM sc CROSS JOIN chi ORDER BY sc.digit
"""

QUERIES.update({"audit_price_digits": q_audit_price_digits})
ORACLES.update({"audit_price_digits": ORACLE_AUDIT_PRICE_DIGITS})


# --- duplicate-invoice screen ------------------------------------------------------

DUPINV_WINDOW_DAYS = 7
DUPINV_PLANT_EVERY = 97
DUPINV_KEY_OFFSET = 10_000_000


def q_audit_duplicate_invoices(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Double-billing screen: pairs of orders from the SAME customer with
    the SAME exact cents total within 7 days — the classic accounts-
    payable duplicate-invoice rule (exact dedup misses these: different
    keys and dates; the business key is (customer, amount, date window)).
    The synthetic totals are collision-free, so every 97th order PLANTS a
    deterministic echo (same customer and total, +3 days, offset key —
    the `repair_impute` planted-fixture pattern); the screen must recover
    exactly the planted pairs, by construction 3-day gaps.

    Determinism: exact cents equality, integer day gaps, deterministic
    plants.

    Scale: the self-join keys on (custkey, cents) — per-key fan-out is the
    same-amount multiplicity (≈1 organically), never a customer-wide cross
    product; the date window is a residual filter."""
    o = spread(load_table(spark, sf_dir, "orders")).select(
        "o_custkey",
        F.col("o_orderkey").alias("_k"),
        F.round(F.col("o_totalprice") * 100).cast("bigint").alias("_rc"),
        F.datediff(F.to_date("o_orderdate"), F.lit("1970-01-01"))
        .cast("bigint")
        .alias("_d"),
    )
    echo = o.filter(F.col("_k") % DUPINV_PLANT_EVERY == 0).select(
        "o_custkey",
        (F.col("_k") + DUPINV_KEY_OFFSET).alias("_k"),
        "_rc",
        (F.col("_d") + 3).alias("_d"),
    )
    full = o.unionByName(echo)
    a = full.select("o_custkey", "_rc", F.col("_k").alias("_k1"), F.col("_d").alias("_d1"))
    b = full.select("o_custkey", "_rc", F.col("_k").alias("_k2"), F.col("_d").alias("_d2"))
    pairs = (
        a.join(b, ["o_custkey", "_rc"])
        .filter(
            (F.col("_k1") < F.col("_k2"))
            & (F.abs(F.col("_d1") - F.col("_d2")) <= DUPINV_WINDOW_DAYS)
        )
        .select(
            F.abs(F.col("_d1") - F.col("_d2")).cast("int").alias("day_gap")
        )
    )
    return (
        pairs.groupBy("day_gap")
        .agg(F.count("*").cast("bigint").alias("n_pairs"))
        .orderBy("day_gap")
    )


ORACLE_AUDIT_DUPINV = f"""
WITH base AS (
  SELECT o_custkey, o_orderkey AS k,
         CAST(round(o_totalprice * 100) AS BIGINT) AS rc,
         date_diff('day', DATE '1970-01-01', CAST(o_orderdate AS DATE))::BIGINT
           AS d
  FROM orders
),
o AS (
  SELECT * FROM base
  UNION ALL
  SELECT o_custkey, k + {DUPINV_KEY_OFFSET}, rc, d + 3
  FROM base WHERE k % {DUPINV_PLANT_EVERY} = 0
)
SELECT CAST(abs(a.d - b.d) AS INT) AS day_gap, count(*)::BIGINT AS n_pairs
FROM o a JOIN o b
  ON a.o_custkey = b.o_custkey AND a.rc = b.rc AND a.k < b.k
WHERE abs(a.d - b.d) <= {DUPINV_WINDOW_DAYS}
GROUP BY day_gap ORDER BY day_gap
"""

QUERIES.update({"audit_duplicate_invoices": q_audit_duplicate_invoices})
ORACLES.update({"audit_duplicate_invoices": ORACLE_AUDIT_DUPINV})


# --- privacy: Laplace-mechanism DP counts (seeded, engine-exact) ------------

DP_EPSILON = 0.5  # per-count privacy budget; Laplace scale b = 1/eps = 2


def _dp_uniform_expr(key: Column) -> Column:
    """Deterministic uniform in (0,1) from a seeded md5 of the group key —
    the same first-48-bits construction every engine-exact sketch in this
    repo uses, so the DuckDB oracle reproduces the noise bit-for-bit."""
    h = F.conv(F.substring(F.md5(key), 1, 12), 16, 10).cast("long")
    return (h.cast("double") + F.lit(0.5)) / F.lit(float(1 << 48))


def q_privacy_dp_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Differentially-private release of per-nation customer counts via the
    Laplace mechanism (Dwork et al., TCC 2006): count + Lap(1/eps) noise,
    eps = 0.5. Noise is SEEDED — inverse-CDF of a deterministic
    md5-uniform per group key — so the release is reproducible AND
    oracle-checkable (a production release would draw fresh randomness and
    drop true_n; the mechanism math is identical). Sensitivity of a count
    is 1, so scale b = 1/eps. One map-side-combined count; the report is
    nation-sized."""
    c = spread(load_table(spark, sf_dir, "customer"))
    g = c.groupBy(F.col("c_nationkey").alias("nation")).agg(
        F.count("*").cast("bigint").alias("true_n")
    )
    u = _dp_uniform_expr(F.concat(F.lit("dp:"), F.col("nation").cast("string")))
    p = u - F.lit(0.5)
    b = 1.0 / DP_EPSILON
    noise = -F.lit(b) * F.signum(p) * F.log(F.lit(1.0) - 2.0 * F.abs(p))
    return (
        g.withColumn("noise", F.round(noise, 6))
        .withColumn("noisy_n", F.round(F.col("true_n") + noise, 6))
        .select("nation", "true_n", "noise", "noisy_n")
        .orderBy("nation")
    )


ORACLE_PRIVACY_DP_COUNTS = f"""
WITH g AS (
  SELECT c_nationkey AS nation, count(*)::BIGINT AS true_n
  FROM customer GROUP BY 1
), n AS (
  SELECT nation, true_n,
         (('0x' || substr(md5('dp:' || CAST(nation AS VARCHAR)), 1, 12))::BIGINT
          + 0.5) / {float(1 << 48)} - 0.5 AS p
  FROM g
)
SELECT nation, true_n,
       round(-{1.0 / DP_EPSILON} * sign(p) * ln(1 - 2 * abs(p)), 6) AS noise,
       round(true_n - {1.0 / DP_EPSILON} * sign(p) * ln(1 - 2 * abs(p)), 6)
         AS noisy_n
FROM n ORDER BY nation
"""

QUERIES.update({"privacy_dp_counts": q_privacy_dp_counts})
ORACLES.update({"privacy_dp_counts": ORACLE_PRIVACY_DP_COUNTS})


# --- privacy: t-closeness (EMD of ordered sensitive distribution) ----------

TCLOSE_T = 0.2


def q_privacy_t_closeness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """t-closeness (Li, Li & Venkatasubramanian, ICDE 2007): for each QI
    group (market segment) the Earth-Mover's Distance between its
    sensitive-attribute distribution (account-balance band, ORDERED) and
    the global one, normalized by m-1 bands — the standard 1-D ordered
    EMD = sum of |cumulative differences| / (m-1). Groups with EMD <= t
    (0.2) pass. Shape: one count rollup + two small window passes over a
    (segments x bands)-sized frame — nothing scales with row count."""
    c = spread(load_table(spark, sf_dir, "customer"))
    cnt = (
        c.select(
            F.col("c_mktsegment").alias("segment"),
            F.floor(F.col("c_acctbal") / 1000.0).cast("bigint").alias("band"),
        )
        .groupBy("segment", "band")
        .agg(F.count("*").cast("bigint").alias("n"))
    )
    segs = cnt.select("segment").distinct()
    bands = cnt.select("band").distinct()
    dense = segs.crossJoin(bands).join(cnt, ["segment", "band"], "left").select(
        "segment", "band", F.coalesce("n", F.lit(0)).cast("bigint").alias("n")
    )
    from pyspark.sql import Window as W

    w_seg = W.partitionBy("segment")
    w_all = W.partitionBy(F.lit(1))
    w_cum_seg = w_seg.orderBy("band")
    # global cumulative fraction must be computed once per band: aggregate
    # bands over segments FIRST, then window over the ordered band axis
    glob = (
        dense.groupBy("band")
        .agg(F.sum("n").cast("bigint").alias("gn"))
        .withColumn("g_tot", F.sum("gn").over(w_all))
        .withColumn(
            "g_cum",
            F.sum("gn").over(W.partitionBy(F.lit(1)).orderBy("band"))
            / F.col("g_tot"),
        )
        .select("band", "g_cum")
    )
    per = (
        dense.withColumn("s_tot", F.sum("n").over(w_seg))
        .withColumn("s_cum", F.sum("n").over(w_cum_seg) / F.col("s_tot"))
        .join(glob, "band")
    )
    res = (
        per.groupBy("segment")
        .agg(
            F.max("s_tot").cast("bigint").alias("n_rows"),
            (F.sum(F.abs(F.col("s_cum") - F.col("g_cum"))) / (F.count("*") - 1)).alias(
                "_emd"
            ),
        )
        .select(
            "segment",
            "n_rows",
            F.round("_emd", 6).alias("emd"),
            (F.col("_emd") <= F.lit(TCLOSE_T)).alias("t_close"),
        )
        .orderBy("segment")
    )
    return res


ORACLE_PRIVACY_T_CLOSENESS = f"""
WITH cnt AS (
  SELECT c_mktsegment AS segment,
         CAST(floor(c_acctbal / 1000.0) AS BIGINT) AS band,
         count(*)::BIGINT AS n
  FROM customer GROUP BY 1, 2
), dense AS (
  SELECT s.segment, b.band, COALESCE(c.n, 0)::BIGINT AS n
  FROM (SELECT DISTINCT segment FROM cnt) s
  CROSS JOIN (SELECT DISTINCT band FROM cnt) b
  LEFT JOIN cnt c ON c.segment = s.segment AND c.band = b.band
), gdist AS (
  SELECT band, gn, SUM(gn) OVER (ORDER BY band) * 1.0 /
         SUM(gn) OVER () AS g_cum
  FROM (SELECT band, SUM(n)::BIGINT AS gn FROM dense GROUP BY band)
), per AS (
  SELECT d.segment, d.band, d.n,
         SUM(d.n) OVER (PARTITION BY d.segment) AS s_tot,
         SUM(d.n) OVER (PARTITION BY d.segment ORDER BY d.band) * 1.0 /
           SUM(d.n) OVER (PARTITION BY d.segment) AS s_cum,
         g.g_cum
  FROM dense d JOIN gdist g ON g.band = d.band
)
SELECT segment, MAX(s_tot)::BIGINT AS n_rows,
       round(SUM(abs(s_cum - g_cum)) / (count(*) - 1), 6) AS emd,
       (SUM(abs(s_cum - g_cum)) / (count(*) - 1)) <= {TCLOSE_T} AS t_close
FROM per GROUP BY segment ORDER BY segment
"""

QUERIES.update({"privacy_t_closeness": q_privacy_t_closeness})
ORACLES.update({"privacy_t_closeness": ORACLE_PRIVACY_T_CLOSENESS})
