"""Join-reduction and blocking queries (outside the driver's pinned 50-entry
window; covered by tests/test_oracle_parity.py).

Operators exercised:
- deterministic Bloom-filter semi-join reduction (`operators/bloom.py`) —
  the runtime-filter technique with md5 bit positions, so the filter AND
  its false positives are bit-identical across engines;
- sorted-neighborhood blocking (`operators/dedup.py::
  sorted_neighborhood_pairs`, Hernandez & Stolfo 1995).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pyvectorsearch_spark.operators.bloom import (
    N_WORDS,
    WORD_BITS,
    bloom_build,
    bloom_might_contain,
    duckdb_positions,
)
from pyvectorsearch_spark.sources.tables import load_table, spread

DIM_NATIONS = 5
SN_WINDOW = 3


def q_bloom_semijoin_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bloom pre-filter of orders against a selective customer slice
    (nations 0-4): fact rows passing the 8 KB literal filter vs the exact
    semi join — measuring the false-positive rate the zero-shuffle
    pre-filter pays. No false negatives by construction (also asserted by
    the oracle equality)."""
    cust = load_table(spark, sf_dir, "customer").filter(
        F.col("c_nationkey") < DIM_NATIONS
    )
    words = bloom_build(cust, "c_custkey")
    orders = spread(load_table(spark, sf_dir, "orders"))
    n_fact = orders.agg(F.count("*").cast("bigint").alias("n_fact"))
    n_pass = orders.filter(
        bloom_might_contain(F.col("o_custkey"), words)
    ).agg(F.count("*").cast("bigint").alias("n_pass"))
    n_exact = orders.join(
        cust.select(F.col("c_custkey").alias("o_custkey")), "o_custkey", "left_semi"
    ).agg(F.count("*").cast("bigint").alias("n_exact"))
    return (
        n_fact.crossJoin(n_pass)
        .crossJoin(n_exact)
        .select(
            "n_fact",
            "n_pass",
            "n_exact",
            F.round(
                (F.col("n_pass") - F.col("n_exact"))
                / F.greatest("n_pass", F.lit(1)).cast("double"),
                6,
            ).alias("fp_rate"),
        )
    )


def _oracle_bloom() -> str:
    p_dim = duckdb_positions("k")
    p_probe = duckdb_positions("o_custkey")
    checks = " AND ".join(
        f"(arr[CAST({p} // {WORD_BITS} AS INT) + 1]"
        f" & (1::BIGINT << CAST({p} % {WORD_BITS} AS INT))) <> 0"
        for p in p_probe
    )
    return f"""
WITH dim AS (
  SELECT c_custkey AS k FROM customer WHERE c_nationkey < {DIM_NATIONS}
),
pos AS (SELECT unnest([{", ".join(p_dim)}]) AS p FROM dim),
wrds AS (
  SELECT CAST(p // {WORD_BITS} AS INT) AS w,
         bit_or(1::BIGINT << CAST(p % {WORD_BITS} AS INT)) AS word
  FROM pos GROUP BY w
),
grid AS (SELECT unnest(range(0, {N_WORDS})) AS w),
dense AS (
  SELECT grid.w, coalesce(wrds.word, 0) AS word
  FROM grid LEFT JOIN wrds ON wrds.w = grid.w
),
warr AS (SELECT list(word ORDER BY w) AS arr FROM dense),
checked AS (
  SELECT o_custkey, ({checks}) AS pass
  FROM orders CROSS JOIN warr
),
agg AS (
  SELECT count(*)::BIGINT AS n_fact,
         sum(CASE WHEN pass THEN 1 ELSE 0 END)::BIGINT AS n_pass
  FROM checked
),
ex AS (
  SELECT count(*)::BIGINT AS n_exact FROM orders o
  WHERE EXISTS (SELECT 1 FROM dim WHERE dim.k = o.o_custkey)
)
SELECT n_fact, n_pass, n_exact,
       round((n_pass - n_exact) / greatest(n_pass, 1)::DOUBLE, 6) AS fp_rate
FROM agg CROSS JOIN ex
"""


ORACLE_BLOOM = _oracle_bloom()


def q_sorted_neighborhood_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sorted-neighborhood candidate pairs per source (window 3 over the
    fingerprint order): pair counts and a membership checksum."""
    from pyvectorsearch_spark.operators.dedup import sorted_neighborhood_pairs

    docs = spread(load_table(spark, sf_dir, "documents"))
    pairs = sorted_neighborhood_pairs(docs, window=SN_WINDOW)
    chk = (
        F.conv(
            F.substring(
                F.md5(
                    F.concat_ws(
                        "|", F.col("d1").cast("string"), F.col("d2").cast("string")
                    )
                ),
                1,
                12,
            ),
            16,
            10,
        ).cast("bigint")
        % 1_000_000_007
    )
    return (
        pairs.groupBy("source")
        .agg(
            F.count("*").cast("bigint").alias("n_pairs"),
            F.sum(chk).cast("bigint").alias("pair_checksum"),
        )
        .orderBy("source")
    )


def _oracle_sn() -> str:
    from pyvectorsearch_spark.functions.text import duckdb_tokens

    tok = duckdb_tokens("text")
    leads = ", ".join(
        f"lead(doc_id, {j}) OVER (PARTITION BY source ORDER BY fp, doc_id) AS l{j}"
        for j in range(1, SN_WINDOW + 1)
    )
    return f"""
WITH d AS (
  SELECT source, doc_id, array_to_string({tok}, ' ') AS nt FROM documents
),
fp AS (
  SELECT source, doc_id,
         list_aggregate(list_transform(
           range(1, greatest(length(nt) - 7, 1) + 1),
           i -> md5(substr(nt, CAST(i AS INT), 8))), 'min') AS fp
  FROM d
),
led AS (SELECT source, doc_id, {leads} FROM fp),
pairs AS (
  SELECT source, doc_id AS d1, unnest([{", ".join(f"l{j}" for j in range(1, SN_WINDOW + 1))}]) AS d2
  FROM led
)
SELECT source, count(*)::BIGINT AS n_pairs,
       sum(('0x' || substr(md5(d1::VARCHAR || '|' || d2::VARCHAR), 1, 12))::BIGINT
           % 1000000007)::BIGINT AS pair_checksum
FROM pairs WHERE d2 IS NOT NULL
GROUP BY source ORDER BY source
"""


ORACLE_SN = _oracle_sn()



# --- Fellegi-Sunter record linkage ----------------------------------------
# Fixed m/u agreement weights (log2(m/u) literals, rounded to 4 dp so the
# three-term score sum is engine-exact): name (m=.9, u=.001), balance-within-
# 50-cents (m=.8, u=.05), market segment (m=.95, u=.2).
FS_W = {
    "name": (9.8138, -3.3205),
    "bal": (4.0, -2.2479),
    "seg": (2.2479, -4.0),
}
FS_LINK = 10.0
FS_POSSIBLE = 0.0


def q_er_customer_linkage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fellegi-Sunter probabilistic record linkage (the ER scoring model,
    1969): a planted dirty source B (every 5th customer re-keyed with a
    mangled name and a rounded balance) is linked back to source A inside
    nation blocks. Field agreements (normalized name, balance within 50
    cents — integer-cents exact, segment) weight by fixed log2(m/u)
    literals; pairs classify link / possible / non-link. Only nation-blocked
    candidates are scored (never the corpus square); the output keeps every
    non-'non-link' pair, hash-checked with its agreement pattern and
    rounded score."""
    cust = spread(load_table(spark, sf_dir, "customer"))
    a = cust.select(
        F.col("c_custkey").alias("a_key"),
        F.col("c_nationkey").alias("nk"),
        F.lower(F.regexp_replace("c_name", "[^A-Za-z0-9]", "")).alias("a_name"),
        F.round(F.col("c_acctbal") * 100).cast("bigint").alias("a_cents"),
        F.col("c_mktsegment").alias("a_seg"),
    )
    b1 = cust.filter(F.col("c_custkey") % 5 == 0).select(
        (F.col("c_custkey") + 1000000).alias("b_key"),
        F.col("c_nationkey").alias("nk"),
        F.concat(
            F.lower(F.regexp_replace("c_name", "[^A-Za-z0-9]", "")), F.lit("inc")
        ).alias("b_name"),
        (F.round(F.col("c_acctbal")) * 100).cast("bigint").alias("b_cents"),
        F.col("c_mktsegment").alias("b_seg"),
    )
    # second dirty stratum: unrecognizable name, exact balance, same segment
    # -> lands in the 'possible' review band (name_d + bal_a + seg_a > 0)
    b2 = cust.filter(F.col("c_custkey") % 7 == 3).select(
        (F.col("c_custkey") + 2000000).alias("b_key"),
        F.col("c_nationkey").alias("nk"),
        F.concat(F.lit("anon"), F.col("c_custkey").cast("string")).alias("b_name"),
        F.round(F.col("c_acctbal") * 100).cast("bigint").alias("b_cents"),
        F.col("c_mktsegment").alias("b_seg"),
    )
    b = b1.unionByName(b2)
    cand = a.join(b, "nk")
    name_agree = (
        (F.col("a_name") == F.col("b_name"))
        | (F.concat(F.col("a_name"), F.lit("inc")) == F.col("b_name"))
        | (F.col("a_name") == F.concat(F.col("b_name"), F.lit("inc")))
    )
    bal_agree = F.abs(F.col("a_cents") - F.col("b_cents")) <= 50
    seg_agree = F.col("a_seg") == F.col("b_seg")

    def w(flag, key):
        agree, disagree = FS_W[key]
        return F.when(flag, F.lit(agree)).otherwise(F.lit(disagree))

    score = F.round(
        w(name_agree, "name") + w(bal_agree, "bal") + w(seg_agree, "seg"), 4
    )
    klass = (
        F.when(score >= FS_LINK, F.lit("link"))
        .when(score >= FS_POSSIBLE, F.lit("possible"))
        .otherwise(F.lit("non-link"))
    )
    return (
        cand.select(
            "a_key",
            "b_key",
            name_agree.alias("name_agree"),
            bal_agree.alias("bal_agree"),
            seg_agree.alias("seg_agree"),
            score.alias("score_r"),
            klass.alias("klass"),
        )
        .filter(F.col("klass") != "non-link")
        .orderBy("a_key", "b_key")
    )


ORACLE_ER_LINKAGE = f"""
WITH a AS (
  SELECT c_custkey AS a_key, c_nationkey AS nk,
         lower(regexp_replace(c_name, '[^A-Za-z0-9]', '', 'g')) AS a_name,
         CAST(round(c_acctbal * 100) AS BIGINT) AS a_cents,
         c_mktsegment AS a_seg
  FROM customer
),
b AS (
  SELECT c_custkey + 1000000 AS b_key, c_nationkey AS nk,
         lower(regexp_replace(c_name, '[^A-Za-z0-9]', '', 'g')) || 'inc'
           AS b_name,
         CAST(round(c_acctbal) * 100 AS BIGINT) AS b_cents,
         c_mktsegment AS b_seg
  FROM customer WHERE c_custkey % 5 = 0
  UNION ALL
  SELECT c_custkey + 2000000 AS b_key, c_nationkey AS nk,
         'anon' || c_custkey AS b_name,
         CAST(round(c_acctbal * 100) AS BIGINT) AS b_cents,
         c_mktsegment AS b_seg
  FROM customer WHERE c_custkey % 7 = 3
),
sc AS (
  SELECT a_key, b_key,
         (a_name = b_name OR a_name || 'inc' = b_name
          OR a_name = b_name || 'inc') AS name_agree,
         (abs(a_cents - b_cents) <= 50) AS bal_agree,
         (a_seg = b_seg) AS seg_agree
  FROM a JOIN b USING (nk)
),
w AS (
  SELECT a_key, b_key, name_agree, bal_agree, seg_agree,
         round(CASE WHEN name_agree THEN 9.8138 ELSE -3.3205 END
             + CASE WHEN bal_agree THEN 4.0 ELSE -2.2479 END
             + CASE WHEN seg_agree THEN 2.2479 ELSE -4.0 END, 4) AS score_r
  FROM sc
)
SELECT a_key, b_key, name_agree, bal_agree, seg_agree, score_r,
       CASE WHEN score_r >= 10.0 THEN 'link'
            WHEN score_r >= 0.0 THEN 'possible'
            ELSE 'non-link' END AS klass
FROM w WHERE score_r >= 0.0
ORDER BY a_key, b_key
"""

QUERIES = {
    "bloom_semijoin_stats": q_bloom_semijoin_stats,
    "sorted_neighborhood_stats": q_sorted_neighborhood_stats,
    "er_customer_linkage": q_er_customer_linkage,
}
ORACLES = {
    "bloom_semijoin_stats": ORACLE_BLOOM,
    "sorted_neighborhood_stats": ORACLE_SN,
    "er_customer_linkage": ORACLE_ER_LINKAGE,
}
