"""Data-quality / pipeline-monitoring operators (north-star extensions —
the operational companions every production 100 TB pipeline runs next to its
analytics: distribution-drift alarms and column profiling).

Both are single-pass, map-side-combined aggregations: the drift test reduces
the fact table to a (group, bucket) histogram, the profiler to one row of
partial aggregates per scan — no operator here shuffles more than a
histogram.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


def psi_drift(
    df: DataFrame,
    *,
    by: str,
    value_col: str,
    split_col: str,
    bucket_width: float,
    n_buckets: int = 20,
    eps: float = 1e-6,
) -> DataFrame:
    """Population Stability Index between a baseline and a current cohort,
    per ``by`` group — the standard drift alarm for feature/label
    distributions:

        PSI = Σ_buckets (p_cur − p_base) · ln(p_cur / p_base),

    with fixed-width value buckets (last bucket open-ended) and ``eps``
    floors so empty buckets contribute finitely. PSI < 0.1 is conventionally
    stable, > 0.25 a drift alarm.

    ``split_col`` must be a boolean column: False = baseline cohort,
    True = current cohort. Bucketing is pure integer arithmetic
    (``least(floor(v / w), n-1)``), so both engines agree exactly; the
    per-bucket log contributions are rounded to 6 dp before the sum, making
    the PSI total order-independent across engines.

    Scale shape: one groupBy collapses the fact table map-side into a
    (group, bucket) histogram (≤ groups × n_buckets rows); everything after
    is histogram-sized. Returns (``by``, n_base, n_cur, psi).
    """
    b = F.least(
        F.floor(F.col(value_col) / bucket_width).cast("int"), F.lit(n_buckets - 1)
    )
    hist = (
        df.select(F.col(by), b.alias("_b"), F.col(split_col).alias("_cur"))
        .groupBy(by, "_b")
        .agg(
            F.sum(F.when(~F.col("_cur"), 1).otherwise(0)).alias("_nb"),
            F.sum(F.when(F.col("_cur"), 1).otherwise(0)).alias("_nc"),
        )
    )
    return psi_from_histogram(hist, by=by, eps=eps)


def psi_from_histogram(hist: DataFrame, *, by: str, eps: float = 1e-6) -> DataFrame:
    """Fold a (``by``, _b, _nb, _nc) bucket histogram into per-group PSI —
    split out so a STREAMING aggregation can build the histogram (the only
    stateful part) and hand the tiny result to the same fold
    (`queries/streaming_drift.py`)."""
    from pyspark.sql import Window

    w = Window.partitionBy(by)
    tot = hist.withColumn("_tb", F.sum("_nb").over(w)).withColumn(
        "_tc", F.sum("_nc").over(w)
    )
    p_base = F.greatest(F.col("_nb") / F.greatest("_tb", F.lit(1)), F.lit(eps))
    p_cur = F.greatest(F.col("_nc") / F.greatest("_tc", F.lit(1)), F.lit(eps))
    contrib = F.round((p_cur - p_base) * F.log(p_cur / p_base), 6)
    return (
        tot.withColumn("_c", contrib)
        .groupBy(by)
        .agg(
            F.max("_tb").cast("bigint").alias("n_base"),
            F.max("_tc").cast("bigint").alias("n_cur"),
            F.round(F.sum("_c"), 6).alias("psi"),
        )
    )


def entropy_mi(
    df: DataFrame,
    *,
    col_a: str,
    col_b: str,
    round_dp: int = 6,
) -> DataFrame:
    """Shannon entropies and mutual information between two categorical
    columns — the feature-dependency profile (MI = 0 means B carries no
    information about A; high MI flags redundant or leaking features).

    Everything derives from ONE map-side-combined joint-count aggregate
    (vocabulary-sized); marginals re-aggregate that reduced table. The
    determinism ladder: exact integer counts, per-cell -p*ln(p)
    contributions rounded to ``round_dp`` before the (order-independent)
    sums, entropies rounded, MI = H(A)+H(B)-H(A,B) from the rounded
    entropies.

    Returns one row (n_rows, h_a, h_b, h_ab, mi)."""
    joint = df.groupBy(
        F.col(col_a).alias("_a"), F.col(col_b).alias("_b")
    ).agg(F.count("*").cast("bigint").alias("_c"))

    def _h(counts: DataFrame) -> DataFrame:
        # scalar total via agg + broadcast cross join — an unpartitioned
        # window here would funnel the whole count table through one task
        tot = counts.agg(F.sum("_c").cast("bigint").alias("_t"))
        p = F.col("_c") / F.col("_t")
        contrib = F.round(-p * F.log(p), round_dp)
        return (
            counts.crossJoin(F.broadcast(tot))
            .select(contrib.alias("_h"), F.col("_c"))
            .agg(
                F.round(F.sum("_h"), round_dp).alias("h"),
                F.sum("_c").cast("bigint").alias("n"),
            )
        )

    h_ab = _h(joint).select(F.col("h").alias("h_ab"), F.col("n").alias("n_rows"))
    h_a = _h(joint.groupBy("_a").agg(F.sum("_c").alias("_c"))).select(
        F.col("h").alias("h_a")
    )
    h_b = _h(joint.groupBy("_b").agg(F.sum("_c").alias("_c"))).select(
        F.col("h").alias("h_b")
    )
    return (
        h_ab.crossJoin(h_a)
        .crossJoin(h_b)
        .select(
            "n_rows",
            "h_a",
            "h_b",
            "h_ab",
            F.round(F.col("h_a") + F.col("h_b") - F.col("h_ab"), round_dp).alias(
                "mi"
            ),
        )
    )


def expectation_report(
    df: DataFrame,
    rules: list[tuple[str, Column]],
    *,
    foreign_keys: list[tuple[str, str, DataFrame, str]] | None = None,
) -> DataFrame:
    """Great-Expectations-style validation: one output row per rule with
    pass/violation counts. ``rules`` are (name, boolean Column) pairs —
    NULL predicate results count as violations (a rule must positively
    hold). ``foreign_keys`` entries (rule_name, local_col, dim_df, dim_col)
    check referential integrity via a distributed LEFT ANTI join against
    the dimension's distinct keys (NULL locals are orphans too: a fact row
    must reference something).

    Scale shape: all column rules evaluate in ONE pass over the scan
    (conditional-sum aggregate, map-side combined); each FK check is one
    anti-join whose dimension side reduces to distinct keys first (AQE
    broadcasts it when small). Returns (rule, n_rows, n_violations,
    violation_frac) ordered by rule."""
    aggs = [F.count("*").alias("_n")]
    for name, cond in rules:
        aggs.append(
            F.sum(F.when(F.coalesce(cond, F.lit(False)), 0).otherwise(1)).alias(
                f"_v_{name}"
            )
        )
    one = df.agg(*aggs)
    reports = one.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(name).alias("rule"),
                        F.col("_n").cast("bigint").alias("n_rows"),
                        F.col(f"_v_{name}").cast("bigint").alias("n_violations"),
                    )
                    for name, _ in rules
                ]
            )
        ).alias("_r")
    ).select("_r.*")
    for name, local_col, dim_df, dim_col in foreign_keys or []:
        dim_keys = dim_df.select(F.col(dim_col).alias(local_col)).distinct()
        orphans = df.select(local_col).join(dim_keys, local_col, "left_anti")
        fk = df.agg(F.count("*").cast("bigint").alias("n_rows")).crossJoin(
            orphans.agg(F.count("*").cast("bigint").alias("n_violations"))
        ).select(F.lit(name).alias("rule"), "n_rows", "n_violations")
        reports = reports.unionByName(fk)
    return reports.select(
        "rule",
        "n_rows",
        "n_violations",
        F.round(
            F.col("n_violations") / F.greatest("n_rows", F.lit(1)).cast("double"), 6
        ).alias("violation_frac"),
    ).orderBy("rule")


_NUMERIC = (T.ByteType, T.ShortType, T.IntegerType, T.LongType,
            T.FloatType, T.DoubleType, T.DecimalType)


def profile_table(df: DataFrame, *, round_dp: int = 6) -> DataFrame:
    """Single-pass column profiler — the schema-drift / null-rate monitor:
    one output row per column with null count, exact distinct count, and
    min/max (numeric columns in ``min_num``/``max_num`` rounded to
    ``round_dp``; string columns in ``min_str``/``max_str``; other types
    profile nulls/distincts only, keeping every output cell
    engine-comparable).

    Scale shape: ONE aggregation job computes every per-column statistic as
    parallel agg expressions over a single scan; the unpivot to long form
    happens on the single result row. Honest cost note: multiple EXACT
    count_distincts make Catalyst expand the scan rows once per distinct
    column (k columns -> k x rows into the partial aggregate). That is the
    price of exactness (and of the oracle); a production profiler at 100 TB
    swaps in approx_count_distinct (HLL sketch, no expand, one pass) at the
    cost of the exact-parity check. Returns
    (column, n_rows, n_null, n_distinct, min_num, max_num, min_str,
    max_str) ordered by column name.
    """
    aggs: list[Column] = [F.count("*").alias("_n")]
    for f in df.schema.fields:
        c = f.name
        aggs += [
            F.sum(F.col(c).isNull().cast("long")).alias(f"_null_{c}"),
            F.count_distinct(F.col(c)).alias(f"_dist_{c}"),
        ]
        if isinstance(f.dataType, _NUMERIC):
            aggs += [
                F.round(F.min(c).cast("double"), round_dp).alias(f"_min_{c}"),
                F.round(F.max(c).cast("double"), round_dp).alias(f"_max_{c}"),
            ]
        elif isinstance(f.dataType, T.StringType):
            aggs += [
                F.min(c).alias(f"_smin_{c}"),
                F.max(c).alias(f"_smax_{c}"),
            ]
    one = df.agg(*aggs)
    structs = []
    for f in df.schema.fields:
        c = f.name
        is_num = isinstance(f.dataType, _NUMERIC)
        is_str = isinstance(f.dataType, T.StringType)
        structs.append(
            F.struct(
                F.lit(c).alias("column"),
                F.col("_n").cast("bigint").alias("n_rows"),
                F.col(f"_null_{c}").cast("bigint").alias("n_null"),
                F.col(f"_dist_{c}").cast("bigint").alias("n_distinct"),
                (F.col(f"_min_{c}") if is_num else F.lit(None).cast("double")).alias(
                    "min_num"
                ),
                (F.col(f"_max_{c}") if is_num else F.lit(None).cast("double")).alias(
                    "max_num"
                ),
                (
                    F.col(f"_smin_{c}") if is_str else F.lit(None).cast("string")
                ).alias("min_str"),
                (
                    F.col(f"_smax_{c}") if is_str else F.lit(None).cast("string")
                ).alias("max_str"),
            )
        )
    return (
        one.select(F.explode(F.array(*structs)).alias("_p"))
        .select("_p.*")
        .orderBy("column")
    )


def winsorize_stats(
    df: DataFrame,
    *,
    by: str,
    value_col: str,
    lo_q: float = 0.05,
    hi_q: float = 0.95,
    bin_cents: int = 100,
) -> DataFrame:
    """Per-group winsorization report: clip ``value_col`` to the group's
    [lo_q, hi_q] quantile band and report how much moved — the standard
    robust-scaling / outlier-capping step before a numeric feature feeds a
    model.

    The clip bounds come from a per-group fixed-width histogram over
    integer cents (the `hist_quantiles` construction, partitioned by
    group): engine-exact, and the quantile walk runs over groups x bins
    rows, never a per-group sort. The winsorized sum decomposes into an
    exact integer mid-segment sum plus count x bound products, so the
    result is order-independent (no floating accumulation over the fact
    table).

    Returns (``by``, n, n_lo, n_hi, lo_r, hi_r, winsorized_sum)."""
    from pyspark.sql import Window

    b = df.select(
        F.col(by).alias("g"),
        F.round(F.col(value_col) * 100).cast("bigint").alias("_vc"),
    ).withColumn(
        "_bin", F.floor(F.col("_vc") / F.lit(float(bin_cents))).cast("bigint")
    )
    h = b.groupBy("g", "_bin").agg(F.count("*").cast("bigint").alias("_cnt"))
    wg = Window.partitionBy("g").orderBy("_bin")
    c = h.withColumn("_cum", F.sum("_cnt").over(wg)).withColumn(
        "_cum_prev", F.col("_cum") - F.col("_cnt")
    )
    t = h.groupBy("g").agg(F.sum("_cnt").cast("bigint").alias("_n"))
    qdf = t.withColumn(
        "_r_lo", F.ceil(F.lit(float(lo_q)) * F.col("_n")).cast("bigint")
    ).withColumn("_r_hi", F.ceil(F.lit(float(hi_q)) * F.col("_n")).cast("bigint"))
    cj = c.join(F.broadcast(qdf.select("g", "_r_lo", "_r_hi")), "g")

    def _est(rank_col: str) -> Column:
        return F.col("_bin") * bin_cents + bin_cents * (
            F.col(rank_col) - F.col("_cum_prev")
        ) / F.col("_cnt")

    lo = cj.filter(
        (F.col("_cum") >= F.col("_r_lo")) & (F.col("_cum_prev") < F.col("_r_lo"))
    ).select("g", _est("_r_lo").alias("_lo_c"))
    hi = cj.filter(
        (F.col("_cum") >= F.col("_r_hi")) & (F.col("_cum_prev") < F.col("_r_hi"))
    ).select("g", _est("_r_hi").alias("_hi_c"))
    bounds = qdf.select("g", "_n").join(lo, "g").join(hi, "g")
    f = b.join(F.broadcast(bounds), "g")
    agg = f.groupBy("g").agg(
        F.max("_n").alias("n"),
        F.sum(F.when(F.col("_vc") < F.col("_lo_c"), 1).otherwise(0))
        .cast("bigint")
        .alias("n_lo"),
        F.sum(F.when(F.col("_vc") > F.col("_hi_c"), 1).otherwise(0))
        .cast("bigint")
        .alias("n_hi"),
        F.sum(
            F.when(
                (F.col("_vc") >= F.col("_lo_c")) & (F.col("_vc") <= F.col("_hi_c")),
                F.col("_vc"),
            ).otherwise(0)
        )
        .cast("bigint")
        .alias("_mid_sum"),
        F.max("_lo_c").alias("_lo_c"),
        F.max("_hi_c").alias("_hi_c"),
    )
    return agg.select(
        F.col("g").alias(by),
        "n",
        "n_lo",
        "n_hi",
        F.round(F.col("_lo_c") / 100.0, 3).alias("lo_r"),
        F.round(F.col("_hi_c") / 100.0, 3).alias("hi_r"),
        F.round(
            (
                F.col("_mid_sum")
                + F.col("n_lo") * F.col("_lo_c")
                + F.col("n_hi") * F.col("_hi_c")
            )
            / 100.0,
            2,
        ).alias("winsorized_sum"),
    )
