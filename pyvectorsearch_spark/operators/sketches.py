"""Deterministic sketch operators (north-star extensions; the reference has
no aggregation surface at all).

KMV (k-minimum-values) distinct-count sketch — Bar-Yossef et al. 2002: hash
every value to (0,1); the k-th smallest hash u_k of D distinct values sits
near k/D, so D-hat = (k-1)/u_k. Unlike HyperLogLog implementations (whose
register layouts differ per engine), KMV over an md5 hash is a DETERMINISTIC
function of the value set — Spark and DuckDB compute bit-identical estimates,
so the sketch itself is oracle-checkable.

Hash: first 13 hex chars of md5 (52 bits) — exact in BIGINT and in double,
in both engines (the same trick as ``sampling.hash_bucket``'s 48-bit bucket).

Scale shape: the per-(group, hash) dedupe is a map-side-combined groupBy (the
only corpus-sized shuffle moves distinct (group, 52-bit-hash) pairs, like any
exact distinct); ranking is two-phase (sub-shard k-min first, then k-min of
the ≤ k·shards survivors), so a billion-distinct group never sorts in one
task. The summary itself (k values per group) is mergeable: union two groups'
k-min lists and re-take the k smallest.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

HEX_DIGITS = 13  # 52 bits: exact in bigint AND double, both engines
_SCALE = float(16**HEX_DIGITS)


def kmv_hash(col: Column) -> Column:
    """Deterministic uniform hash in [0, 1): first 52 bits of md5, scaled.
    DuckDB twin: ``('0x' || substr(md5(x), 1, 13))::BIGINT / 16.0^13``."""
    h = F.md5(col.cast("string"))
    return (
        F.conv(F.substring(h, 1, HEX_DIGITS), 16, 10).cast("bigint") / F.lit(_SCALE)
    )


def duckdb_kmv_hash(expr: str) -> str:
    return (
        f"('0x' || substr(md5(CAST({expr} AS VARCHAR)), 1, {HEX_DIGITS}))::BIGINT"
        f" / {_SCALE!r}"
    )


def kmv_distinct(
    df: DataFrame,
    *,
    by: str,
    value_col: str,
    k: int = 64,
    sub_shards: int = 16,
) -> DataFrame:
    """Per-group KMV distinct-count estimate.

    Returns (``by``, n_distinct_exact, kmv_estimate, u_k) where
    ``kmv_estimate`` = round((k-1)/u_k, 3) when the group has >= k distinct
    values, else the exact count (the sketch is exact below capacity);
    ``u_k`` is the k-th smallest normalized hash (NULL below capacity).
    ``n_distinct_exact`` rides along free — the dedupe needed for the
    sketch IS an exact distinct — and doubles as the accuracy reference.
    """
    if k < 2:
        raise ValueError(f"k must be >= 2, got {k}")
    u = kmv_hash(F.col(value_col))
    # dedupe: map-side combined; the shuffle moves distinct (group, u) pairs
    d = df.select(F.col(by), u.alias("_u")).distinct()
    # two-phase k-min so one giant group cannot serialize into a single sort
    shard = (F.col("_u") * sub_shards).cast("int")
    w1 = Window.partitionBy(by, shard).orderBy("_u")
    cand = d.withColumn("_r1", F.row_number().over(w1))
    w2 = Window.partitionBy(by).orderBy("_u")
    ranked = cand.filter(F.col("_r1") <= k).withColumn("_r2", F.row_number().over(w2))
    mins = ranked.groupBy(by).agg(
        F.max(F.when(F.col("_r2") == k, F.col("_u"))).alias("u_k")
    )
    totals = d.groupBy(by).agg(F.count("*").cast("bigint").alias("n_distinct_exact"))
    est = F.when(
        F.col("u_k").isNotNull(), F.round((k - 1) / F.col("u_k"), 3)
    ).otherwise(F.col("n_distinct_exact").cast("double"))
    return totals.join(mins, by).select(
        by,
        "n_distinct_exact",
        est.alias("kmv_estimate"),
        F.round("u_k", 9).alias("u_k"),
    )


# ---------------------------------------------------------------------------
# Count-min sketch — Cormode & Muthukrishnan 2005. Like KMV, built on the
# 52-bit md5 hash so the sketch (and therefore every estimate drawn from it)
# is a deterministic function of the input multiset: Spark and DuckDB compute
# bit-identical cell counts, making the SKETCH itself oracle-checkable.
#
# Scale shape: the sketch is built from the (term, count) table, not from raw
# token instances — the only corpus-sized shuffle is the term-count groupBy
# (map-side combined, the same exact-tf reduction every text operator here
# uses). Each vocabulary row then fans out to `depth` (row, bucket) cells and
# collapses to a depth x width table (a few KB), which is mergeable across
# shards/epochs by cellwise addition.
# ---------------------------------------------------------------------------


def cms_bucket(row: int, col: Column, width: int) -> Column:
    """Bucket of ``col`` in hash row ``row``: 52-bit md5 of "row:value",
    modulo ``width``. Positive bigint % positive int agrees across engines."""
    h = F.md5(F.concat(F.lit(f"{row}:"), col.cast("string")))
    return F.conv(F.substring(h, 1, HEX_DIGITS), 16, 10).cast("bigint") % F.lit(width)


def duckdb_cms_bucket(row: int, expr: str, width: int) -> str:
    return (
        f"('0x' || substr(md5('{row}:' || CAST({expr} AS VARCHAR)), 1, "
        f"{HEX_DIGITS}))::BIGINT % {width}"
    )


def cms_build(
    counts: DataFrame, *, term_col: str, count_col: str, depth: int, width: int
) -> DataFrame:
    """Count-min sketch (``row``, ``bucket``, ``cnt``) from a pre-reduced
    (term, count) table. depth x width cells; absent cells are zero."""
    cells = F.explode(
        F.array(
            *[
                F.struct(
                    F.lit(i).alias("row"),
                    cms_bucket(i, F.col(term_col), width).alias("bucket"),
                )
                for i in range(depth)
            ]
        )
    )
    return (
        counts.select(F.col(count_col).alias("_n"), cells.alias("_c"))
        .select("_c.row", "_c.bucket", "_n")
        .groupBy("row", "bucket")
        .agg(F.sum("_n").cast("bigint").alias("cnt"))
    )


def cms_lookup(
    sketch: DataFrame,
    probes: DataFrame,
    *,
    term_col: str,
    depth: int,
    width: int,
) -> DataFrame:
    """Point-query the sketch: estimate(term) = min over hash rows of the
    cell count. Keeps every non-(row/bucket) probe column. The probe side is
    a handful of rows and the sketch is depth x width — AQE broadcasts
    whichever is smaller; nothing corpus-sized moves."""
    cells = F.explode(
        F.array(
            *[
                F.struct(
                    F.lit(i).alias("row"),
                    cms_bucket(i, F.col(term_col), width).alias("bucket"),
                )
                for i in range(depth)
            ]
        )
    )
    keep = [c for c in probes.columns]
    pb = probes.select(*keep, cells.alias("_c")).select(*keep, "_c.row", "_c.bucket")
    # LEFT join + coalesce(0): a cell absent from the sketch means count 0,
    # so an unseen term must estimate 0 (CMS never underestimates) instead of
    # being excluded from the min (overestimate) or dropped from the output.
    return (
        pb.join(sketch, ["row", "bucket"], "left")
        .groupBy(*keep)
        .agg(F.min(F.coalesce("cnt", F.lit(0))).alias("cms_estimate"))
    )


# ---------------------------------------------------------------------------
# Histogram quantile sketch — the fixed-bin cousin of t-digest/KLL, chosen
# because integer fixed-width bucketing (the `events_psi_drift` trick) makes
# the whole estimate engine-exact and therefore oracle-checkable. The exact
# quantile rides along via the token-budget trick: only the single bin that
# CONTAINS the target rank ever sorts rows, so the "exact" column costs a
# bounded sort even at 10^12 rows.
# ---------------------------------------------------------------------------


def hist_quantiles(
    df: DataFrame,
    *,
    value_col: str,
    bin_cents: int,
    qs: list[float],
) -> DataFrame:
    """Quantile estimates from a fixed-width histogram over integer cents.

    Returns one row per q in ``qs``: (q, n_total, est_quantile,
    exact_quantile), est = linear interpolation within the containing bin,
    exact = the value at rank ceil(q*n) (bounded within-bin sort). The fact
    table shuffles once (histogram groupBy, map-side combined) plus one
    bin-filtered window pass for the exact column; the histogram itself is
    bins-sized, so its cumulative window is a driver-trivial sort.
    """
    spark = df.sparkSession
    vc = F.round(F.col(value_col) * 100).cast("bigint")
    vals = df.select(vc.alias("_vc")).withColumn(
        "_bin", F.floor(F.col("_vc") / F.lit(float(bin_cents))).cast("bigint")
    )
    hist = vals.groupBy("_bin").agg(F.count("*").cast("bigint").alias("_cnt"))
    # cumulative over the BINS table only (~#bins rows — histogram-sized, not
    # corpus-sized; the unpartitioned window is deliberate and bounded)
    wb = Window.orderBy("_bin")
    cum = (
        hist.withColumn("_cum", F.sum("_cnt").over(wb))
        .withColumn("_cum_prev", F.col("_cum") - F.col("_cnt"))
        .crossJoin(
            F.broadcast(hist.agg(F.sum("_cnt").cast("bigint").alias("_n")))
        )
    )
    probe = spark.createDataFrame([(float(q),) for q in qs], "q double")
    tgt = (
        probe.crossJoin(F.broadcast(cum))
        .withColumn("_r", F.ceil(F.col("q") * F.col("_n")).cast("bigint"))
        .filter((F.col("_cum") >= F.col("_r")) & (F.col("_cum_prev") < F.col("_r")))
    )
    est = F.round(
        (
            F.col("_bin") * bin_cents
            + bin_cents * (F.col("_r") - F.col("_cum_prev")) / F.col("_cnt")
        )
        / 100.0,
        3,
    )
    tgt = tgt.select(
        "q",
        F.col("_n").alias("n_total"),
        est.alias("est_quantile"),
        "_bin",
        (F.col("_r") - F.col("_cum_prev")).alias("_k"),
    )
    # exact value: only rows of the <= len(qs) target bins reach the sort
    inbin = vals.join(
        F.broadcast(tgt.select("q", "_bin", "_k", "n_total", "est_quantile")),
        "_bin",
    )
    wq = Window.partitionBy("q").orderBy("_vc")
    exact = (
        inbin.withColumn("_rn", F.row_number().over(wq))
        .filter(F.col("_rn") == F.col("_k"))
        .select(
            "q",
            "n_total",
            "est_quantile",
            F.round(F.col("_vc") / 100.0, 2).alias("exact_quantile"),
        )
    )
    return exact


def quantile_bins(
    df: DataFrame,
    *,
    value_col: str,
    n_bins: int,
    bin_cents: int,
) -> DataFrame:
    """Equal-frequency (quantile) binning — the feature-bucketing step
    before hashing/embedding a numeric column. Boundaries are the
    histogram-walk estimates at i/n_bins (the `hist_quantiles`
    construction, integer-cents exact); each row's bin is the count of
    boundaries strictly below its value, computed against a broadcast
    boundary ARRAY (no per-boundary fan-out join).

    Two fact-table passes (histogram build, bin assignment) — both
    map-side-combined; everything between runs on the bins-sized
    histogram.

    Returns one row per occupied bin: (bin_idx, n, lo_r, hi_r,
    sum_cents)."""
    spark = df.sparkSession
    vc = F.round(F.col(value_col) * 100).cast("bigint")
    vals = df.select(vc.alias("_vc")).withColumn(
        "_bin", F.floor(F.col("_vc") / F.lit(float(bin_cents))).cast("bigint")
    )
    hist = vals.groupBy("_bin").agg(F.count("*").cast("bigint").alias("_cnt"))
    wb = Window.orderBy("_bin")
    cum = (
        hist.withColumn("_cum", F.sum("_cnt").over(wb))
        .withColumn("_cum_prev", F.col("_cum") - F.col("_cnt"))
        .crossJoin(F.broadcast(hist.agg(F.sum("_cnt").cast("bigint").alias("_n"))))
    )
    qs = spark.createDataFrame(
        [(float(i) / n_bins,) for i in range(1, n_bins)], "q double"
    )
    tgt = (
        qs.crossJoin(F.broadcast(cum))
        .withColumn("_r", F.ceil(F.col("q") * F.col("_n")).cast("bigint"))
        .filter((F.col("_cum") >= F.col("_r")) & (F.col("_cum_prev") < F.col("_r")))
    )
    bound = tgt.select(
        (
            F.col("_bin") * bin_cents
            + bin_cents * (F.col("_r") - F.col("_cum_prev")) / F.col("_cnt")
        ).alias("_b")
    )
    barr = bound.agg(F.array_sort(F.collect_list("_b")).alias("_bs"))
    assigned = vals.crossJoin(F.broadcast(barr)).select(
        "_vc",
        F.size(F.filter("_bs", lambda b: F.col("_vc") > b)).alias("bin_idx"),
    )
    return (
        assigned.groupBy("bin_idx")
        .agg(
            F.count("*").cast("bigint").alias("n"),
            F.round(F.min("_vc") / 100.0, 2).alias("lo_r"),
            F.round(F.max("_vc") / 100.0, 2).alias("hi_r"),
            F.sum("_vc").cast("bigint").alias("sum_cents"),
        )
        .orderBy("bin_idx")
    )


# ---------------------------------------------------------------------------
# HyperLogLog — Flajolet et al. 2007. Most HLL implementations are NOT
# cross-engine comparable (register layouts and hash functions differ), which
# is why `kmv_distinct` is this package's default sketch. This one is: it is
# built on the same 52-bit md5 hash, the register index/rank are pure integer
# expressions, and the harmonic sum is kept EXACT by scaling each 2^(-M_j)
# term to the integer 2^(RANK_MAX - M_j) (max register sum = m * 2^RANK_MAX
# = 2^53 — exact in bigint and double). The whole estimate — raw HLL and the
# small-range linear-counting branch — is therefore a deterministic function
# of the value set, bit-identical in Spark and DuckDB, and oracle-checkable
# like KMV/CMS.
#
# Scale shape: identical to any exact distinct — one map-side-combined
# groupBy over distinct (group, register) pairs; the register table is
# m rows/group and mergeable by per-register max, which is the whole point
# of HLL state at 100 TB (union across shards/epochs without re-reading).
# ---------------------------------------------------------------------------

HLL_P = 8  # 2^8 = 256 registers
HLL_M = 1 << HLL_P
# rank looks at the 44 bits above the register index; w == 0 => rank 45
HLL_RANK_MAX = 52 - HLL_P + 1
HLL_ALPHA = 0.7213 / (1.0 + 1.079 / HLL_M)
_HLL_NUM = HLL_ALPHA * HLL_M * HLL_M * float(1 << HLL_RANK_MAX)


def _hll_hash_int(col: Column) -> Column:
    """52-bit md5 hash as a bigint (the unscaled cousin of ``kmv_hash``)."""
    return F.conv(F.substring(F.md5(col.cast("string")), 1, HEX_DIGITS), 16, 10).cast(
        "bigint"
    )


def hll_distinct(
    df: DataFrame,
    *,
    by: str,
    value_col: str,
) -> DataFrame:
    """Per-group HyperLogLog distinct-count estimate (p=8, m=256 registers).

    Returns (``by``, n_distinct_exact, hll_estimate, n_empty_registers,
    harmonic_scaled) — ``harmonic_scaled`` is the exact integer register
    checksum sum(2^(RANK_MAX - M_j)) over all m registers (empties included),
    which pins the FULL register state; ``hll_estimate`` applies the standard
    small-range correction (linear counting m*ln(m/V) when the raw estimate
    <= 2.5m and V empty registers remain). ``n_distinct_exact`` rides along
    as the accuracy reference (the dedupe needed for the register max IS an
    exact distinct at this fixture scale; at 100 TB drop it and keep the
    register table only).
    """
    reg = hll_registers(df, by=by, value_col=value_col)
    per = hll_fold(reg, by=by)
    exact = (
        df.select(F.col(by), F.col(value_col).alias("_v"))
        .distinct()
        .groupBy(by)
        .agg(F.count("*").cast("bigint").alias("n_distinct_exact"))
    )
    return exact.join(per, by).select(
        by,
        "n_distinct_exact",
        "hll_estimate",
        "n_empty_registers",
        "harmonic_scaled",
    )


def hll_registers(df: DataFrame, *, by: str, value_col: str) -> DataFrame:
    """The mergeable HLL state: (``by``, _j, _mj) register maxima — the
    groupBy is exactly what a streaming complete-mode aggregate holds."""
    h = _hll_hash_int(F.col(value_col))
    j = h.bitwiseAND(F.lit(HLL_M - 1))
    w = (h / HLL_M).cast("bigint")  # arithmetic shift right p bits (h >= 0)
    # rank = trailing zeros of w + 1 (bit trick: w & -w is the lowest set
    # bit; bit_count(lowbit - 1) counts the zeros below it)
    rank = F.when(w == 0, F.lit(HLL_RANK_MAX)).otherwise(
        F.bit_count(w.bitwiseAND(-w) - 1) + 1
    )
    d = df.select(F.col(by), j.alias("_j"), rank.alias("_rank"))
    return d.groupBy(by, "_j").agg(F.max("_rank").alias("_mj"))


def hll_fold(reg: DataFrame, *, by: str) -> DataFrame:
    """Registers → estimate: (``by``, hll_estimate, n_empty_registers,
    harmonic_scaled). Pure fold over the m-rows-per-group state — usable on
    a drained streaming register table exactly as on a batch one."""
    per = reg.groupBy(by).agg(
        F.count("*").cast("bigint").alias("_n_present"),
        F.sum(F.expr(f"shiftleft(CAST(1 AS BIGINT), {HLL_RANK_MAX} - _mj)"))
        .cast("bigint")
        .alias("_s_present"),
    )
    # absent registers contribute 2^RANK_MAX each; no need to materialize them
    s = (
        F.col("_s_present")
        + (F.lit(HLL_M) - F.col("_n_present")) * F.lit(1 << HLL_RANK_MAX)
    ).cast("bigint")
    v = (F.lit(HLL_M) - F.col("_n_present")).cast("bigint")
    raw = F.lit(_HLL_NUM) / s.cast("double")
    est = F.when(
        (raw <= 2.5 * HLL_M) & (v > 0),
        F.lit(float(HLL_M)) * F.log(F.lit(float(HLL_M)) / v.cast("double")),
    ).otherwise(raw)
    return per.select(
        by,
        F.round(est, 3).alias("hll_estimate"),
        v.alias("n_empty_registers"),
        s.alias("harmonic_scaled"),
    )


def duckdb_hll_sql(table_expr: str, by: str, value_expr: str) -> str:
    """DuckDB twin of ``hll_distinct`` (identical hash/registers/estimate)."""
    rank_max = HLL_RANK_MAX
    top = 1 << rank_max
    h = (
        f"('0x' || substr(md5(CAST({value_expr} AS VARCHAR)), 1, {HEX_DIGITS}))"
        "::BIGINT"
    )
    return f"""
WITH hh AS (
  SELECT {by} AS grp, {h} AS h FROM {table_expr}
),
jr AS (
  SELECT grp, h & {HLL_M - 1} AS j,
         CASE WHEN h // {HLL_M} = 0 THEN {rank_max}
              ELSE bit_count(((h // {HLL_M}) & -(h // {HLL_M})) - 1) + 1
         END AS rank
  FROM hh
),
reg AS (SELECT grp, j, max(rank) AS mj FROM jr GROUP BY grp, j),
per AS (
  SELECT grp, count(*)::BIGINT AS n_present,
         sum((1::BIGINT << ({rank_max} - mj)))::BIGINT AS s_present
  FROM reg GROUP BY grp
),
fin AS (
  SELECT grp, (s_present + ({HLL_M} - n_present) * {top}::BIGINT)::BIGINT AS s,
         ({HLL_M} - n_present)::BIGINT AS v
  FROM per
),
ex AS (
  SELECT grp, count(*)::BIGINT AS n_distinct_exact FROM (
    SELECT DISTINCT {by} AS grp, {value_expr} AS v FROM {table_expr}
  ) GROUP BY grp
)
SELECT ex.grp, ex.n_distinct_exact,
       round(CASE WHEN ({_HLL_NUM!r} / s) <= {2.5 * HLL_M}
                   AND v > 0
             THEN {float(HLL_M)!r} * ln({float(HLL_M)!r} / v)
             ELSE {_HLL_NUM!r} / s END, 3) AS hll_estimate,
       v AS n_empty_registers, s AS harmonic_scaled
FROM ex JOIN fin ON ex.grp = fin.grp
"""
